"""Unit tests of the alignment ops against scipy / brute-force oracles."""

import numpy as np
import pytest

from whisper_timestamped_tpu.ops import dtw_cost_jnp, dtw_path, dtw_path_numpy, find_peaks
from whisper_timestamped_tpu.ops.median import median_filter_last_axis


def test_median_filter_matches_scipy():
    from scipy.ndimage import median_filter

    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 7, 64)).astype(np.float32)
    ours = np.asarray(median_filter_last_axis(x, 9))
    theirs = median_filter(x, size=(1, 1, 9))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_median_filter_short_input():
    from scipy.ndimage import median_filter

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5)).astype(np.float32)  # shorter than window
    ours = np.asarray(median_filter_last_axis(x, 9))
    theirs = median_filter(x, size=(1, 9))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


@pytest.mark.parametrize("allow_vertical", [True, False])
@pytest.mark.parametrize("shape", [(4, 7), (10, 30), (23, 151), (1, 5), (5, 5)])
def test_dtw_jnp_matches_numpy(shape, allow_vertical):
    rng = np.random.default_rng(hash(shape) % 2**31)
    x = -rng.random(shape).astype(np.float32)
    i1a, i2a = dtw_path_numpy(x, allow_vertical)
    i1b, i2b = dtw_path(x, allow_vertical)
    np.testing.assert_array_equal(i1a, i1b)
    np.testing.assert_array_equal(i2a, i2b)


def test_dtw_path_properties():
    rng = np.random.default_rng(3)
    x = -rng.random((12, 40))
    i1, i2 = dtw_path(x)
    assert i1[0] == 0 and i2[0] == 0
    assert i1[-1] == 11 and i2[-1] == 39
    d1, d2 = np.diff(i1), np.diff(i2)
    assert ((d1 >= 0) & (d1 <= 1)).all() and ((d2 >= 0) & (d2 <= 1)).all()
    assert ((d1 + d2) >= 1).all()  # always advances


def test_dtw_known_alignment():
    # diagonal-dominant cost: path must be the main diagonal
    n = 8
    x = np.ones((n, n)) * 0.0
    x[np.arange(n), np.arange(n)] = -10.0
    i1, i2 = dtw_path(x)
    on_diag = [(a, b) for a, b in zip(i1, i2) if a == b]
    assert len(on_diag) == n


def test_dtw_no_vertical_unique_frames():
    rng = np.random.default_rng(4)
    x = -rng.random((6, 20))
    i1, i2 = dtw_path(x, allow_vertical=False)
    # without vertical moves, each token advance also advances the frame:
    # frames at token starts are strictly increasing
    starts = [i2[np.argmax(i1 == t)] for t in range(6)]
    assert all(b > a for a, b in zip(starts, starts[1:]))


@pytest.mark.parametrize("seed", range(8))
def test_find_peaks_matches_scipy(seed):
    import scipy.signal

    rng = np.random.default_rng(seed)
    # smooth-ish random signal like an attention row
    x = np.convolve(rng.random(120), np.ones(5) / 5, mode="same")
    ours_p, ours_prop = find_peaks(x, width=3, prominence=0.02)
    sp_p, sp_prop = scipy.signal.find_peaks(x, width=3, prominence=0.02)
    np.testing.assert_array_equal(ours_p, sp_p)
    for key in ("prominences", "left_bases", "right_bases", "left_ips", "right_ips"):
        np.testing.assert_allclose(ours_prop[key], sp_prop[key], atol=1e-9, err_msg=key)


def test_find_peaks_flat_plateaus():
    import scipy.signal

    x = np.array([0, 1, 1, 1, 0, 2, 2, 0, 3, 0], float)
    ours, _ = find_peaks(x)
    theirs, _ = scipy.signal.find_peaks(x)
    np.testing.assert_array_equal(ours, theirs)


def test_find_peaks_short():
    p, props = find_peaks(np.array([1.0, 2.0]), width=3, prominence=0.02)
    assert len(p) == 0


@pytest.mark.parametrize("allow_vertical", [True, False])
def test_dtw_wavefront_matches_oracle(allow_vertical):
    from whisper_timestamped_tpu.ops.dtw import dtw_path_numpy_wavefront

    for shape in [(4, 7), (17, 99), (1, 4), (6, 6)]:
        rng = np.random.default_rng(hash(shape) % 2**31)
        x = -rng.random(shape)
        a = dtw_path_numpy(x, allow_vertical)
        b = dtw_path_numpy_wavefront(x, allow_vertical)
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


def test_median_numpy_matches_scipy():
    from scipy.ndimage import median_filter

    from whisper_timestamped_tpu.ops.median import median_filter_numpy

    rng = np.random.default_rng(5)
    x = rng.standard_normal((3, 11, 40)).astype(np.float32)
    np.testing.assert_allclose(
        median_filter_numpy(x, 9), median_filter(x, size=(1, 1, 9)), atol=1e-6
    )
