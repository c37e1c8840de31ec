"""Pallas kernel tests (interpret mode on CPU) against the exact host ops."""

import numpy as np
import pytest

import jax.numpy as jnp

from whisper_timestamped_tpu.ops.median import median_filter_numpy
from whisper_timestamped_tpu.ops.dtw import dtw_path_numpy
from whisper_timestamped_tpu.ops.pallas_kernels import (
    attention_to_cost_pallas,
    dtw_path_pallas,
    median9_pallas,
)


def test_median9_matches_host():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((6, 256)).astype(np.float32)
    ours = np.asarray(median9_pallas(jnp.asarray(x), interpret=True))
    ref = median_filter_numpy(x, 9)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_median9_3d():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4, 128)).astype(np.float32)
    ours = np.asarray(median9_pallas(jnp.asarray(x), interpret=True))
    ref = median_filter_numpy(x, 9)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_attention_to_cost_matches_host():
    from whisper_timestamped_tpu.alignment import _attention_to_cost

    rng = np.random.default_rng(2)
    K, N, span = 3, 8, 100
    M = 128  # frame-padded
    scores = rng.standard_normal((K, N, M)).astype(np.float32)
    ours = np.asarray(
        attention_to_cost_pallas(jnp.asarray(scores), span, interpret=True)
    )[:, :span]
    ref = _attention_to_cost(scores[:, :, :span], 9, 1.0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("shape", [(4, 7), (17, 99), (23, 151), (8, 128)])
def test_dtw_pallas_matches_oracle(shape):
    rng = np.random.default_rng(hash(shape) % 2**31)
    x = -rng.random(shape).astype(np.float32)
    i1a, i2a = dtw_path_numpy(x)
    i1b, i2b = dtw_path_pallas(x, interpret=True)
    np.testing.assert_array_equal(i1a, i1b)
    np.testing.assert_array_equal(i2a, i2b)
