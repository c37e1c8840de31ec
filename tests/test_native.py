"""C++ native library tests: build, BPE parity, DTW parity, fallbacks."""

import numpy as np
import pytest

from whisper_timestamped_tpu import native
from whisper_timestamped_tpu.ops.dtw import dtw_path_numpy
from whisper_timestamped_tpu.tokenizer import BytePairEncoder, synthetic_ranks


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.get_lib()


def test_native_builds(lib):
    assert lib is not None


def test_native_bpe_matches_python(lib):
    ranks = synthetic_ranks()
    nat = native.NativeBPE(ranks)
    py = BytePairEncoder(ranks)
    py._native = False  # force pure-Python path
    for text in ["the theatre is on", " you and he said yes", "hello", "日本語", "a  b"]:
        import regex

        from whisper_timestamped_tpu.tokenizer import _SPLIT_PATTERN

        for piece in regex.findall(_SPLIT_PATTERN, text):
            b = piece.encode("utf-8")
            assert nat.encode_piece(b) == py._bpe_merge(b), piece


def test_tokenizer_uses_native_transparently(lib):
    from whisper_timestamped_tpu.tokenizer import get_tokenizer

    t = get_tokenizer(ranks=synthetic_ranks())
    text = " bonjour, vous allez bien ? 日本語"
    ids = t.encode(text)
    assert t.decode(ids) == text
    # compare against forced-python encoding
    t2 = get_tokenizer(ranks=synthetic_ranks())
    t2.bpe._native = False
    assert ids == t2.encode(text)


@pytest.mark.parametrize("allow_vertical", [True, False])
def test_native_dtw_matches_oracle(lib, allow_vertical):
    for shape in [(4, 7), (17, 99), (23, 151), (1, 5)]:
        rng = np.random.default_rng(hash(shape) % 2**31)
        x = -rng.random(shape)
        a1, a2 = dtw_path_numpy(x, allow_vertical)
        b1, b2 = native.dtw_path_native(x, allow_vertical)
        np.testing.assert_array_equal(a1, b1)
        np.testing.assert_array_equal(a2, b2)


def test_native_dtw_speed(lib):
    import time

    rng = np.random.default_rng(0)
    x = -rng.random((224, 1500))
    t0 = time.time()
    native.dtw_path_native(x)
    native_t = time.time() - t0
    assert native_t < 2.0  # full-size segment in well under 2s
