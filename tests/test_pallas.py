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


def test_device_alignment_path_matches_host():
    """perform_word_alignment(use_device_kernels=True) == host path (interpret)."""
    from model_utils import make_tokenizer
    from whisper_timestamped_tpu.alignment import perform_word_alignment

    tok = make_tokenizer()
    ts = tok.timestamp_begin
    rng = np.random.default_rng(0)
    tokens = [ts] + tok.encode(" aa bb cc") + [ts + 150]
    attn = rng.standard_normal((len(tokens), 4, 1500)).astype(np.float32) * 0.01
    for i in range(len(tokens)):
        attn[i, :, 15 * i : 15 * i + 20] += 6.0
    host = perform_word_alignment(tokens, attn, tok, detect_disfluencies=True)
    dev = perform_word_alignment(
        tokens, attn, tok, detect_disfluencies=True, use_device_kernels=True
    )
    assert host == dev


def test_mel_kernel_matches_xla_path():
    import jax.numpy as jnp

    from whisper_timestamped_tpu import audio as A
    from whisper_timestamped_tpu.ops.pallas_kernels import log10_mel_pallas

    rng = np.random.default_rng(0)
    x = (rng.standard_normal(16000) * 0.3).astype(np.float32)
    # frame in XLA exactly like the audio front-end
    pad = A.N_FFT // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    n_frames = len(x) // A.HOP_LENGTH
    idx = np.arange(n_frames)[:, None] * A.HOP_LENGTH + np.arange(A.N_FFT)[None, :]
    frames = xp[idx]
    ours = np.asarray(log10_mel_pallas(jnp.asarray(frames), 80, interpret=True))
    # reference: the XLA mel path before normalization
    power = np.asarray(A._stft_power(jnp.asarray(x)[None], A.N_FFT, A.HOP_LENGTH))[0]
    ref = np.log10(np.maximum(power @ A.mel_filters(80).T, 1e-10))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_int8_cross_attention_kernel_matches_xla_path():
    import jax
    import jax.numpy as jnp

    from whisper_timestamped_tpu.models.whisper_jax import (
        _quantize_rows,
        cross_attention,
    )
    from whisper_timestamped_tpu.ops.pallas_kernels import cross_attention_int8_pallas

    rng = np.random.default_rng(0)
    B, T, D, H = 2, 256, 256, 4  # dh=64 like real models
    q = jnp.asarray(rng.standard_normal((B, 1, D)).astype(np.float32))
    xk = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    xv = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    xk_q, xk_s = _quantize_rows(xk)
    xv_q, xv_s = _quantize_rows(xv)

    ref_out, ref_scores = cross_attention(q, xk_q, xv_q, xk_s, xv_s, H)
    ker_out, ker_scores = cross_attention_int8_pallas(
        q, xk_q, xk_s, xv_q, xv_s, H, interpret=True
    )
    np.testing.assert_allclose(np.asarray(ker_scores), np.asarray(ref_scores), atol=2e-2)
    np.testing.assert_allclose(np.asarray(ker_out), np.asarray(ref_out), atol=2e-2)


def test_cross_attention_stacked_matches_xla():
    """Stacked-layer decode cross-attention kernel vs the XLA math path."""
    from whisper_timestamped_tpu.models.whisper_jax import _attention
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_pallas,
    )

    L, B, T, D, H = 3, 2, 256, 256, 4
    r = np.random.default_rng(0)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
    xk = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    xv = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    for l in range(L):
        o1, s1 = cross_attention_stacked_pallas(l, q, xk, xv, H, interpret=True)
        o2, s2 = _attention(q, xk[l], xv[l], H, return_scores=True)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-5)


def test_cross_attention_stacked_v2_matches_xla():
    """Lane-parallel stacked decode cross-attention (v2) vs the XLA math path,
    with a T that does not divide the tile (exercises the online-softmax carry
    and the padded-tail masking)."""
    from whisper_timestamped_tpu.models.whisper_jax import _attention
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_pallas_v2,
    )

    L, B, T, D, H = 3, 2, 300, 256, 4
    r = np.random.default_rng(7)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
    xk = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    xv = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    for l in range(L):
        o1, s1 = cross_attention_stacked_pallas_v2(
            l, q, xk, xv, H, block_t=128, interpret=True
        )
        o2, s2 = _attention(q, xk[l], xv[l], H, return_scores=True)
        assert o1.shape == o2.shape and s1.shape == s2.shape
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-2)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-2)


def test_cross_attention_stacked_int8_v2_matches_xla_int8():
    """Lane-parallel stacked int8 kernel (v2) vs the XLA int8 math path, with
    a non-tile-aligned T."""
    from whisper_timestamped_tpu.models.whisper_jax import (
        _quantize_rows,
        cross_attention,
    )
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_int8_pallas_v2,
    )

    L, B, T, D, H = 3, 2, 300, 256, 4
    r = np.random.default_rng(11)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
    xk = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    xv = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    k8, ks = _quantize_rows(xk)
    v8, vs = _quantize_rows(xv)
    for l in range(L):
        o1, s1 = cross_attention_stacked_int8_pallas_v2(
            l, q, k8, ks, v8, vs, H, block_t=128, interpret=True
        )
        o2, s2 = cross_attention(q, k8[l], xv=v8[l], xk_scale=ks[l], xv_scale=vs[l], n_head=H)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=3e-2)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=3e-2)


def test_self_attention_stacked_matches_xla():
    """Stacked-cache single-query self-attention kernel vs the XLA math path
    with the decode step's [pad_len, pos] key mask."""
    from whisper_timestamped_tpu.models.whisper_jax import _attention
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        self_attention_stacked_pallas,
    )

    L, B, CTX, D, H = 3, 2, 40, 256, 4
    r = np.random.default_rng(3)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
    ks = jnp.asarray(r.standard_normal((L, B, CTX, D)).astype(np.float32))
    vs = jnp.asarray(r.standard_normal((L, B, CTX, D)).astype(np.float32))
    pos, pad_len = 17, np.array([0, 5], np.int32)
    col = np.arange(CTX)
    for l in range(L):
        o1 = self_attention_stacked_pallas(
            l, q, ks, vs, pos, pad_len, H, interpret=True
        )
        mask = np.where(
            (col[None] >= pad_len[:, None]) & (col[None] <= pos), 0.0, -np.inf
        )[:, None, None, :].astype(np.float32)  # (B,1,1,CTX)
        o2, _ = _attention(q, ks[l], vs[l], H, mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-2)


def test_self_attention_stacked_int8_matches_xla():
    """Stacked int8 self-attention decode kernel vs the XLA dequantized math
    path with the decode step's [pad_len, pos] key mask."""
    from whisper_timestamped_tpu.models.whisper_jax import _attention, _quantize_rows
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        self_attention_stacked_int8_pallas,
    )

    L, B, CTX, D, H = 3, 2, 40, 256, 4
    r = np.random.default_rng(7)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
    kf = jnp.asarray(r.standard_normal((L, B, CTX, D)).astype(np.float32))
    vf = jnp.asarray(r.standard_normal((L, B, CTX, D)).astype(np.float32))
    k8, ks = _quantize_rows(kf)
    v8, vs = _quantize_rows(vf)
    pos, pad_len = 17, np.array([0, 5], np.int32)
    col = np.arange(CTX)
    for l in range(L):
        o1 = self_attention_stacked_int8_pallas(
            l, q, k8, ks, v8, vs, pos, pad_len, H, interpret=True
        )
        k_deq = k8[l].astype(jnp.float32) * ks[l][..., None]
        v_deq = v8[l].astype(jnp.float32) * vs[l][..., None]
        mask = np.where(
            (col[None] >= pad_len[:, None]) & (col[None] <= pos), 0.0, -np.inf
        )[:, None, None, :].astype(np.float32)  # (B,1,1,CTX)
        o2, _ = _attention(q, k_deq, v_deq, H, mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-2)


def test_cross_attention_stacked_int8_matches_xla_int8():
    """Stacked int8 decode cross-attention kernel vs the XLA int8 math path."""
    from whisper_timestamped_tpu.models.whisper_jax import (
        _quantize_rows,
        cross_attention,
    )
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_int8_pallas,
    )

    L, B, T, D, H = 2, 2, 256, 256, 4
    r = np.random.default_rng(1)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
    xk = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    xv = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    k8, ks = _quantize_rows(xk)
    v8, vs = _quantize_rows(xv)
    for l in range(L):
        o1, s1 = cross_attention_stacked_int8_pallas(
            l, q, k8, ks, v8, vs, H, interpret=True
        )
        o2, s2 = cross_attention(q, k8[l], xv=v8[l], xk_scale=ks[l], xv_scale=vs[l], n_head=H)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-2)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=2e-2)


def test_stacked_matmul_matches_xla():
    """Scalar-prefetch stacked matmul vs plain x @ w[l].

    Measured on-device (benchmarks/bench_stacked_matmul.py): XLA's scan-xs
    weight streaming already runs at ~560 GB/s with NO per-layer slice copy,
    so this kernel is NOT integrated into decode_step — it exists as the
    measured-and-rejected alternative (and this test keeps it honest)."""
    from whisper_timestamped_tpu.ops.pallas_kernels import stacked_matmul_pallas

    r = np.random.default_rng(2)
    L, K, N, B = 3, 256, 512, 24
    w = jnp.asarray(r.standard_normal((L, K, N)).astype(np.float32))
    x = jnp.asarray(r.standard_normal((B, K)).astype(np.float32))
    for l in range(L):
        y = stacked_matmul_pallas(l, x, w, interpret=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x @ w[l]), atol=1e-4)
