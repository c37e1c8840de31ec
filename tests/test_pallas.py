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
    # block_t=128: multi-tile online-softmax carry; block_t=512 > T: the
    # whole context in ONE padded tile (the WTT_XATTN_BLOCK_T fast path)
    for block_t in (128, 512):
        for l in range(L):
            o1, s1 = cross_attention_stacked_pallas_v2(
                l, q, xk, xv, H, block_t=block_t, interpret=True
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
    for block_t in (128, 512):
        for l in range(L):
            o1, s1 = cross_attention_stacked_int8_pallas_v2(
                l, q, k8, ks, v8, vs, H, block_t=block_t, interpret=True
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


def test_self_attention_stacked_int8_mxu_matches_xla():
    """s8-MXU self-attention variant (q/p 8-bit rounded) vs the XLA
    dequantized math path — quantization tolerance, same mask semantics."""
    from whisper_timestamped_tpu.models.whisper_jax import _attention, _quantize_rows
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        self_attention_stacked_int8_mxu_pallas,
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
        o1 = self_attention_stacked_int8_mxu_pallas(
            l, q, k8, ks, v8, vs, pos, pad_len, H, interpret=True
        )
        k_deq = k8[l].astype(jnp.float32) * ks[l][..., None]
        v_deq = v8[l].astype(jnp.float32) * vs[l][..., None]
        mask = np.where(
            (col[None] >= pad_len[:, None]) & (col[None] <= pos), 0.0, -np.inf
        )[:, None, None, :].astype(np.float32)  # (B,1,1,CTX)
        o2, _ = _attention(q, k_deq, v_deq, H, mask=jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=3e-2)


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


def test_cross_attention_stacked_v2_score_gating():
    """score_flag=0 skips the score emission without touching the attention
    output; emit_scores=False drops the scores output entirely."""
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_int8_pallas_v2,
        cross_attention_stacked_pallas_v2,
    )
    from whisper_timestamped_tpu.models.whisper_jax import _quantize_rows

    L, B, T, D, H = 2, 2, 300, 256, 4
    r = np.random.default_rng(5)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
    xk = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    xv = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))

    o_on, s_on = cross_attention_stacked_pallas_v2(
        0, q, xk, xv, H, block_t=128, interpret=True
    )
    o_off, _ = cross_attention_stacked_pallas_v2(
        0, q, xk, xv, H, block_t=128, score_flag=jnp.int32(0), interpret=True
    )
    o_none, s_none = cross_attention_stacked_pallas_v2(
        0, q, xk, xv, H, block_t=128, emit_scores=False, interpret=True
    )
    assert s_none is None
    np.testing.assert_allclose(np.asarray(o_off), np.asarray(o_on), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_none), np.asarray(o_on), atol=1e-5)
    assert s_on.shape == (B, H, 1, T)

    k8, ks = _quantize_rows(xk)
    v8, vs = _quantize_rows(xv)
    o8_on, s8_on = cross_attention_stacked_int8_pallas_v2(
        1, q, k8, ks, v8, vs, H, block_t=128, interpret=True
    )
    o8_off, _ = cross_attention_stacked_int8_pallas_v2(
        1, q, k8, ks, v8, vs, H, block_t=128, score_flag=jnp.int32(0),
        interpret=True,
    )
    o8_none, s8_none = cross_attention_stacked_int8_pallas_v2(
        1, q, k8, ks, v8, vs, H, block_t=128, emit_scores=False, interpret=True
    )
    assert s8_none is None
    np.testing.assert_allclose(np.asarray(o8_off), np.asarray(o8_on), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o8_none), np.asarray(o8_on), atol=1e-5)
    assert s8_on.shape == (B, H, 1, T)


def test_prefill_flash_attention_matches_unfused():
    """The flash prefill helper (TPU kernel, run here in interpret mode) must
    match the unfused masked attention on both the self (left-pad + causal)
    and cross (no mask) patterns used by decode_window_jit's prefill."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from whisper_timestamped_tpu.models.whisper_jax import (
        _attention,
        _prefill_flash_attention,
    )

    B, P, D, H = 2, 24, 64, 4
    S_cross = 130  # non-multiple of 128 exercises the tail padding
    r = np.random.default_rng(11)
    q = jnp.asarray(r.standard_normal((B, P, D)).astype(np.float32))
    k = jnp.asarray(r.standard_normal((B, P, D)).astype(np.float32))
    v = jnp.asarray(r.standard_normal((B, P, D)).astype(np.float32))
    kc = jnp.asarray(r.standard_normal((B, S_cross, D)).astype(np.float32))
    vc = jnp.asarray(r.standard_normal((B, S_cross, D)).astype(np.float32))
    pad_len = jnp.asarray([0, 7], jnp.int32)

    # unfused reference: query slot i attends keys pad_len <= j <= i (plus the
    # own-slot escape for padding rows, whose outputs are not compared)
    slots = np.arange(P)
    valid = (slots[None, None, :] >= np.asarray(pad_len)[:, None, None]) & (
        slots[None, None, :] <= slots[None, :, None]
    )
    valid |= (slots[None, :, None] == slots[None, None, :])
    mask = jnp.asarray(np.where(valid, 0.0, -np.inf).astype(np.float32))[:, None]

    with pltpu.force_tpu_interpret_mode():
        f_self = _prefill_flash_attention(q, k, v, H, pad_len=pad_len, causal=True)
        f_cross = _prefill_flash_attention(q, kc, vc, H)
    u_self, _ = _attention(q, k, v, H, mask=mask)
    u_cross, _ = _attention(q, kc, vc, H)

    f_self, u_self = np.asarray(f_self), np.asarray(u_self)
    # compare live rows only (slot >= pad_len); pad rows are garbage-by-design
    for b in range(B):
        lo = int(pad_len[b])
        np.testing.assert_allclose(f_self[b, lo:], u_self[b, lo:], atol=2e-3)
        assert np.all(np.isfinite(f_self[b]))
    np.testing.assert_allclose(np.asarray(f_cross), np.asarray(u_cross), atol=2e-3)


def test_quantize_int4_pack_unpack_roundtrip():
    """Nibble packing is lossless: unpack(pack(q)) reproduces the quantized
    values in frame order, for adversarial values including the ±7 extremes."""
    from whisper_timestamped_tpu.models.whisper_jax import (
        _quantize_rows_int4,
        _unpack_int4_rows,
    )

    from whisper_timestamped_tpu.models.whisper_jax import (
        _int4_scales_frame_order,
    )

    r = np.random.default_rng(3)
    x = r.standard_normal((2, 2, 10, 16)).astype(np.float32) * 10
    x[0, 0, 0, 0] = 1e4  # force scale extremes
    x[0, 0, 1, 0] = -1e4
    packed, s_parity = _quantize_rows_int4(jnp.asarray(x))
    assert packed.shape == (2, 2, 5, 16) and packed.dtype == jnp.int8
    assert s_parity.shape == (2, 2, 10)
    # scales come back parity-major (even frames, then odd); the helper
    # restores frame order and must invert the quantizer's grouping exactly
    s = np.asarray(_int4_scales_frame_order(s_parity))
    np.testing.assert_array_equal(s[..., 0::2], np.asarray(s_parity)[..., :5])
    np.testing.assert_array_equal(s[..., 1::2], np.asarray(s_parity)[..., 5:])
    got = np.asarray(_unpack_int4_rows(packed))
    want = np.clip(
        np.round(x / np.maximum(s, 1e-8)[..., None]), -7, 7
    ).astype(np.int8)
    np.testing.assert_array_equal(got, want)
    # dequantized reconstruction is within one quantization step
    deq = got.astype(np.float32) * s[..., None]
    np.testing.assert_allclose(deq, x, atol=float(np.abs(x).max()) / 7 / 2 + 1e-6)


def test_cross_attention_stacked_int4_matches_xla_int8():
    """Stacked int4 kernel vs the XLA int8 path fed the UNPACKED values with
    the same per-frame scales — exact same quantized math, so the comparison
    is tight. Non-tile-aligned T exercises the parity masking."""
    from whisper_timestamped_tpu.models.whisper_jax import (
        _int4_scales_frame_order,
        _quantize_rows_int4,
        _unpack_int4_rows,
        cross_attention,
    )
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_int4_pallas,
    )

    r = np.random.default_rng(17)
    # (T, block_t) covers: non-tile-aligned T collapsing to one full-width
    # tile (300/128, 300/512) and a REAL multi-tile grid with the tile
    # dividing the packed frame count exactly (512/256 -> TTp=128, nt=2)
    for T, block_ts in ((300, (128, 512)), (512, (256,))):
        L, B, D, H = 3, 2, 256, 4
        q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
        xk = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
        xv = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
        k4, ks = _quantize_rows_int4(xk)
        v4, vs = _quantize_rows_int4(xv)
        k8, v8 = _unpack_int4_rows(k4), _unpack_int4_rows(v4)
        ksf = _int4_scales_frame_order(ks)
        vsf = _int4_scales_frame_order(vs)
        for block_t in block_ts:
            for l in range(L):
                o1, s1 = cross_attention_stacked_int4_pallas(
                    l, q, k4, ks, v4, vs, H, block_t=block_t, interpret=True
                )
                assert s1.shape == (B, H, 1, T)
                o2, s2 = cross_attention(
                    q, k8[l], xv=v8[l], xk_scale=ksf[l], xv_scale=vsf[l],
                    n_head=H,
                )
                np.testing.assert_allclose(
                    np.asarray(s1), np.asarray(s2), atol=3e-2
                )
                np.testing.assert_allclose(
                    np.asarray(o1), np.asarray(o2), atol=3e-2
                )
                # s8-MXU variant: same math with q/p 8-bit rounded
                o3, s3 = cross_attention_stacked_int4_pallas(
                    l, q, k4, ks, v4, vs, H, block_t=block_t, interpret=True,
                    use_s8=True,
                )
                np.testing.assert_allclose(
                    np.asarray(s3), np.asarray(s2), atol=3e-2
                )
                np.testing.assert_allclose(
                    np.asarray(o3), np.asarray(o2), atol=4e-2
                )


def test_cross_attention_stacked_int4_score_gating():
    """score_flag=0 / emit_scores=False leave the int4 attention output
    untouched, as for the bf16/int8 kernels."""
    from whisper_timestamped_tpu.models.whisper_jax import _quantize_rows_int4
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_int4_pallas,
    )

    L, B, T, D, H = 2, 2, 300, 256, 4
    r = np.random.default_rng(7)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
    k4, ks = _quantize_rows_int4(
        jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    )
    v4, vs = _quantize_rows_int4(
        jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    )
    o_on, s_on = cross_attention_stacked_int4_pallas(
        1, q, k4, ks, v4, vs, H, block_t=128, interpret=True
    )
    o_off, _ = cross_attention_stacked_int4_pallas(
        1, q, k4, ks, v4, vs, H, block_t=128, score_flag=jnp.int32(0),
        interpret=True,
    )
    o_none, s_none = cross_attention_stacked_int4_pallas(
        1, q, k4, ks, v4, vs, H, block_t=128, emit_scores=False, interpret=True
    )
    assert s_none is None
    np.testing.assert_allclose(np.asarray(o_off), np.asarray(o_on), atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_none), np.asarray(o_on), atol=1e-5)
    assert s_on.shape == (B, H, 1, T)


def test_cross_attention_stacked_int8_v3_matches_xla_int8():
    """v3 (MXU weighted-V tail) vs the XLA int8 math path, non-aligned T."""
    from whisper_timestamped_tpu.models.whisper_jax import (
        _quantize_rows,
        cross_attention,
    )
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_int8_pallas_v3,
    )

    L, B, T, D, H = 3, 2, 300, 256, 4
    r = np.random.default_rng(13)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
    xk = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    xv = jnp.asarray(r.standard_normal((L, B, T, D)).astype(np.float32))
    k8, ks = _quantize_rows(xk)
    v8, vs = _quantize_rows(xv)
    for l in range(L):
        o1, s1 = cross_attention_stacked_int8_pallas_v3(
            l, q, k8, ks, v8, vs, H, block_t=128, interpret=True
        )
        o2, s2 = cross_attention(q, k8[l], xv=v8[l], xk_scale=ks[l], xv_scale=vs[l], n_head=H)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), atol=3e-2)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=3e-2)


def test_cross_attention_int8_v3_matches_v2_exact_shape():
    """v3 == v2 at a tile-padded T and with emit_scores=False (the serving
    configuration compiles this variant for non-alignment layers)."""
    from whisper_timestamped_tpu.models.whisper_jax import _quantize_rows
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_int8_pallas_v2,
        cross_attention_stacked_int8_pallas_v3,
    )

    L, B, T, D, H = 2, 3, 250, 256, 4
    r = np.random.default_rng(17)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
    k8, ks = _quantize_rows(jnp.asarray(r.standard_normal((L, B, T, D)), jnp.float32))
    v8, vs = _quantize_rows(jnp.asarray(r.standard_normal((L, B, T, D)), jnp.float32))
    for emit in (True, False):
        o2, s2 = cross_attention_stacked_int8_pallas_v2(
            1, q, k8, ks, v8, vs, H, block_t=128, emit_scores=emit, interpret=True
        )
        o3, s3 = cross_attention_stacked_int8_pallas_v3(
            1, q, k8, ks, v8, vs, H, block_t=128, emit_scores=emit, interpret=True
        )
        np.testing.assert_allclose(np.asarray(o2), np.asarray(o3), atol=2e-3)
        if emit:
            np.testing.assert_allclose(np.asarray(s2), np.asarray(s3), atol=1e-5)


def test_cross_attention_int8_v4_matches_v2():
    """v4 (all-s8 MXU dots, q/p 8-bit rounded) vs v2: context vectors agree
    to quantization tolerance; emitted alignment scores ride the exact v2
    bf16 path. Covers tiled (block_t < T) and whole-context (block_t >= T)
    schedules and a non-tile-multiple T."""
    from whisper_timestamped_tpu.models.whisper_jax import _quantize_rows
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_int8_pallas_v2,
        cross_attention_stacked_int8_pallas_v4,
    )

    L, B, T, D, H = 2, 3, 250, 256, 4
    r = np.random.default_rng(23)
    q = jnp.asarray(r.standard_normal((B, 1, D)).astype(np.float32))
    k8, ks = _quantize_rows(jnp.asarray(r.standard_normal((L, B, T, D)), jnp.float32))
    v8, vs = _quantize_rows(jnp.asarray(r.standard_normal((L, B, T, D)), jnp.float32))
    for block_t in (128, 256):
        for emit in (True, False):
            o2, s2 = cross_attention_stacked_int8_pallas_v2(
                1, q, k8, ks, v8, vs, H, block_t=block_t, emit_scores=emit,
                interpret=True,
            )
            o4, s4 = cross_attention_stacked_int8_pallas_v4(
                1, q, k8, ks, v8, vs, H, block_t=block_t, emit_scores=emit,
                interpret=True,
            )
            np.testing.assert_allclose(np.asarray(o2), np.asarray(o4), atol=3e-2)
            if emit:
                np.testing.assert_allclose(
                    np.asarray(s2), np.asarray(s4), atol=1e-4
                )
            else:
                assert s4 is None


def test_cross_attention_beam_group_matches_tiled():
    """beam_group=G reads the shared (L, B, T, D) cross-KV at row b // G —
    bit-identical to explicitly tiling the buffers G times (the beam/best_of
    fan-out lever: one copy of the window's encoder K/V for all its beams)."""
    import jax.numpy as jnp

    from whisper_timestamped_tpu.models.whisper_jax import _quantize_rows
    from whisper_timestamped_tpu.ops.pallas_kernels import (
        cross_attention_stacked_int8_pallas_v2,
        cross_attention_stacked_pallas_v2,
    )

    r = np.random.default_rng(0)
    L, B, T, D, H, G = 2, 2, 256, 128, 2, 3
    q = jnp.asarray(r.standard_normal((B * G, 1, D)), jnp.bfloat16)
    kf = jnp.asarray(r.standard_normal((L, B, T, D)), jnp.float32)
    vf = jnp.asarray(r.standard_normal((L, B, T, D)), jnp.float32)
    k8, ks = _quantize_rows(kf)
    v8, vs = _quantize_rows(vf)
    rep = lambda a: jnp.repeat(a, G, axis=1)

    og, wg = cross_attention_stacked_int8_pallas_v2(
        1, q, k8, ks, v8, vs, H, block_t=256, beam_group=G, interpret=True
    )
    orr, wr = cross_attention_stacked_int8_pallas_v2(
        1, q, rep(k8), rep(ks), rep(v8), rep(vs), H, block_t=256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(og), np.asarray(orr))
    np.testing.assert_array_equal(np.asarray(wg), np.asarray(wr))

    og, wg = cross_attention_stacked_pallas_v2(
        0, q, kf.astype(jnp.bfloat16), vf.astype(jnp.bfloat16), H,
        block_t=256, beam_group=G, interpret=True
    )
    orr, wr = cross_attention_stacked_pallas_v2(
        0, q, rep(kf.astype(jnp.bfloat16)), rep(vf.astype(jnp.bfloat16)), H,
        block_t=256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(og), np.asarray(orr))
    np.testing.assert_array_equal(np.asarray(wg), np.asarray(wr))
