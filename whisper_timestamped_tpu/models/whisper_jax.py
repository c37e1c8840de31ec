"""Whisper encoder/decoder in functional JAX, designed for TPU.

This replaces the PyTorch model the reference drives through openai-whisper
(reference ``transcribe.py:904,1068,1242-1245``). Architecture is TPU-first:

  * Parameters live in a plain pytree with **per-layer arrays stacked** along a
    leading layer axis, so the transformer stack is a single ``lax.scan`` —
    O(1) compiled program size for 32-layer large-v3, and a natural target for
    tensor-parallel sharding annotations (shard heads/ffn along the mesh).
  * There are no hooks: the decode step *returns* the cross-attention rows and
    logits the alignment/confidence layers need (the reference reconstructs
    these via forward hooks + a logit recomputation, ``transcribe.py:783-881``).
  * Incremental decoding uses a preallocated KV cache updated with
    ``lax.dynamic_update_slice`` at a static-shape position — fully jittable.

Weight orientation: linear weights are stored ``(in, out)`` so application is
``x @ w + b``; conv weights are ``(k, in, out)`` for NWC convolutions.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace
from typing import Any, Dict, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]


@dataclass(frozen=True)
class WhisperDims:
    """Model geometry (mirrors the ``ModelDimensions`` stored in OpenAI .pt files)."""

    n_mels: int = 80
    n_audio_ctx: int = 1500
    n_audio_state: int = 384
    n_audio_head: int = 6
    n_audio_layer: int = 4
    n_vocab: int = 51865
    n_text_ctx: int = 448
    n_text_state: int = 384
    n_text_head: int = 6
    n_text_layer: int = 4

    @property
    def is_multilingual(self) -> bool:
        return self.n_vocab >= 51865

    @property
    def num_languages(self) -> int:
        return self.n_vocab - 51765 - int(self.is_multilingual)


TINY_TEST_DIMS = WhisperDims(
    n_mels=80, n_audio_ctx=1500, n_audio_state=64, n_audio_head=4, n_audio_layer=2,
    n_vocab=2322, n_text_ctx=448, n_text_state=64, n_text_head=4, n_text_layer=2,
)


def sinusoids(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Sinusoidal position embeddings (whisper's encoder positions)."""
    assert channels % 2 == 0
    log_inc = np.log(max_timescale) / (channels // 2 - 1)
    inv_timescales = np.exp(-log_inc * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv_timescales[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(np.float32)


# ---------------------------------------------------------------------------
# Initialization (random weights — used by tests and as a loading target spec)
# ---------------------------------------------------------------------------


def _init_linear(key, d_in, d_out, bias=True, scale=None):
    scale = scale if scale is not None else d_in**-0.5
    w = jax.random.normal(key, (d_in, d_out), jnp.float32) * scale
    out = {"w": w}
    if bias:
        out["b"] = jnp.zeros((d_out,), jnp.float32)
    return out


def _init_block(key, d, n_mlp, cross: bool):
    keys = jax.random.split(key, 10)
    p = {
        "attn_ln": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "attn": {
            "q": _init_linear(keys[0], d, d),
            "k": _init_linear(keys[1], d, d, bias=False),
            "v": _init_linear(keys[2], d, d),
            "o": _init_linear(keys[3], d, d),
        },
        "mlp_ln": {"g": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "mlp": {
            "fc1": _init_linear(keys[4], d, n_mlp),
            "fc2": _init_linear(keys[5], n_mlp, d),
        },
    }
    if cross:
        p["cross_ln"] = {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}
        p["cross"] = {
            "q": _init_linear(keys[6], d, d),
            "k": _init_linear(keys[7], d, d, bias=False),
            "v": _init_linear(keys[8], d, d),
            "o": _init_linear(keys[9], d, d),
        }
    return p


def _stack_blocks(blocks):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def init_params(dims: WhisperDims, key=None, untied_proj: bool = False) -> Params:
    """Random-weight parameter tree (layer-stacked), for tests and demos."""
    key = key if key is not None else jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    d_a, d_t = dims.n_audio_state, dims.n_text_state
    enc_blocks = [
        _init_block(k, d_a, 4 * d_a, cross=False)
        for k in jax.random.split(ks[0], dims.n_audio_layer)
    ]
    dec_blocks = [
        _init_block(k, d_t, 4 * d_t, cross=True)
        for k in jax.random.split(ks[1], dims.n_text_layer)
    ]
    params = {
        "encoder": {
            "conv1": {
                "w": jax.random.normal(ks[2], (3, dims.n_mels, d_a)) * (3 * dims.n_mels) ** -0.5,
                "b": jnp.zeros((d_a,)),
            },
            "conv2": {
                "w": jax.random.normal(ks[3], (3, d_a, d_a)) * (3 * d_a) ** -0.5,
                "b": jnp.zeros((d_a,)),
            },
            "blocks": _stack_blocks(enc_blocks),
            "ln_post": {"g": jnp.ones((d_a,)), "b": jnp.zeros((d_a,))},
        },
        "decoder": {
            "tok_emb": jax.random.normal(ks[4], (dims.n_vocab, d_t)) * d_t**-0.5,
            "pos_emb": jax.random.normal(ks[5], (dims.n_text_ctx, d_t)) * 0.01,
            "blocks": _stack_blocks(dec_blocks),
            "ln": {"g": jnp.ones((d_t,)), "b": jnp.zeros((d_t,))},
        },
    }
    if untied_proj:
        params["decoder"]["proj"] = {
            "w": jax.random.normal(ks[6], (d_t, dims.n_vocab)) * d_t**-0.5
        }
    return params


# ---------------------------------------------------------------------------
# Primitive ops
# ---------------------------------------------------------------------------


def _ln(x, p, eps=1e-5):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * lax.rsqrt(var + eps) * p["g"] + p["b"]


def _linear(x, p):
    if "w8" in p:
        # weight-only int8: per-output-channel scales applied AFTER the dot
        # (y = (x @ W_q) * s + b is exact for column-wise scales). The int8
        # -> bf16 convert fuses into the dot's operand read on TPU, so the
        # weight stream is half the bf16 bytes.
        y = (x @ p["w8"].astype(x.dtype)) * p["s"].astype(x.dtype)
    else:
        y = x @ p["w"]
    if "b" in p:
        y = y + p["b"]
    return y


def _linear_w8a8(x, p):
    """Dynamic per-token int8 activations × static per-channel int8 weights.

    s8×s8→s32 runs at twice the bf16 rate on the MXU, and the scales apply
    exactly after the dot (y = (x8 @ w8) * xs * s + b for the quantized
    operands), so the only error is the two roundings. Used for the
    encoder's projection/MLP matmuls under the enc_int8 opt-in — the
    encoder is compute-bound, unlike the bandwidth-bound decode loop."""
    xs = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    x8 = jnp.round(
        x.astype(jnp.float32) / jnp.maximum(xs, 1e-8)
    ).astype(jnp.int8)
    y = jax.lax.dot_general(
        x8, p["w8"],
        dimension_numbers=(((x8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * xs * p["s"].astype(jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_linear_tree(blocks):
    """Per-output-channel int8 weight quantization of the layer-stacked
    decoder blocks tree (every ``{"w": ...}`` linear leaf dict becomes
    ``{"w8", "s"}``; biases and layernorm params pass through). Used for the
    decode loop's weight stream — the loop re-reads every decoder weight at
    each step, so halving the bytes is a bandwidth lever with per-channel
    (near-lossless) quantization error. ``_linear`` consumes either form."""

    def walk(node):
        if isinstance(node, dict):
            if "w" in node:
                w = node["w"]
                s = (
                    jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
                    / 127.0
                )
                w8 = jnp.round(
                    w.astype(jnp.float32) / jnp.maximum(s, 1e-8)
                ).astype(jnp.int8)
                out = {"w8": w8, "s": s.astype(jnp.float32)}
                if "b" in node:
                    out["b"] = node["b"]
                return out
            return {k: walk(v) for k, v in node.items()}
        return node

    return walk(blocks)


def _split_heads(x, n_head):  # (B, S, D) -> (B, H, S, dh)
    B, S, D = x.shape
    return x.reshape(B, S, n_head, D // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):  # (B, H, S, dh) -> (B, S, D)
    B, H, S, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(B, S, H * dh)


def _encoder_attention(q, k, v, n_head, allow_pallas: bool = True):
    """Encoder self-attention (no mask, no scores needed).

    On TPU this routes through the in-tree Pallas flash-attention kernel:
    at n_audio_ctx=1500 the unfused path materializes the (B, H, T, T)
    score tensor (~1 GB at B=12 / large-v3) through HBM three times per
    layer — profiled at ~11 ms/layer, dominating the encoder. The sequence is
    padded to a 128-multiple with segment-id masking; padded rows are sliced
    away. Elsewhere (CPU tests) the plain XLA math path runs.

    ``allow_pallas=False`` forces the XLA path — required under tensor
    parallelism, where GSPMD cannot partition a pallas_call (the TP engine
    passes this down so the sharded head axis stays distributed).
    """
    dh = q.shape[-1] // n_head
    if allow_pallas and jax.default_backend() == "tpu" and dh % 8 == 0 and q.shape[1] >= 128:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes,
            SegmentIds,
            flash_attention,
        )

        qh = _split_heads(q, n_head)
        kh = _split_heads(k, n_head)
        vh = _split_heads(v, n_head)
        B, H, T, _ = qh.shape
        Tp = ((T + 127) // 128) * 128
        pad = Tp - T
        if pad:
            qh = jnp.pad(qh, ((0, 0), (0, 0), (0, pad), (0, 0)))
            kh = jnp.pad(kh, ((0, 0), (0, 0), (0, pad), (0, 0)))
            vh = jnp.pad(vh, ((0, 0), (0, 0), (0, pad), (0, 0)))
            ids = (jnp.arange(Tp) < T).astype(jnp.int32)[None].repeat(B, 0)
            seg = SegmentIds(q=ids, kv=ids)
        else:
            seg = None
        # whole-sequence blocks measured fastest at n_audio_ctx (5.6 vs 8.3 ms
        # per layer for the unfused XLA path; the default 128 blocks are 22 ms).
        # WTT_ENC_FLASH_BLOCK overrides for A/B sweeps (read at trace time).
        blk = min(Tp, int(os.environ.get("WTT_ENC_FLASH_BLOCK", "1536")))
        bs = BlockSizes(
            block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
            block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
            block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
        )
        out = flash_attention(
            qh, kh, vh, segment_ids=seg, sm_scale=dh**-0.5, block_sizes=bs
        )
        return _merge_heads(out[:, :, :T])
    out, _ = _attention(q, k, v, n_head)
    return out


def _prefill_flash_attention(q, k, v, n_head, pad_len=None, causal=False):
    """Flash attention for the prompt prefill (TPU only; no scores emitted).

    q (B, P, D) attends k/v (B, S, D). The unfused prefill path materializes
    the (B, H, P, S) score tensor through HBM per layer — at large-v3 B=40
    with the 232-slot prompt region the CROSS scores alone are ~1.1 GB/layer,
    making the prefill score-bandwidth-bound (profiled at ~290 ms of a
    2.8 s window). Flash keeps the softmax in VMEM tiles.

    ``pad_len`` (B,) marks left-padded prompt slots (self-attention): slot s
    is live when s >= pad_len[b]; ``causal`` adds key<=query. Cross-attention
    passes pad_len=None (every key live). Sequence dims are padded to 128
    multiples with segment-id masking; left-pad and tail-pad rows produce
    finite garbage that downstream code never reads (left-pad cache slots are
    masked by kv_valid_from; only live rows' activations are selected).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, P, D = q.shape
    S = k.shape[1]
    dh = D // n_head
    qh = _split_heads(q, n_head)
    kh = _split_heads(k, n_head)
    vh = _split_heads(v, n_head)
    Pp = ((P + 127) // 128) * 128
    Sp = ((S + 127) // 128) * 128
    if Pp != P:
        qh = jnp.pad(qh, ((0, 0), (0, 0), (0, Pp - P), (0, 0)))
    if Sp != S:
        kh = jnp.pad(kh, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
        vh = jnp.pad(vh, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
    q_slot = jnp.arange(Pp, dtype=jnp.int32)[None]
    k_slot = jnp.arange(Sp, dtype=jnp.int32)[None]
    if pad_len is not None:
        seg_q = ((q_slot >= pad_len[:, None]) & (q_slot < P)).astype(jnp.int32)
        seg_kv = ((k_slot >= pad_len[:, None]) & (k_slot < S)).astype(jnp.int32)
    else:
        seg_q = jnp.broadcast_to((q_slot < P).astype(jnp.int32), (B, Pp))
        seg_kv = jnp.broadcast_to((k_slot < S).astype(jnp.int32), (B, Sp))
    blk_q = min(Pp, 256)
    blk_k = Sp if Sp <= 1536 else 1536
    bs = BlockSizes(
        block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1,
        block_q_major_dkv=blk_q, block_k_major_dkv=blk_k, block_k_dkv=blk_k,
        block_q_dkv=blk_q, block_k_major_dq=blk_k, block_k_dq=blk_k,
        block_q_dq=blk_q,
    )
    out = flash_attention(
        qh, kh, vh, causal=causal,
        segment_ids=SegmentIds(q=seg_q, kv=seg_kv),
        sm_scale=dh**-0.5, block_sizes=bs,
    )
    return _merge_heads(out[:, :, :P])


def _attention(q, k, v, n_head, mask=None, return_scores=False):
    """Multi-head attention. q,k,v: (B, S, D) post-projection.

    When ``return_scores``, the PRE-softmax scaled qk logits are returned in
    f32 — the same quantity whisper's MultiHeadAttention returns and the
    reference's alignment hooks capture (it is median-filtered and THEN
    softmaxed by the word aligner, reference ``transcribe.py:1546-1550``).
    """
    dh = q.shape[-1] // n_head
    qh = _split_heads(q, n_head) * dh**-0.25
    kh = _split_heads(k, n_head) * dh**-0.25
    vh = _split_heads(v, n_head)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh)
    if mask is not None:
        scores = scores + mask
    w = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", w, vh))
    return (out, scores.astype(jnp.float32)) if return_scores else (out, None)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _conv1d(x, p, stride):
    """NWC conv with SAME-style padding=1 (k=3)."""
    return (
        lax.conv_general_dilated(
            x, p["w"], window_strides=(stride,), padding=[(1, 1)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        + p["b"]
    )


def encode(
    params: Params, mel: jnp.ndarray, dims: WhisperDims, allow_pallas: bool = True
) -> jnp.ndarray:
    """Audio encoder: mel (B, n_mels, T) -> features (B, T//2, D)."""
    enc = params["encoder"]
    x = jnp.swapaxes(mel, -1, -2)  # (B, T, n_mels)
    x = x.astype(enc["conv1"]["w"].dtype)  # bf16 params -> bf16 compute
    x = jax.nn.gelu(_conv1d(x, enc["conv1"], 1), approximate=False)
    x = jax.nn.gelu(_conv1d(x, enc["conv2"], 2), approximate=False)
    pos = enc.get("pos_emb")
    if pos is None:
        pos = jnp.asarray(sinusoids(dims.n_audio_ctx, dims.n_audio_state))
    x = x + pos[: x.shape[1]].astype(x.dtype)

    # enc_int8 opt-in (engine-built int8 copy of the blocks): the encoder is
    # compute-bound, so the projection/MLP matmuls run W8A8 on the int8 MXU
    # path (2x the bf16 rate); attention QK^T/PV and the convs stay bf16
    blocks_q = enc.get("blocks_w8")
    lin = _linear if blocks_q is None else _linear_w8a8

    def block(x, bp):
        xn = _ln(x, bp["attn_ln"])
        a = _encoder_attention(
            lin(xn, bp["attn"]["q"]),
            lin(xn, bp["attn"]["k"]),
            lin(xn, bp["attn"]["v"]),
            dims.n_audio_head,
            allow_pallas=allow_pallas,
        )
        x = x + lin(a, bp["attn"]["o"])
        h = jax.nn.gelu(lin(_ln(x, bp["mlp_ln"]), bp["mlp"]["fc1"]), approximate=False)
        x = x + lin(h, bp["mlp"]["fc2"])
        return x, None

    x, _ = lax.scan(block, x, enc["blocks"] if blocks_q is None else blocks_q)
    return _ln(x, enc["ln_post"])


# ---------------------------------------------------------------------------
# Decoder — teacher-forced full forward (naive path, language detection, tests)
# ---------------------------------------------------------------------------


def _logits(x, dec):
    q = dec.get("logits_w8")
    if q is not None:
        # weight-only int8 logits projection (w_int8 engines): w8 is
        # (D, V) with per-vocab-column scales — y_v = (x @ w8_v) * s_v is
        # exact for the quantized weights, so the only error is the
        # per-column rounding. Halves the per-step vocab-matrix read.
        return (x @ q["w8"].astype(x.dtype)) * q["s"].astype(x.dtype)
    proj = dec.get("proj")
    if proj is not None:
        return x @ proj["w"]
    return x @ dec["tok_emb"].T


def decode_full(
    params: Params,
    tokens: jnp.ndarray,
    xa: jnp.ndarray,
    dims: WhisperDims,
    pos_offset: int = 0,
    return_cross_attn: bool = False,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Teacher-forced decoder forward.

    tokens: (B, S) int32; xa: (B, T, D) encoder output.
    Returns (logits (B, S, V), cross_attn (L, B, H, S, T) or None).
    Functional replacement for the reference's hooked second pass
    (``transcribe.py:1242-1245`` + cross_attn hooks ``transcribe.py:1105-1121``).
    """
    dec = params["decoder"]
    B, S = tokens.shape
    x = dec["tok_emb"][tokens] + dec["pos_emb"][pos_offset : pos_offset + S]
    causal = jnp.triu(jnp.full((S, S), -jnp.inf, x.dtype), k=1)

    def block(x, bp):
        xn = _ln(x, bp["attn_ln"])
        a, _ = _attention(
            _linear(xn, bp["attn"]["q"]),
            _linear(xn, bp["attn"]["k"]),
            _linear(xn, bp["attn"]["v"]),
            dims.n_text_head,
            mask=causal,
        )
        x = x + _linear(a, bp["attn"]["o"])
        xc = _ln(x, bp["cross_ln"])
        c, w = _attention(
            _linear(xc, bp["cross"]["q"]),
            _linear(xa, bp["cross"]["k"]),
            _linear(xa, bp["cross"]["v"]),
            dims.n_text_head,
            return_scores=True,
        )
        x = x + _linear(c, bp["cross"]["o"])
        h = jax.nn.gelu(_linear(_ln(x, bp["mlp_ln"]), bp["mlp"]["fc1"]), approximate=False)
        x = x + _linear(h, bp["mlp"]["fc2"])
        return x, w if return_cross_attn else jnp.zeros((), x.dtype)

    x, ws = lax.scan(block, x, dec["blocks"])
    logits = _logits(_ln(x, dec["ln"]), dec)
    return logits, (ws if return_cross_attn else None)


# ---------------------------------------------------------------------------
# Decoder — incremental step with KV cache (the hot decode loop)
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    """Self-attention KV cache, (L, B, ctx_len, D) each, plus precomputed
    cross-attention K/V from the encoder output, (L, B, T_audio, D) each.

    With ``quantize_cross`` (True/"int8"), xk/xv are int8 with per-position
    scales (L, B, T_audio) — the cross-KV read is the decode step's dominant
    HBM traffic at large models, and the scales fold into the attention math
    so dequantized arrays are never materialized. With ``"int4"``, xk/xv are
    (L, B, T_audio//2, D) int8 with two 4-bit frames nibble-packed per byte
    along T (scales stay per-frame), halving that stream again.

    With ``quantize_self``, k/v are likewise int8 with per-slot scales
    (L, B, ctx_len) in k_scale/v_scale — the self-KV read is the second
    stream (~2 GB/step at large-v3 B=40 with the 232-slot prompt region);
    rows are quantized as they are written (prefill and every step)."""

    k: jnp.ndarray
    v: jnp.ndarray
    xk: jnp.ndarray
    xv: jnp.ndarray
    xk_scale: jnp.ndarray
    xv_scale: jnp.ndarray
    k_scale: Optional[jnp.ndarray] = None
    v_scale: Optional[jnp.ndarray] = None


def _quantize_rows(x: jnp.ndarray):
    """Per-row (last-axis) symmetric int8 quantization. x: (..., D)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    q = jnp.round(x.astype(jnp.float32) / jnp.maximum(s, 1e-8)[..., None]).astype(jnp.int8)
    return q, s


def _quantize_rows_int4(x: jnp.ndarray):
    """Per-row symmetric int4 quantization, nibble-packed along the T axis.

    x: (..., T, D) with T even. Returns (packed (..., T//2, D) int8 — frame
    2i in the low nibble, 2i+1 in the high nibble, values in [-7, 7] — and
    per-frame scales (..., T) f32 in PARITY-MAJOR order: s[..., :T//2] are
    the even frames' scales, s[..., T//2:] the odd frames'). The parity-major
    layout makes the decode kernel's (..., 2, T//2) scale view a FREE reshape
    — the earlier frame-ordered contract forced a transpose (and a pad of the
    GB-scale packed K/V) inside every layer call of every decode step, which
    XLA never hoisted out of the while loop (measured 268.8 vs 18.6 ms/token
    at large-v3 B=40). Layout contract shared with
    ``ops.pallas_kernels.cross_attention_stacked_int4_pallas``; convert with
    ``_int4_scales_frame_order`` before any frame-ordered use."""
    T = x.shape[-2]
    assert T % 2 == 0, f"int4 cross-KV needs an even frame count, got {T}"
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 7.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / jnp.maximum(s, 1e-8)[..., None]),
        -7, 7,
    ).astype(jnp.int32)
    lo, hi = q[..., 0::2, :], q[..., 1::2, :]
    packed = ((lo & 0xF) | (hi << 4)).astype(jnp.int8)
    s_parity = jnp.concatenate([s[..., 0::2], s[..., 1::2]], axis=-1)
    return packed, s_parity


def _int4_scales_frame_order(s: jnp.ndarray) -> jnp.ndarray:
    """Parity-major int4 scales (..., T) -> frame order (even/odd interleaved).
    Used by the XLA fallback paths (CPU tests, TP meshes, prefill) next to
    ``_unpack_int4_rows``, whose output is frame-ordered."""
    Tp = s.shape[-1] // 2
    return jnp.stack([s[..., :Tp], s[..., Tp:]], axis=-1).reshape(
        *s.shape[:-1], -1
    )


def kernel_knob_key() -> tuple:
    """Hashable snapshot of the kernel-selection env knobs that are read at
    TRACE time inside the decode step (``WTT_XATTN_V3/V4``, ``WTT_INT4_S8``,
    ``WTT_SELF_MXU``, ``WTT_XATTN_BLOCK_T``, ``WTT_XATTN_VMEM_MB``,
    ``WTT_XATTN_PAR``). Passed through ``decode_window_jit`` as a static
    argument so that flipping any of them AFTER a first trace at a given
    shape produces a fresh jit cache entry (and hence an actual re-trace)
    instead of silently reusing the old program."""
    return tuple(
        os.environ.get(k, "")
        for k in (
            "WTT_XATTN_V3", "WTT_XATTN_V4", "WTT_INT4_S8", "WTT_SELF_MXU",
            "WTT_XATTN_BLOCK_T", "WTT_XATTN_VMEM_MB", "WTT_XATTN_PAR",
            "WTT_FORCE_STACKED", "WTT_ENC_FLASH_BLOCK",
        )
    )


def _xattn_block_t() -> int:
    """T-tile size for the stacked cross-attention decode kernels.

    Read at trace time (the decode step re-traces when any knob changes: the
    engine threads ``kernel_knob_key()`` through ``decode_window_jit`` as a
    static argument). Larger tiles mean fewer, bigger HBM→VMEM DMAs per
    grid step — the lever for the kernel's effective bandwidth. Default 1536
    covers the whole 1500-frame audio context in one tile; it needs the
    raised VMEM budget (`_xattn_mosaic_knobs`) and measured 17.06 vs
    18.62 ms/token at large-v3 B=40 int8 over the old 512 default."""
    return int(os.environ.get("WTT_XATTN_BLOCK_T", "1536"))


def _xattn_mosaic_knobs() -> dict:
    """Mosaic compiler knobs for the stacked cross-attention decode kernels,
    read at trace time like ``_xattn_block_t``:

    - ``WTT_XATTN_PAR=1`` marks the batch grid dim "parallel" (no carried
      state across b, so Mosaic may reorder/pipeline across it);
    - ``WTT_XATTN_VMEM_MB=N`` sets the kernel's VMEM budget; whole-context
      tiles (the block_t=1536 default) die on Mosaic's default ~16 MB limit,
      so this defaults to 64 (a ceiling, not an allocation — harmless for
      small tiles).
    """
    return dict(
        parallel_b=os.environ.get("WTT_XATTN_PAR") == "1",
        vmem_limit_mb=int(os.environ.get("WTT_XATTN_VMEM_MB", "64")),
    )


def _unpack_int4_rows(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of ``_quantize_rows_int4``'s packing (scales stay separate):
    (..., T//2, D) int8 -> (..., T, D) int8 in frame order. Used by the
    XLA fallback paths (CPU tests, TP meshes, prefill), which then flow
    through the regular int8 handling unchanged."""
    p32 = packed.astype(jnp.int32)
    lo = (p32 << 28) >> 28
    hi = (p32 << 24) >> 28
    stacked = jnp.stack([lo, hi], axis=-2)  # (..., T//2, 2, D)
    shape = packed.shape[:-2] + (2 * packed.shape[-2], packed.shape[-1])
    # row-major reshape of (T//2, 2, D) interleaves: 2i lo, 2i+1 hi
    return stacked.reshape(shape).astype(jnp.int8)


def init_cache(
    params: Params, xa: jnp.ndarray, dims: WhisperDims, dtype=None,
    ctx_len: Optional[int] = None, quantize_cross=False,  # False | True/"int8" | "int4"
    quantize_self: bool = False,
) -> KVCache:
    """``ctx_len`` sizes the self-attention cache (default n_text_ctx); callers
    that know prompt+max_new shrink it — every decode step reads the whole
    cache, so dead tail costs HBM bandwidth."""
    dec = params["decoder"]
    dtype = dtype or xa.dtype
    B = xa.shape[0]
    L, D = dims.n_text_layer, dims.n_text_state
    ctx_len = ctx_len or dims.n_text_ctx

    def cross_kv(bp):
        return _linear(xa, bp["cross"]["k"]), _linear(xa, bp["cross"]["v"])

    if quantize_self:
        zeros = jnp.zeros((L, B, ctx_len, D), jnp.int8)
        szeros = jnp.zeros((L, B, ctx_len), jnp.float32)
        self_kw = dict(k=zeros, v=zeros, k_scale=szeros, v_scale=szeros)
    else:
        zeros = jnp.zeros((L, B, ctx_len, D), dtype)
        self_kw = dict(k=zeros, v=zeros)
    if quantize_cross:
        # quantize per layer inside a sequential lax.map: quantizing a
        # vmapped (L, B, T, D) full-precision pair would keep ~9.8 GB of
        # bf16 K/V live at large-v3 B=40 (the int4 packing's strided
        # even/odd slicing defeats XLA's producer fusion) and OOM the chip;
        # per layer the transient is L times smaller and the projections
        # are still full-width MXU matmuls
        qfn = _quantize_rows_int4 if quantize_cross == "int4" else _quantize_rows

        def cross_kv_q(bp):
            k, v = cross_kv(bp)
            kq, ks = qfn(k)
            vq, vs = qfn(v)
            return kq, ks.astype(jnp.float32), vq, vs.astype(jnp.float32)

        xk_q, xk_s, xv_q, xv_s = lax.map(cross_kv_q, dec["blocks"])
        return KVCache(xk=xk_q, xv=xv_q, xk_scale=xk_s, xv_scale=xv_s,
                       **self_kw)
    xk, xv = jax.vmap(cross_kv, in_axes=(0,))(dec["blocks"])  # maps over layer axis
    ones = jnp.ones((L, B, 1), jnp.float32)
    return KVCache(xk=xk.astype(dtype), xv=xv.astype(dtype),
                   xk_scale=ones, xv_scale=ones, **self_kw)


def cross_attention(q, xk, xv, xk_scale, xv_scale, n_head, allow_pallas: bool = True):
    """Cross-attention supporting int8 K/V with per-position scales.

    Returns (out (B,S,D), pre-softmax scores f32 (B,H,S,T)) with whisper's
    dh**-0.25 scaling convention. The int8 path computes q@K^T in int8 operand
    form and applies the row scales to the score/weight matrices, so the
    dequantized K/V never exist in memory.
    """
    dh = q.shape[-1] // n_head
    if (
        allow_pallas
        and xk.dtype == jnp.int8
        and q.shape[1] == 1
        and n_head % 2 == 0
        and (2 * dh) % 128 == 0  # Mosaic lane constraint; true for dh=64 models
    ):
        # single-query decode step: Pallas kernel dequantizes K/V in-register
        # (plain XLA materializes the bf16 dequant to HBM, defeating int8)
        from ..ops.pallas_kernels import cross_attention_int8_pallas

        return cross_attention_int8_pallas(q, xk, xk_scale, xv, xv_scale, n_head)
    if xk.dtype == jnp.int8:
        qh = _split_heads(q, n_head).astype(jnp.bfloat16)
        kh = _split_heads(xk.astype(jnp.bfloat16), n_head)
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32)
        scores = scores * (xk_scale[:, None, None, :] * (dh**-0.5))
        w = jax.nn.softmax(scores, axis=-1)
        wv = (w * xv_scale[:, None, None, :]).astype(jnp.bfloat16)
        vh = _split_heads(xv.astype(jnp.bfloat16), n_head)
        out = _merge_heads(jnp.einsum("bhqk,bhkd->bhqd", wv, vh)).astype(q.dtype)
        return out, scores
    return _attention(q, xk, xv, n_head, return_scores=True)


# trace-time telemetry: incremented whenever a stacked decode kernel is
# dispatched through shard_map (the TP path) — tests and the driver dryrun
# assert it moved, so a silent fallback to the XLA path cannot masquerade as
# kernel coverage
TP_KERNEL_TRACES = [0]


def _mesh_tp(mesh) -> int:
    return int(dict(mesh.shape).get("tp", 1)) if mesh is not None else 1


def _mesh_bspec(mesh, B: int):
    """Batch-axis name for shard_map specs: "dp" when the batch divides the
    dp axis, else None (replicated — each dp group redundantly computes the
    whole batch, the correctness path for e.g. a B=1 serial decode)."""
    dp = int(dict(mesh.shape).get("dp", 1))
    return "dp" if (dp > 1 and B % dp == 0) else None


def tp_kernels_compatible(mesh, dims: WhisperDims) -> bool:
    """Whether the stacked decode kernels can run under this mesh via
    shard_map. Megatron TP shards the projections on the head axis, so each
    shard holds whole heads and its attention (softmax per head over the
    full context) is complete locally — no cross-shard math inside the
    kernel. Requires the head axis to split evenly AND the per-shard head
    count to satisfy the same layout constraints as the unsharded kernels
    (even head count; 2*dh a lane multiple)."""
    tp = _mesh_tp(mesh)
    if tp == 1:
        return True
    H, D = dims.n_text_head, dims.n_text_state
    return H % tp == 0 and (H // tp) % 2 == 0 and (2 * (D // H)) % 128 == 0


def decode_step(
    params: Params,
    tokens: jnp.ndarray,
    cache: KVCache,
    pos: jnp.ndarray,
    dims: WhisperDims,
    pos_offset: Optional[jnp.ndarray] = None,
    kv_valid_from: Optional[jnp.ndarray] = None,
    capture_attention: bool = True,
    align_heads: Optional[Tuple[Tuple[int, int], ...]] = None,
    unroll_layers: int = 1,
    allow_pallas: bool = True,
    mesh=None,  # static jax.sharding.Mesh: run the stacked kernels via shard_map
    beam_group: int = 1,  # q rows per shared cross-KV row: the beam/best_of
    #   fan-out keeps ONE copy of the window's encoder K/V and the stacked
    #   kernels index it at b // beam_group (k x less cross-KV HBM + stream)
) -> Tuple[jnp.ndarray, KVCache, jnp.ndarray]:
    """One decode step for S_new tokens (S_new=1 in the loop, >1 for the prompt).

    tokens: (B, S_new) int32; pos: scalar int32 — write offset in the cache.
    pos_offset: optional (B,) — subtracted from cache slots to get positional
    indices (supports left-padded prompts of varying length in one program).
    kv_valid_from: optional (B,) — cache slots below this are masked out.
    Returns (logits (B, S_new, V), updated cache, cross-attn).

    Cross-attn shape: with ``align_heads`` a static (layer, head) tuple, only
    those rows are accumulated INSIDE the layer scan — (B, K, S_new, T) — so
    the full per-layer score tensor never round-trips to HBM (it costs ~45%
    of the step otherwise). With align_heads=None the full (L, B, H, S_new, T)
    scores are emitted (teacher-forced/naive path and tests).

    Emitting cross-attention + logits from the step is the functional
    equivalent of the reference's four hook families (``transcribe.py:883-900``).
    """
    dec = params["decoder"]
    B, S = tokens.shape
    if pos_offset is None:
        x = dec["tok_emb"][tokens] + lax.dynamic_slice_in_dim(dec["pos_emb"], pos, S, axis=0)
    else:
        pos_ids = jnp.clip(
            pos + jnp.arange(S, dtype=jnp.int32)[None, :] - pos_offset[:, None],
            0,
            dims.n_text_ctx - 1,
        )
        x = dec["tok_emb"][tokens] + dec["pos_emb"][pos_ids]
    self_int8 = cache.k.dtype == jnp.int8
    x = x.astype(dec["tok_emb"].dtype if self_int8 else cache.k.dtype)

    # mask over cache positions: new token i may attend to cache slots < pos+i+1
    ctx = cache.k.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (S, ctx), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (S, ctx), 0)
    ok = col <= pos + row
    if kv_valid_from is not None:
        # keep the query's own slot attendable so no row is fully masked
        ok = ok[None] & ((col[None] >= kv_valid_from[:, None, None]) | (col == pos + row)[None])
        mask = jnp.where(ok, 0.0, -jnp.inf).astype(x.dtype)[:, None]  # (B,1,S,ctx)
    else:
        mask = jnp.where(ok, 0.0, -jnp.inf).astype(x.dtype)

    if align_heads is not None:
        head_layer = np.array([l for l, _ in align_heads])  # (K,)
        head_idx = np.array([h for _, h in align_heads])  # (K,)
        # real frame count: xk's T axis is halved when the cross-KV is int4
        # nibble-packed along T (detected by the per-frame scale length)
        T_frames = cache.xk.shape[2]
        if cache.xk.dtype == jnp.int8 and cache.xk_scale.shape[2] == 2 * T_frames:
            T_frames = cache.xk_scale.shape[2]
        acc0 = jnp.zeros((B, len(align_heads), S, T_frames), jnp.float32)
    else:
        acc0 = jnp.zeros((), jnp.float32)

    B_, ctx_, D_ = cache.k.shape[1], cache.k.shape[2], cache.k.shape[3]

    # single-query bf16 cross-attention on TPU goes through the stacked-layer
    # Pallas kernel, which reads its layer's K/V row straight out of the
    # (L, B, T, D) buffer (scalar-prefetch-driven BlockSpec). Passing the
    # cross-KV through scan xs instead makes XLA materialize a full per-layer
    # slice COPY every step — profiled at ~8 ms of a ~21 ms step at large-v3.
    # WTT_FORCE_STACKED=1 runs the kernels in interpret mode off-TPU — how
    # the virtual-mesh tests validate the shard_map TP path numerically
    use_stacked_xattn = (
        (allow_pallas or mesh is not None)
        and (jax.default_backend() == "tpu"
             or os.environ.get("WTT_FORCE_STACKED") == "1")
        and S == 1
        and dims.n_text_head % 2 == 0
        and (2 * (dims.n_text_state // dims.n_text_head)) % 128 == 0
        and tp_kernels_compatible(mesh, dims)
        # beam fan-out + TP sharding both remap the kernel batch axis; their
        # composition is untested, so that combination keeps the XLA path
        and (beam_group == 1 or mesh is None)
    )
    tp_ = _mesh_tp(mesh) if use_stacked_xattn else 1
    n_head_k = dims.n_text_head // tp_  # per-shard head count inside kernels
    if mesh is not None and tp_ == 1:
        mesh = None  # tp=1 mesh: kernels run unsharded (dp handled by GSPMD)
    if mesh is not None:
        from jax.sharding import PartitionSpec as _P

        _b = _mesh_bspec(mesh, B)
        SPEC_SC = _P()  # traced scalars (l_idx, pos, score_flag)
        SPEC_Q = _P(_b, None, "tp")  # (B, 1, D) head-sharded activations
        SPEC_KV = _P(None, _b, None, "tp")  # (L, B, *, D) stacked caches
        SPEC_SCALE = _P(None, _b, None)  # (L, B, T) per-row scales: replicated over tp
        SPEC_PAD = _P(_b)  # (B,)
        SPEC_W = _P(_b, "tp", None, None)  # (B, H, 1, T) scores: head-sharded
    else:
        SPEC_SC = SPEC_Q = SPEC_KV = SPEC_SCALE = SPEC_PAD = SPEC_W = None

    def _kcall(fn, args, in_specs, out_specs, **kw):
        """Invoke a stacked kernel, via shard_map over the mesh when present.

        ``args`` excludes the head count; the effective count inside the
        shard_map body is the PER-SHARD head count (whole heads per shard —
        see tp_kernels_compatible). Traced values must travel through
        ``args`` (shard_map bodies cannot close over tracers); static knobs
        ride ``kw``."""
        if mesh is None:
            return fn(*args, dims.n_text_head, **kw)

        def body(*a):
            return fn(*a, n_head_k, **kw)

        TP_KERNEL_TRACES[0] += 1
        return jax.shard_map(
            body, mesh=mesh, in_specs=tuple(in_specs), out_specs=out_specs,
            check_vma=False,
        )(*args)

    def _xcall(fn, args, sf, **kw):
        """Cross-attention kernel dispatch: ``args`` = (l_idx, q, *kv
        buffers); ``sf`` the traced per-layer score flag. Under the mesh the
        scores come back head-sharded (each shard emitted its own heads)."""
        emit = kw.get("emit_scores", True)
        if mesh is None:
            return fn(*args, dims.n_text_head, score_flag=sf, **kw)

        def body(*a):
            return fn(*a[:-1], n_head_k, score_flag=a[-1], **kw)

        n_kv = len(args) - 2
        kv_specs = (
            (SPEC_KV, SPEC_SCALE, SPEC_KV, SPEC_SCALE)
            if n_kv == 4
            else (SPEC_KV, SPEC_KV)
        )
        out_specs = (SPEC_Q, SPEC_W) if emit else (SPEC_Q, None)
        TP_KERNEL_TRACES[0] += 1
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(SPEC_SC, SPEC_Q) + kv_specs + (SPEC_SC,),
            out_specs=out_specs, check_vma=False,
        )(*args, sf)
    # int4 cross-KV is nibble-packed along T: half as many rows as scales
    stacked_int4 = (
        cache.xk.dtype == jnp.int8
        and cache.xk.shape[2] * 2 == cache.xk_scale.shape[2]
    )
    stacked_int8 = cache.xk.dtype == jnp.int8 and not stacked_int4

    def block(carry, layer_in):
        # the self-attention cache rides the CARRY (updated in place at
        # (layer, :, pos)), not scan xs/ys: the xs/ys form forces XLA to
        # round-trip each layer's full cache slice through copies every step
        # (profiled at ~3 ms/step at large-v3 B=12); the carry form writes
        # only the new (B, S, D) row
        if self_int8:
            x, acc, k_all, v_all, ks_all, vs_all = carry
        else:
            x, acc, k_all, v_all = carry
        if use_stacked_xattn:
            l_idx, bp = layer_in
        else:
            l_idx, bp, xk, xv, xk_s, xv_s = layer_in
        xn = _ln(x, bp["attn_ln"])
        k_new = _linear(xn, bp["attn"]["k"])
        v_new = _linear(xn, bp["attn"]["v"])
        if self_int8:
            kq, ks = _quantize_rows(k_new)  # (B, S, D) int8, (B, S) f32
            vq, vs = _quantize_rows(v_new)
            k_all = lax.dynamic_update_slice(k_all, kq[None], (l_idx, 0, pos, 0))
            v_all = lax.dynamic_update_slice(v_all, vq[None], (l_idx, 0, pos, 0))
            ks_all = lax.dynamic_update_slice(ks_all, ks[None], (l_idx, 0, pos))
            vs_all = lax.dynamic_update_slice(vs_all, vs[None], (l_idx, 0, pos))
        else:
            k_all = lax.dynamic_update_slice(k_all, k_new[None], (l_idx, 0, pos, 0))
            v_all = lax.dynamic_update_slice(v_all, v_new[None], (l_idx, 0, pos, 0))
        if use_stacked_xattn:
            # read layer l of the stacked cache directly inside the kernel —
            # the dynamic_slice form materializes a (B, ctx, D) copy of K and
            # V per layer per step (~2.4 GB/step of copy traffic at large-v3)
            pad = (
                kv_valid_from
                if kv_valid_from is not None
                else jnp.zeros((B_,), jnp.int32)
            )
            if self_int8:
                from ..ops.pallas_kernels import (
                    self_attention_stacked_int8_mxu_pallas,
                    self_attention_stacked_int8_pallas,
                )

                # s8-MXU variant drops the (CTX, D) dequant cast passes
                _self8 = (
                    self_attention_stacked_int8_mxu_pallas
                    if os.environ.get("WTT_SELF_MXU") == "1"
                    else self_attention_stacked_int8_pallas
                )
                a = _kcall(
                    _self8,
                    (l_idx, _linear(xn, bp["attn"]["q"]), k_all, ks_all,
                     v_all, vs_all, pos, pad),
                    (SPEC_SC, SPEC_Q, SPEC_KV, SPEC_SCALE, SPEC_KV,
                     SPEC_SCALE, SPEC_SC, SPEC_PAD),
                    SPEC_Q,
                )
            else:
                from ..ops.pallas_kernels import self_attention_stacked_pallas

                a = _kcall(
                    self_attention_stacked_pallas,
                    (l_idx, _linear(xn, bp["attn"]["q"]), k_all, v_all, pos,
                     pad),
                    (SPEC_SC, SPEC_Q, SPEC_KV, SPEC_KV, SPEC_SC, SPEC_PAD),
                    SPEC_Q,
                )
        else:
            k_cache = lax.dynamic_slice(k_all, (l_idx, 0, 0, 0), (1, B_, ctx_, D_))[0]
            v_cache = lax.dynamic_slice(v_all, (l_idx, 0, 0, 0), (1, B_, ctx_, D_))[0]
            if self_int8:
                # XLA fallback (CPU tests / TP meshes): dequantized views are
                # materialized — correctness path, not the bandwidth path
                ksl = lax.dynamic_slice(ks_all, (l_idx, 0, 0), (1, B_, ctx_))[0]
                vsl = lax.dynamic_slice(vs_all, (l_idx, 0, 0), (1, B_, ctx_))[0]
                k_cache = k_cache.astype(x.dtype) * ksl[..., None].astype(x.dtype)
                v_cache = v_cache.astype(x.dtype) * vsl[..., None].astype(x.dtype)
            a, _ = _attention(
                _linear(xn, bp["attn"]["q"]), k_cache, v_cache, dims.n_text_head,
                mask=mask,
            )
        x = x + _linear(a, bp["attn"]["o"])
        xc = _ln(x, bp["cross_ln"])
        q_cross = _linear(xc, bp["cross"]["q"])
        if use_stacked_xattn:
            # which layers' scores the consumer will keep: only the alignment
            # heads' layers (the aligner's signal) — the kernel skips the
            # score dot + write everywhere else (profiled at 900 ms of a
            # 1367 ms B=40 decode loop with scores emitted for all 32 layers)
            if align_heads is not None:
                need_sc = jnp.any(
                    jnp.asarray(head_layer, jnp.int32) == l_idx
                ).astype(jnp.int32)
            else:
                need_sc = jnp.int32(1)
            emit_sc = capture_attention or align_heads is not None
        if use_stacked_xattn and stacked_int4:
            # nibble-packed K/V: unpack is in-register shift arithmetic; the
            # cross-KV stream drops to ~1/4 of the bf16 bytes
            from ..ops.pallas_kernels import cross_attention_stacked_int4_pallas

            c, w = _xcall(
                cross_attention_stacked_int4_pallas,
                (l_idx, q_cross, cache.xk, cache.xk_scale, cache.xv,
                 cache.xv_scale),
                need_sc,
                block_t=_xattn_block_t(), emit_scores=emit_sc,
                use_s8=os.environ.get("WTT_INT4_S8") == "1",
                beam_group=beam_group,
                **_xattn_mosaic_knobs(),
            )
        elif use_stacked_xattn and stacked_int8:
            # v2: lane-parallel (same rewrite as the bf16 kernel) — the v1
            # int8 kernel's per-head M=1 dots made it compute-bound, slower
            # per byte than bf16 despite halving the DMA. v3 moves the
            # weighted-V tail to the MXU (WTT_XATTN_V3=1) — measured
            # in-loop EQUAL to v2 (18.66 vs 18.67 ms/token: the kernel is
            # stream-bound at this shape), so v2 stays the default
            from ..ops.pallas_kernels import (
                cross_attention_stacked_int8_pallas_v2,
                cross_attention_stacked_int8_pallas_v3,
                cross_attention_stacked_int8_pallas_v4,
            )

            # v4 (default): both contractions as native s8 MXU dots — the
            # bf16-dot kernels were MXU/VPU-compute-bound, not stream-bound;
            # measured in-loop 17.07 -> 13.33 ms/token at large-v3 B=40
            # (PARITY.md round-4 kernel hunt #3). WTT_XATTN_V4=0 falls back
            # to v2 (exact-q bf16 dots); WTT_XATTN_V3=1 selects v3.
            if os.environ.get("WTT_XATTN_V3") == "1":
                _xattn8 = cross_attention_stacked_int8_pallas_v3
            elif os.environ.get("WTT_XATTN_V4") == "0":
                _xattn8 = cross_attention_stacked_int8_pallas_v2
            else:
                _xattn8 = cross_attention_stacked_int8_pallas_v4
            c, w = _xcall(
                _xattn8,
                (l_idx, q_cross, cache.xk, cache.xk_scale, cache.xv,
                 cache.xv_scale),
                need_sc,
                block_t=_xattn_block_t(), emit_scores=emit_sc,
                beam_group=beam_group,
                **_xattn_mosaic_knobs(),
            )
        elif use_stacked_xattn:
            # v2: lane-parallel heads (block-diagonal sum matrices on the MXU)
            # + T-tiled online softmax; v1's 40 M=1 dots per program left the
            # kernel compute-bound at ~450-500 GB/s on a streaming problem
            from ..ops.pallas_kernels import cross_attention_stacked_pallas_v2

            c, w = _xcall(
                cross_attention_stacked_pallas_v2,
                (l_idx, q_cross, cache.xk, cache.xv),
                need_sc,
                block_t=_xattn_block_t(), emit_scores=emit_sc,
                beam_group=beam_group,
                **_xattn_mosaic_knobs(),
            )
        else:
            if xk.dtype == jnp.int8 and xk.shape[1] * 2 == xk_s.shape[1]:
                # int4 fallback (CPU tests / TP meshes): unpack to int8 and
                # reuse the int8 path — correctness, not the bandwidth path
                xk = _unpack_int4_rows(xk)
                xv = _unpack_int4_rows(xv)
                xk_s = _int4_scales_frame_order(xk_s)
                xv_s = _int4_scales_frame_order(xv_s)
            if beam_group > 1:
                # correctness path only (CPU tests / TP meshes): the kernel
                # path shares the rows via its index map instead
                xk = jnp.repeat(xk, beam_group, axis=0)
                xv = jnp.repeat(xv, beam_group, axis=0)
                xk_s = jnp.repeat(xk_s, beam_group, axis=0)
                xv_s = jnp.repeat(xv_s, beam_group, axis=0)
            c, w = cross_attention(
                q_cross, xk, xv, xk_s, xv_s, dims.n_text_head,
                allow_pallas=allow_pallas,
            )
        x = x + _linear(c, bp["cross"]["o"])
        h = jax.nn.gelu(_linear(_ln(x, bp["mlp_ln"]), bp["mlp"]["fc1"]), approximate=False)
        x = x + _linear(h, bp["mlp"]["fc2"])
        if align_heads is not None:
            # accumulate only the alignment-head rows (in-carry, never to HBM).
            # SELECT on the layer hit — never multiply by zero: layers whose
            # score emission the kernel skipped return garbage (possibly NaN
            # under the XLA fallback's uninitialized buffers), and NaN*0=NaN
            sel = w[:, head_idx]  # (B, K, S, T) static-index gather
            hit = jnp.asarray(head_layer) == l_idx  # (K,) bool
            acc = acc + jnp.where(
                hit[None, :, None, None], sel, jnp.zeros_like(sel)
            )
            w = jnp.zeros((x.shape[0], 1, 1, 1), jnp.float32)
        elif not capture_attention or w is None:
            w = jnp.zeros((x.shape[0], 1, 1, 1), jnp.float32)  # tiny placeholder
        if self_int8:
            return (x, acc, k_all, v_all, ks_all, vs_all), w
        return (x, acc, k_all, v_all), w

    L = dims.n_text_layer
    # unroll_layers: a scan over layer-stacked params makes XLA COPY each
    # layer's weight/KV slice out of the stacked constant every iteration
    # (profiled at ~40% of the decode step at large-v3). Fully unrolled, the
    # slices are static and fold into the matmuls as views.
    # optional weight-only int8 copy of the blocks (engine opt-in): the loop
    # re-reads every decoder weight each step, so the int8 copy halves the
    # weight stream; prefill/encoder/init_cache keep the bf16 originals
    step_blocks = dec.get("blocks_w8", dec["blocks"])
    xs = (
        (jnp.arange(L), step_blocks)
        if use_stacked_xattn
        else (jnp.arange(L), step_blocks, cache.xk, cache.xv,
              cache.xk_scale, cache.xv_scale)
    )
    if self_int8:
        init_carry = (x, acc0, cache.k, cache.v, cache.k_scale, cache.v_scale)
        (x, acc, k_c, v_c, ks_c, vs_c), ws = lax.scan(
            block, init_carry, xs,
            unroll=unroll_layers if unroll_layers > 1 else 1,
        )
        new_cache = cache._replace(k=k_c, v=v_c, k_scale=ks_c, v_scale=vs_c)
    else:
        (x, acc, k_c, v_c), ws = lax.scan(
            block, (x, acc0, cache.k, cache.v), xs,
            unroll=unroll_layers if unroll_layers > 1 else 1,
        )
        new_cache = cache._replace(k=k_c, v=v_c)
    logits = _logits(_ln(x, dec["ln"]), dec)
    out_attn = acc if align_heads is not None else ws
    return logits, new_cache, out_attn


def cast_params(params: Params, dtype) -> Params:
    """Cast all floating-point leaves (bf16 for TPU speed runs)."""
    return jax.tree.map(
        lambda x: x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x, params
    )


def count_parameters(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
