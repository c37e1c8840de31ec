"""The decode engine: jitted 30-second-window decoding with logit filters.

Replaces ``whisper.decoding.DecodingTask`` (which the reference drives through
``model.transcribe`` and hooks, reference ``transcribe.py:902-904`` and
``transcribe.py:1371-1393`` for the filter suite). TPU-first design:

  * The whole window decode — prompt prefill, greedy/sampled token loop,
    timestamp rules, EOT handling — is ONE compiled program (``lax.while_loop``
    inside jit). No per-token Python↔device round trip.
  * The prompt is **right-aligned** into a fixed-size prefix region of the KV
    cache, so ``sample_begin`` is static and every prompt length reuses the
    same executable; padded slots are masked out of self-attention and their
    positional index is shifted.
  * Each step *returns into preallocated buffers* the chosen token, its
    filtered log-probability (what the reference re-derives via the
    ``decoder.ln`` hook, ``transcribe.py:849-881``), and the cross-attention
    rows of the alignment heads (the ``cross_attn`` hooks,
    ``transcribe.py:783-793``) — so word alignment needs no second pass.
    Row convention matches the reference: ``attn[k]`` is the attention of the
    forward that PREDICTED token k (the prefill's last position predicts the
    first sampled token).
  * Temperature is a traced scalar: the fallback schedule
    (``transcribe.py:3086-3091``) never recompiles.
"""

from __future__ import annotations

import functools
import zlib
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .models.whisper_jax import (
    WhisperDims,
    decode_step,
    decode_full,
    encode,
    init_cache,
)
from .tokenizer import Tokenizer

# Fixed prompt-region size: sot_prev + up to (n_ctx//2 - 1) prompt tokens +
# sot sequence (<=4) + prefix. 232 = next multiple of 8 above 228.
PROMPT_REGION = 232
# Compact region for promptless windows (sot sequence + small prefix only):
# the self-attention cache is sized to sample_begin + max_new and EVERY decode
# step reads all of it, so 224 dead slots cost real HBM bandwidth; the prefill
# also shrinks 29x. Two static sizes = at most two compiled programs.
PROMPT_REGION_SMALL = 8
MAX_NEW_TOKENS = 224  # whisper's sample_len default: n_text_ctx // 2


@dataclass(frozen=True)
class DecodingOptions:
    """Mirror of whisper's DecodingOptions (the surface the reference passes
    through at ``transcribe.py:165-204``)."""

    task: str = "transcribe"
    language: Optional[str] = None
    temperature: float = 0.0
    sample_len: Optional[int] = None
    best_of: Optional[int] = None
    beam_size: Optional[int] = None
    patience: Optional[float] = None
    length_penalty: Optional[float] = None
    prompt: Optional[Sequence[int]] = None
    prefix: Optional[Sequence[int]] = None
    suppress_tokens: Optional[str] = "-1"
    suppress_blank: bool = True
    without_timestamps: bool = False
    max_initial_timestamp: Optional[float] = 1.0


@dataclass
class DecodingResult:
    tokens: List[int]
    text: str
    avg_logprob: float
    no_speech_prob: float
    temperature: float
    compression_ratio: float
    language: Optional[str] = None
    language_probs: Optional[dict] = None
    # per-sampled-token data (functional replacement of the reference's hooks)
    token_logprobs: Optional[np.ndarray] = None  # (n_sampled,)
    cross_attention: Optional[np.ndarray] = None  # (n_sampled, K, T_audio)
    audio_features: Optional[Any] = None


def compression_ratio(text: str) -> float:
    b = text.encode("utf-8")
    return len(b) / len(zlib.compress(b)) if b else 0.0


# ---------------------------------------------------------------------------
# Static filter masks (built per tokenizer+options on host)
# ---------------------------------------------------------------------------


def build_suppress_mask(tokenizer: Tokenizer, options: DecodingOptions, n_vocab: int) -> np.ndarray:
    """Additive mask (-inf at suppressed ids) — whisper's SuppressTokens."""
    suppress: List[int] = []
    st = options.suppress_tokens
    if isinstance(st, str) and st:
        # whisper parses with int() (which strips whitespace), so "-1, 50256"
        # must still trigger the non-speech sentinel
        ids = [int(t) for t in st.split(",") if t.strip()]
        suppress.extend(t for t in ids if t != -1)
        if -1 in ids:
            suppress.extend(tokenizer.non_speech_tokens)
    elif isinstance(st, (list, tuple)):
        suppress.extend(int(t) for t in st if int(t) != -1)
        if -1 in list(st):
            suppress.extend(tokenizer.non_speech_tokens)
    suppress.extend(
        [tokenizer.transcribe, tokenizer.translate, tokenizer.sot, tokenizer.sot_prev,
         tokenizer.sot_lm]
    )
    if tokenizer.no_speech is not None:
        suppress.append(tokenizer.no_speech)
    mask = np.zeros((n_vocab,), np.float32)
    ids = [t for t in sorted(set(suppress)) if 0 <= t < n_vocab]
    mask[ids] = -np.inf
    return mask


def build_blank_mask(tokenizer: Tokenizer, n_vocab: int) -> np.ndarray:
    """SuppressBlank: ' ' and EOT at the first sampled position."""
    mask = np.zeros((n_vocab,), np.float32)
    ids = list(tokenizer.encode(" ")) + [tokenizer.eot]
    mask[[t for t in ids if 0 <= t < n_vocab]] = -np.inf
    return mask


# ---------------------------------------------------------------------------
# Timestamp rules (vectorized whisper ApplyTimestampRules)
# ---------------------------------------------------------------------------


def apply_timestamp_rules(
    logits: jnp.ndarray,  # (B, V)
    last_token: jnp.ndarray,  # (B,) int32: y_{i-1} (or sot-ish for i==0)
    penult_token: jnp.ndarray,  # (B,) int32
    max_timestamp: jnp.ndarray,  # (B,) int32: highest timestamp token sampled so far (or ts_begin-1)
    n_sampled: jnp.ndarray,  # scalar int32: number of sampled tokens so far
    *,
    ts_begin: int,
    eot: int,
    no_timestamps: int,
    max_initial_timestamp_index: Optional[int],
) -> jnp.ndarray:
    B, V = logits.shape
    neg_inf = jnp.array(-jnp.inf, logits.dtype)
    vocab_ids = jax.lax.broadcasted_iota(jnp.int32, (B, V), 1)
    is_ts = vocab_ids >= ts_begin
    is_text = vocab_ids < eot

    # suppress <|notimestamps|>
    logits = jnp.where(vocab_ids == no_timestamps, neg_inf, logits)

    last_was = (last_token >= ts_begin) & (n_sampled >= 1)
    penult_was = (penult_token >= ts_begin) | (n_sampled < 2)

    # after a lone timestamp: force text/EOT; after a timestamp pair: forbid timestamps
    forbid_ts = last_was & penult_was
    forbid_text = last_was & ~penult_was
    logits = jnp.where(forbid_ts[:, None] & is_ts, neg_inf, logits)
    logits = jnp.where(forbid_text[:, None] & is_text, neg_inf, logits)

    # timestamps must be non-decreasing: forbid < timestamp_last
    has_ts = max_timestamp >= ts_begin
    ts_last = jnp.where(last_was & ~penult_was, max_timestamp, max_timestamp + 1)
    logits = jnp.where(
        (has_ts[:, None]) & is_ts & (vocab_ids < ts_last[:, None]), neg_inf, logits
    )

    # at the very first sampled position: force a timestamp, bounded by
    # max_initial_timestamp
    at_start = n_sampled == 0
    logits = jnp.where(at_start & (vocab_ids < ts_begin), neg_inf, logits)
    if max_initial_timestamp_index is not None:
        last_allowed = ts_begin + max_initial_timestamp_index
        logits = jnp.where(at_start & (vocab_ids > last_allowed), neg_inf, logits)

    # if total timestamp probability beats the best non-timestamp token
    # (INCLUDING EOT — whisper compares against max over [:timestamp_begin]),
    # sample a timestamp
    logprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ts_logprob = jax.nn.logsumexp(jnp.where(is_ts, logprobs, -jnp.inf), axis=-1)
    max_text = jnp.max(jnp.where(~is_ts, logprobs, -jnp.inf), axis=-1)
    force_ts = ts_logprob > max_text
    logits = jnp.where(force_ts[:, None] & ~is_ts, neg_inf, logits)
    return logits


# ---------------------------------------------------------------------------
# The jitted window decode
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=(
        "dims", "align_heads", "max_new", "sample_begin", "eot", "ts_begin",
        "no_timestamps", "sot_index_from_end", "max_initial_timestamp_index",
        "suppress_blank", "without_timestamps", "attn_dtype", "kv_int8",
        "kv_int4", "self_kv_int8", "capture_attention", "layer_unroll",
        "allow_pallas", "kernel_knobs", "mesh",
    ),
)
def decode_window_jit(
    params,
    mel: jnp.ndarray,  # (B, n_mels, 3000)
    prompt: jnp.ndarray,  # (B, P) int32, right-aligned, invalid slots arbitrary
    prompt_len: jnp.ndarray,  # (B,) int32: number of valid prompt tokens (incl. sot seq)
    suppress_mask: jnp.ndarray,  # (V,)
    blank_mask: jnp.ndarray,  # (V,)
    temperature: jnp.ndarray,  # scalar f32
    rng_key: jnp.ndarray,
    *,
    dims: WhisperDims,
    align_heads: Tuple[Tuple[int, int], ...],
    max_new: int = MAX_NEW_TOKENS,
    sample_begin: int = PROMPT_REGION,
    eot: int,
    ts_begin: int,
    no_timestamps: int,
    sot_index_from_end: int,  # position of <|startoftranscript|> counted from prompt end
    max_initial_timestamp_index: Optional[int],
    suppress_blank: bool = True,
    without_timestamps: bool = False,
    attn_dtype=jnp.float32,
    kv_int8: bool = False,
    kv_int4: bool = False,
    self_kv_int8: bool = False,
    capture_attention: bool = True,
    layer_unroll: int = 1,
    allow_pallas: bool = True,
    kernel_knobs: tuple = (),  # jit-cache key only; see kernel_knob_key()
    mesh=None,  # static Mesh: stacked decode kernels run sharded (shard_map)
):
    """Decode one 30-s window for a batch. Returns a dict of buffers:

    tokens (B, max_new), n_sampled (B,), sum_logprobs (B,),
    token_logprobs (B, max_new), attn (B, max_new, K, T_audio),
    no_speech_prob (B,).
    """
    B = mel.shape[0]
    P = sample_begin
    V = dims.n_vocab
    no_speech = no_timestamps - 1  # layout fact: <|nospeech|> precedes <|notimestamps|>

    xa = encode(params, mel, dims, allow_pallas=allow_pallas)
    # size the cache to the decode extent (8-aligned): the dead tail of a full
    # 448-slot cache is pure HBM-bandwidth waste at every step
    ctx_len = min(((P + max_new + 7) // 8) * 8, ((dims.n_text_ctx + 7) // 8) * 8 + 8)
    cache = init_cache(
        params, xa, dims, ctx_len=ctx_len,
        quantize_cross="int4" if kv_int4 else kv_int8,
        quantize_self=self_kv_int8,
    )

    pad_len = P - prompt_len  # (B,) left padding per batch element

    # ---- prefill: process the whole P-slot prompt region at once ----
    # positions: slot s has positional index max(0, s - pad_len)
    # decode_step computes pos via a scalar offset; we need per-batch shifts, so
    # we inline a variant here via vmapped gather of pos_emb.
    dec = params["decoder"]
    slot_ids = jnp.arange(P, dtype=jnp.int32)
    pos_ids = jnp.maximum(slot_ids[None, :] - pad_len[:, None], 0)  # (B, P)
    x = dec["tok_emb"][prompt] + dec["pos_emb"][pos_ids]
    x = x.astype(xa.dtype)

    # self-attention mask over cache slots: query slot q attends keys k with
    # pad_len <= k <= q
    ctx = ctx_len
    key_ids = jax.lax.broadcasted_iota(jnp.int32, (P, ctx), 1)
    q_ids = jax.lax.broadcasted_iota(jnp.int32, (P, ctx), 0)
    valid = (key_ids[None] >= pad_len[:, None, None]) & (key_ids[None] <= q_ids[None])
    # padding-slot queries keep their own slot attendable (a fully masked row
    # would produce NaNs that poison later cache slots)
    valid = valid | (key_ids == q_ids)[None]
    prefill_mask = jnp.where(valid, 0.0, -jnp.inf).astype(x.dtype)[:, None]  # (B,1,P,ctx)

    from .models.whisper_jax import (  # noqa: internal reuse
        _attention, _int4_scales_frame_order, _linear, _ln, _logits,
        _prefill_flash_attention, _quantize_rows, _unpack_int4_rows,
        cross_attention,
    )

    K = len(align_heads) if capture_attention else 0
    head_layer_arr = np.array([l for l, _ in align_heads])
    head_idx_arr = np.array([h for _, h in align_heads])
    T_audio = xa.shape[1]
    acc0 = jnp.zeros((B, max(K, 1), 1, T_audio), jnp.float32)

    # flash prefill: the unfused path materializes (B, H, P, T) score tensors
    # through HBM per layer (~1.1 GB/layer cross at large-v3 B=40 P=232 —
    # profiled at ~290 ms of a 2.8 s window); tiny prompt regions keep the
    # exact path (their full scores are reused for the last-row capture)
    dh_text = dims.n_text_state // dims.n_text_head
    use_flash_prefill = (
        allow_pallas
        and jax.default_backend() == "tpu"
        and P > 16
        and dh_text % 8 == 0
    )

    def prefill_block(carry, layer_in):
        x, acc = carry
        if self_kv_int8:
            l_idx, bp, k_cache, v_cache, ks_row, vs_row, xk, xv, xk_s, xv_s = layer_in
        else:
            l_idx, bp, k_cache, v_cache, xk, xv, xk_s, xv_s = layer_in
        if kv_int4:
            # unpack this layer's nibble-packed cross-KV once; the rest of
            # the prefill then follows the int8 path unchanged (the loop's
            # decode steps read the packed form via the int4 kernel)
            xk = _unpack_int4_rows(xk)
            xv = _unpack_int4_rows(xv)
            xk_s = _int4_scales_frame_order(xk_s)
            xv_s = _int4_scales_frame_order(xv_s)
        xn = _ln(x, bp["attn_ln"])
        k_new = _linear(xn, bp["attn"]["k"])
        v_new = _linear(xn, bp["attn"]["v"])
        q_self = _linear(xn, bp["attn"]["q"])
        if self_kv_int8:
            # rows enter the cache quantized (the loop reads them int8); the
            # prefill's own attention uses the exact local K/V — only
            # subsequent steps see quantization, matching the cross-KV design
            kq, ks = _quantize_rows(k_new)
            vq, vs = _quantize_rows(v_new)
            k_cache = lax.dynamic_update_slice_in_dim(k_cache, kq, 0, axis=1)
            v_cache = lax.dynamic_update_slice_in_dim(v_cache, vq, 0, axis=1)
            ks_row = lax.dynamic_update_slice_in_dim(ks_row, ks, 0, axis=1)
            vs_row = lax.dynamic_update_slice_in_dim(vs_row, vs, 0, axis=1)
            if use_flash_prefill:
                a = _prefill_flash_attention(
                    q_self, k_new, v_new, dims.n_text_head,
                    pad_len=pad_len, causal=True,
                )
            else:
                a, _ = _attention(
                    q_self, k_new, v_new, dims.n_text_head,
                    mask=prefill_mask[:, :, :, :P],
                )
        else:
            k_cache = lax.dynamic_update_slice_in_dim(k_cache, k_new, 0, axis=1)
            v_cache = lax.dynamic_update_slice_in_dim(v_cache, v_new, 0, axis=1)
            if use_flash_prefill:
                # attend over the just-computed P rows (the cache's empty tail
                # beyond P is masked out on the unfused path anyway)
                a = _prefill_flash_attention(
                    q_self, k_new, v_new, dims.n_text_head,
                    pad_len=pad_len, causal=True,
                )
            else:
                a, _ = _attention(
                    q_self, k_cache, v_cache, dims.n_text_head,
                    mask=prefill_mask,
                )
        x = x + _linear(a, bp["attn"]["o"])
        xc = _ln(x, bp["cross_ln"])
        q_cross = _linear(xc, bp["cross"]["q"])
        if capture_attention and P <= 16:
            # small prompt region: the full pass's scores are cheap to keep —
            # reuse them for the last position instead of a second
            # cross-attention that re-reads the (B, T, D) K/V from HBM
            c, w_full = cross_attention(
                q_cross, xk, xv, xk_s, xv_s, dims.n_text_head,
                allow_pallas=allow_pallas,
            )
            w_last = w_full[:, :, -1:]
        elif use_flash_prefill:
            if kv_int8 or kv_int4:  # int4 xk/xv were unpacked to int8 above
                xk_b = xk.astype(x.dtype) * xk_s[..., None].astype(x.dtype)
                xv_b = xv.astype(x.dtype) * xv_s[..., None].astype(x.dtype)
            else:
                xk_b, xv_b = xk, xv
            c = _prefill_flash_attention(q_cross, xk_b, xv_b, dims.n_text_head)
            w_last = None
        else:
            c, _ = cross_attention(
                q_cross, xk, xv, xk_s, xv_s, dims.n_text_head,
                allow_pallas=allow_pallas,
            )
            w_last = None
        if capture_attention:
            # the LAST prompt position's scores predict the first sampled token
            # (reference convention: token k <-> the row that predicted it).
            # Only alignment-head layers are consumed (hit-gated below), so
            # the (B, T, D) cross-KV re-read is skipped everywhere else
            if w_last is None:
                hit_any = jnp.any(jnp.asarray(head_layer_arr) == l_idx)

                def _last_scores(q1):
                    _, wl = cross_attention(
                        q1, xk, xv, xk_s, xv_s, dims.n_text_head,
                        allow_pallas=allow_pallas,
                    )
                    return wl

                w_last = lax.cond(
                    hit_any,
                    _last_scores,
                    lambda q1: jnp.zeros(
                        (B, dims.n_text_head, 1, T_audio), jnp.float32
                    ),
                    q_cross[:, -1:],
                )  # (B, H, 1, T)
            sel = w_last[:, head_idx_arr]  # (B, K, 1, T)
            hit = (jnp.asarray(head_layer_arr) == l_idx).astype(jnp.float32)
            acc = acc + sel * hit[None, :, None, None]
        x = x + _linear(c, bp["cross"]["o"])
        h = jax.nn.gelu(_linear(_ln(x, bp["mlp_ln"]), bp["mlp"]["fc1"]), approximate=False)
        x = x + _linear(h, bp["mlp"]["fc2"])
        if self_kv_int8:
            return (x, acc), (k_cache, v_cache, ks_row, vs_row)
        return (x, acc), (k_cache, v_cache)

    if self_kv_int8:
        (x, prefill_rows), (k_c, v_c, ks_c, vs_c) = lax.scan(
            prefill_block, (x, acc0),
            (jnp.arange(dims.n_text_layer), dec["blocks"], cache.k, cache.v,
             cache.k_scale, cache.v_scale,
             cache.xk, cache.xv, cache.xk_scale, cache.xv_scale),
            unroll=layer_unroll if layer_unroll > 1 else 1,
        )
        cache = cache._replace(k=k_c, v=v_c, k_scale=ks_c, v_scale=vs_c)
    else:
        (x, prefill_rows), (k_c, v_c) = lax.scan(
            prefill_block, (x, acc0),
            (jnp.arange(dims.n_text_layer), dec["blocks"], cache.k, cache.v,
             cache.xk, cache.xv, cache.xk_scale, cache.xv_scale),
            unroll=layer_unroll if layer_unroll > 1 else 1,
        )
        cache = cache._replace(k=k_c, v=v_c)
    # logits only where needed: the sot position (no-speech prob) and the last
    # position (first sampled token) — not all P prompt positions
    sot_slot = P - sot_index_from_end
    x_sel = jnp.stack([x[:, sot_slot], x[:, -1]], axis=1)  # (B, 2, D)
    sel_logits = _logits(_ln(x_sel, dec["ln"]), dec)  # (B, 2, V)
    no_speech_prob = jax.nn.softmax(sel_logits[:, 0].astype(jnp.float32), axis=-1)[:, no_speech]
    prefill_last_logits = sel_logits[:, 1]

    init = dict(
        i=jnp.int32(0),
        last_logits=prefill_last_logits,  # (B, V)
        last_token=prompt[:, -1],
        penult_token=prompt[:, -2],
        max_timestamp=jnp.full((B,), ts_begin - 1, jnp.int32),
        tokens=jnp.full((B, max_new), eot, jnp.int32),
        token_logprobs=jnp.zeros((B, max_new), jnp.float32),
        # the timestamp-slice rows feed the same repair/alignment machinery as
        # the attention rows; skip the (B, max_new, 1501) buffer with them
        ts_logprobs=jnp.zeros(
            (B, max_new, V - ts_begin) if capture_attention else (B, max_new, 1),
            jnp.float32,
        ),
        attn=(
            jnp.zeros((B, max_new, K, T_audio), attn_dtype)
            .at[:, 0]
            .set(prefill_rows[:, :K, 0].astype(attn_dtype))
            if capture_attention
            else jnp.zeros((B, max_new, K, T_audio), attn_dtype)
        ),
        sum_logprobs=jnp.zeros((B,), jnp.float32),
        finished=jnp.zeros((B,), bool),
        cache=cache,
        key=rng_key,
    )

    def cond(c):
        return (c["i"] < max_new) & ~jnp.all(c["finished"])

    def body(c):
        i = c["i"]
        logits = c["last_logits"].astype(jnp.float32)
        # --- filters (whisper order: blank, suppress, timestamp rules) ---
        if suppress_blank:
            logits = jnp.where(i == 0, logits + blank_mask[None, :], logits)
        logits = logits + suppress_mask[None, :]
        if not without_timestamps:
            logits = apply_timestamp_rules(
                logits, c["last_token"], c["penult_token"], c["max_timestamp"], i,
                ts_begin=ts_begin, eot=eot, no_timestamps=no_timestamps,
                max_initial_timestamp_index=max_initial_timestamp_index,
            )
        logprobs = jax.nn.log_softmax(logits, axis=-1)

        key, sub = jax.random.split(c["key"])
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        sampled = jax.random.categorical(sub, logits / jnp.maximum(temperature, 1e-6), axis=-1).astype(jnp.int32)
        tok = jnp.where(temperature > 0, sampled, greedy)
        # sequence-length cap: force EOT when the true position would exceed n_ctx
        overflow = (P + i - pad_len) >= (dims.n_text_ctx - 1)
        tok = jnp.where(c["finished"] | overflow, eot, tok)

        tok_logprob = jnp.take_along_axis(logprobs, tok[:, None], axis=-1)[:, 0]
        newly_counted = ~c["finished"]
        sum_logprobs = c["sum_logprobs"] + jnp.where(newly_counted, tok_logprob, 0.0)
        finished = c["finished"] | (tok == eot)

        tokens = c["tokens"].at[:, i].set(tok)
        token_logprobs = c["token_logprobs"].at[:, i].set(
            jnp.where(newly_counted, tok_logprob, 0.0)
        )
        # timestamp-token slice of the step's distribution: consumed by the
        # end-token re-estimation heuristic (reference transcribe.py:528-538)
        ts_logprobs = (
            c["ts_logprobs"].at[:, i].set(logprobs[:, ts_begin:])
            if capture_attention
            else c["ts_logprobs"]
        )

        # --- feed the chosen token through the decoder ---
        step_pos = P + i
        logits_new, cache, rows = decode_step(
            params, tok[:, None], c["cache"], step_pos, dims,
            pos_offset=pad_len, kv_valid_from=pad_len,
            capture_attention=capture_attention,
            align_heads=align_heads if capture_attention else None,
            unroll_layers=layer_unroll,
            allow_pallas=allow_pallas,
            mesh=mesh,
        )
        if capture_attention:
            # rows (B, K, 1, T): the forward that consumed y_i PREDICTS y_{i+1}
            # — store at i+1 (reference convention; index max_new is dropped)
            attn = c["attn"].at[:, i + 1].set(
                rows[:, :, 0].astype(attn_dtype), mode="drop"
            )
        else:
            attn = c["attn"]

        is_ts_tok = tok >= ts_begin
        return dict(
            i=i + 1,
            last_logits=logits_new[:, -1],
            last_token=tok,
            penult_token=c["last_token"],
            max_timestamp=jnp.where(
                is_ts_tok & ~c["finished"], jnp.maximum(c["max_timestamp"], tok), c["max_timestamp"]
            ),
            tokens=tokens,
            token_logprobs=token_logprobs,
            ts_logprobs=ts_logprobs,
            attn=attn,
            sum_logprobs=sum_logprobs,
            finished=finished,
            cache=cache,
            key=key,
        )

    out = lax.while_loop(cond, body, init)
    n_sampled = jnp.sum(out["tokens"] != eot, axis=-1) + jnp.where(
        jnp.any(out["tokens"] == eot, axis=-1), 1, 0
    )  # sampled tokens including the final EOT (if any)
    return dict(
        tokens=out["tokens"],
        n_steps=out["i"],
        sum_logprobs=out["sum_logprobs"],
        token_logprobs=out["token_logprobs"],
        ts_logprobs=out["ts_logprobs"],
        attn=out["attn"],
        no_speech_prob=no_speech_prob,
        n_sampled=n_sampled,
        audio_features=xa,
    )


# ---------------------------------------------------------------------------
# Language identification
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("dims", "sot", "lang_token_ids", "allow_pallas")
)
def _detect_language_jit(params, mel, *, dims, sot, lang_token_ids, allow_pallas=True):
    xa = encode(params, mel, dims, allow_pallas=allow_pallas)
    tokens = jnp.full((mel.shape[0], 1), sot, jnp.int32)
    logits, _ = decode_full(params, tokens, xa, dims)
    logits = logits[:, 0].astype(jnp.float32)  # (B, V)
    mask = jnp.full((dims.n_vocab,), -jnp.inf, jnp.float32)
    mask = mask.at[jnp.asarray(lang_token_ids)].set(0.0)
    probs = jax.nn.softmax(logits + mask[None, :], axis=-1)
    return probs


def detect_language(
    params, mel, dims: WhisperDims, tokenizer: Tokenizer, allow_pallas: bool = True
):
    """Language-id over a (B, n_mels, 3000) mel window.

    Returns (codes, probs_dicts) — the ``language_probs`` output the reference
    exposes (``transcribe.py:862-867``).
    """
    if mel.ndim == 2:
        mel = mel[None]
    probs = _detect_language_jit(
        params, mel, dims=dims, sot=tokenizer.sot,
        lang_token_ids=tuple(tokenizer.all_language_tokens),
        allow_pallas=allow_pallas,
    )
    probs = np.asarray(probs)
    codes, prob_dicts = [], []
    lang_tokens = list(tokenizer.all_language_tokens)
    lang_codes = list(tokenizer.all_language_codes)
    for b in range(probs.shape[0]):
        d = {code: float(probs[b, t]) for code, t in zip(lang_codes, lang_tokens)}
        best = max(d, key=d.get)
        codes.append(best)
        prob_dicts.append(d)
    return codes, prob_dicts


def decode(model, mel, options: Optional[DecodingOptions] = None, tokenizer=None) -> DecodingResult:
    """Single-window decode — counterpart of ``whisper.decode`` (which the
    reference re-exports, reference ``__init__.py:1-5``).

    model: a WhisperModel; mel: (n_mels, 3000) or (B, n_mels, 3000);
    returns DecodingResult (first batch element) with per-token logprobs and
    alignment-head cross-attention attached.
    """
    from .api import _resolve_tokenizer
    from .engine import DecodeEngine

    options = options or DecodingOptions()
    tok = _resolve_tokenizer(model, tokenizer, options.language, options.task)
    engine = DecodeEngine(model, tok)

    # keep device-resident mel on device (np.asarray would round-trip it
    # through the host before the engine re-uploads it)
    if not isinstance(mel, jnp.ndarray):
        mel = np.asarray(mel)
    language = options.language
    language_probs = None
    if language is None and tok.is_multilingual:
        # whisper.decode detects the language first when none is given
        codes, probs = detect_language(
            model.params, mel[None] if mel.ndim == 2 else mel, model.dims, tok
        )
        language, language_probs = codes[0], probs[0]
        options = DecodingOptions(**{**options.__dict__, "language": language})
    elif language is None:
        language = "en"

    if options.beam_size:
        res = engine.decode_window_beam(mel, options,
                                        prompt_tokens=options.prompt or ())
    elif options.temperature and (options.best_of or 0) > 1:
        res = engine.decode_window_best_of(
            mel, options, options.prompt or (), float(options.temperature), 0,
        )
        res.temperature = float(options.temperature)
    else:
        res = engine.decode_window(
            mel, options, prompt_tokens=options.prompt or (),
            temperature=options.temperature,
        )[0]
    return DecodingResult(
        tokens=res.tokens,
        text=res.text,
        avg_logprob=res.avg_logprob,
        no_speech_prob=res.no_speech_prob,
        temperature=res.temperature,
        compression_ratio=res.compression_ratio,
        language=language,
        language_probs=language_probs,
        token_logprobs=res.token_logprobs,
        cross_attention=res.attn,
    )
