"""Beam-search window decoding (whisper ``BeamSearchDecoder`` semantics).

One jitted program per window batch: prompt prefill shared across beams, then
a ``lax.while_loop`` where each step applies the logit filters per beam,
merges each window's candidate pool in descending score order (eot candidates
retire to a finished pool with ``beam_size*patience`` capacity, exactly like
whisper's dict-based implementation), and gathers the KV cache along the
winning beams. Final ranking (length-penalized avg logprob) happens on the
host.

The beam grid is folded into the BATCH axis — all ``B`` windows' ``K`` beams
decode as ``B*K`` rows through the same ``decode_step`` the greedy engine
uses, so the stacked Pallas attention kernels serve beam decode too (an
earlier revision vmapped a single-window core per window, which forced the
XLA fallback: the kernels carry no batching rule). Each window keeps its own
candidate pool and stops independently (a frozen window's rows keep riding
the loop as no-ops until every window finishes).

The reference can only run beam search through its two-pass "naive" engine
(forced at reference ``transcribe.py:233-245``); here beam decode is a peer of
the greedy engine and the teacher-forced pass supplies alignment attention.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .decoding import apply_timestamp_rules
from .models.whisper_jax import KVCache, WhisperDims, decode_step, encode, init_cache


_BEAM_STATICS = (
    "dims", "beam_size", "max_candidates", "max_new", "sample_begin", "eot",
    "ts_begin", "no_timestamps", "sot_index_from_end",
    "max_initial_timestamp_index", "suppress_blank", "without_timestamps",
    "allow_pallas", "mesh", "kv_int8",
)


@functools.partial(jax.jit, static_argnames=_BEAM_STATICS)
def decode_window_beam_jit(
    params,
    mel: jnp.ndarray,  # (1, n_mels, 3000)
    prompt: jnp.ndarray,  # (P,) int32 right-aligned
    prompt_len: jnp.ndarray,  # scalar int32
    suppress_mask: jnp.ndarray,
    blank_mask: jnp.ndarray,
    *,
    dims: WhisperDims,
    beam_size: int,
    max_candidates: int,
    max_new: int,
    sample_begin: int,
    eot: int,
    ts_begin: int,
    no_timestamps: int,
    sot_index_from_end: int,
    max_initial_timestamp_index: Optional[int],
    suppress_blank: bool = True,
    without_timestamps: bool = False,
    allow_pallas: bool = True,
    mesh=None,
    kv_int8: bool = False,
):
    """Single-window beam decode. Returns dict with finished
    sequences/scores and no_speech_prob (the B=1 case of the batched core)."""
    xa = encode(params, mel, dims, allow_pallas=allow_pallas)
    out = _beam_core_batched(
        params, xa, prompt[None], prompt_len[None], suppress_mask, blank_mask,
        kv_int8=kv_int8,
        dims=dims, beam_size=beam_size, max_candidates=max_candidates,
        max_new=max_new, sample_begin=sample_begin, eot=eot,
        ts_begin=ts_begin, no_timestamps=no_timestamps,
        sot_index_from_end=sot_index_from_end,
        max_initial_timestamp_index=max_initial_timestamp_index,
        suppress_blank=suppress_blank, without_timestamps=without_timestamps,
        allow_pallas=allow_pallas, mesh=mesh,
    )
    return {k: v[0] for k, v in out.items()}


@functools.partial(jax.jit, static_argnames=_BEAM_STATICS)
def decode_window_beam_batch_jit(
    params,
    mels: jnp.ndarray,  # (B, n_mels, 3000)
    prompts: jnp.ndarray,  # (B, P) int32 right-aligned
    prompt_lens: jnp.ndarray,  # (B,) int32
    suppress_mask: jnp.ndarray,
    blank_mask: jnp.ndarray,
    *,
    dims: WhisperDims,
    beam_size: int,
    max_candidates: int,
    max_new: int,
    sample_begin: int,
    eot: int,
    ts_begin: int,
    no_timestamps: int,
    sot_index_from_end: int,
    max_initial_timestamp_index: Optional[int],
    suppress_blank: bool = True,
    without_timestamps: bool = False,
    allow_pallas: bool = True,
    mesh=None,
    kv_int8: bool = False,
):
    """Batched beam decode: B independent windows in one program (the
    batched pipeline's pass-1 for ``beam_size``; no reference counterpart —
    the reference is strictly batch-1, reference ``transcribe.py:806``).

    The encoder runs batched over all windows; the beam grids fold into the
    batch axis (B*K rows through ``decode_step``), so the stacked Pallas
    attention kernels serve the loop on TPU."""
    xa = encode(params, mels, dims, allow_pallas=allow_pallas)
    return _beam_core_batched(
        params, xa, prompts, prompt_lens, suppress_mask, blank_mask,
        kv_int8=kv_int8,
        dims=dims, beam_size=beam_size, max_candidates=max_candidates,
        max_new=max_new, sample_begin=sample_begin, eot=eot,
        ts_begin=ts_begin, no_timestamps=no_timestamps,
        sot_index_from_end=sot_index_from_end,
        max_initial_timestamp_index=max_initial_timestamp_index,
        suppress_blank=suppress_blank, without_timestamps=without_timestamps,
        allow_pallas=allow_pallas, mesh=mesh,
    )


def _beam_core_batched(
    params,
    xa: jnp.ndarray,  # (B, T, D) encoded audio
    prompts: jnp.ndarray,  # (B, P) int32 right-aligned
    prompt_lens: jnp.ndarray,  # (B,) int32
    suppress_mask: jnp.ndarray,
    blank_mask: jnp.ndarray,
    *,
    dims: WhisperDims,
    beam_size: int,
    max_candidates: int,
    max_new: int,
    sample_begin: int,
    eot: int,
    ts_begin: int,
    no_timestamps: int,
    sot_index_from_end: int,
    max_initial_timestamp_index: Optional[int],
    suppress_blank: bool = True,
    without_timestamps: bool = False,
    allow_pallas: bool = True,
    mesh=None,
    kv_int8: bool = False,
):
    """B windows' beam searches in lock-step over pre-encoded audio.

    Beam rows are laid out window-major: flat row ``b*K + k``. Every returned
    array carries a leading window axis."""
    from .models.whisper_jax import (  # internal reuse
        _attention, _linear, _ln, _logits,
    )

    B = xa.shape[0]
    K = beam_size
    P = sample_begin
    V = dims.n_vocab
    no_speech = no_timestamps - 1
    NEG = jnp.float32(-1e30)
    bidx = jnp.arange(B)

    ctx_len = min(((P + max_new + 7) // 8) * 8, ((dims.n_text_ctx + 7) // 8) * 8 + 8)
    # prefill at B rows — all of a window's beams are identical until the
    # first sampled token (enforced by the -1e30 sum_logprobs init), so
    # running the P-slot prefill per beam would be K x redundant work; the KV
    # caches are tiled to K rows per window afterwards (window-major).
    # kv_int8 halves the dominant tiled cross-KV: every beam carries its own
    # copy of the window's encoder K/V, so at bf16 a large-v3 B=8 x K=5 run
    # ALONE needs ~9.8 GB of cross-KV and overflows HBM (measured: 15.82 of
    # 15.75 GB); int8 brings it to ~4.9 GB and B=8 fits
    cache = init_cache(params, xa, dims, ctx_len=ctx_len, quantize_cross=kv_int8)

    padB = P - prompt_lens  # (B,)
    pad_len = jnp.repeat(padB, K)  # (B*K,) per-row left padding

    dec = params["decoder"]
    slot_ids = jnp.arange(P, dtype=jnp.int32)
    pos_ids = jnp.maximum(slot_ids[None, :] - padB[:, None], 0)  # (B, P)
    x = dec["tok_emb"][prompts] + dec["pos_emb"][pos_ids]
    x = x.astype(cache.k.dtype)

    ctx = ctx_len
    key_ids = lax.broadcasted_iota(jnp.int32, (P, ctx), 1)
    q_ids = lax.broadcasted_iota(jnp.int32, (P, ctx), 0)
    valid = (key_ids[None] >= padB[:, None, None]) & (key_ids[None] <= q_ids[None])
    valid = valid | (key_ids == q_ids)[None]
    prefill_mask = jnp.where(valid, 0.0, -jnp.inf).astype(x.dtype)[:, None]

    def prefill_block(carry, layer_in):
        from .models.whisper_jax import cross_attention

        (x,) = carry
        bp, k_cache, v_cache, xk, xv, xk_s, xv_s = layer_in
        xn = _ln(x, bp["attn_ln"])
        k_new = _linear(xn, bp["attn"]["k"])
        v_new = _linear(xn, bp["attn"]["v"])
        k_cache = lax.dynamic_update_slice_in_dim(k_cache, k_new, 0, axis=1)
        v_cache = lax.dynamic_update_slice_in_dim(v_cache, v_new, 0, axis=1)
        a, _ = _attention(_linear(xn, bp["attn"]["q"]), k_cache, v_cache,
                          dims.n_text_head, mask=prefill_mask)
        x = x + _linear(a, bp["attn"]["o"])
        xc = _ln(x, bp["cross_ln"])
        c, _ = cross_attention(
            _linear(xc, bp["cross"]["q"]), xk, xv, xk_s, xv_s, dims.n_text_head,
            allow_pallas=allow_pallas,
        )
        x = x + _linear(c, bp["cross"]["o"])
        h = jax.nn.gelu(_linear(_ln(x, bp["mlp_ln"]), bp["mlp"]["fc1"]), approximate=False)
        x = x + _linear(h, bp["mlp"]["fc2"])
        return (x,), (k_cache, v_cache)

    (x,), (k_c, v_c) = lax.scan(
        prefill_block, (x,),
        (dec["blocks"], cache.k, cache.v, cache.xk, cache.xv, cache.xk_scale, cache.xv_scale),
    )
    # tile the SELF caches to K beam rows per window (window-major: b*K + k).
    # The cross-KV is NOT tiled: all of a window's beams attend the same
    # encoder K/V, and the stacked kernels read the shared (L, B, T, D)
    # buffer at row b // K (``beam_group``) — K x less cross-KV HBM and
    # stream than the tiled form. The XLA fallback (CPU tests / TP meshes)
    # materializes the per-beam view inside decode_step instead.
    beam_group = K
    cache = KVCache(
        jnp.repeat(k_c, K, axis=1), jnp.repeat(v_c, K, axis=1),
        cache.xk, cache.xv, cache.xk_scale, cache.xv_scale,
    )
    sot_slot = P - sot_index_from_end
    x_sel = jnp.stack([x[:, sot_slot], x[:, -1]], axis=1)  # (B, 2, D)
    sel_logits = _logits(_ln(x_sel, dec["ln"]), dec)
    no_speech_prob = jax.nn.softmax(sel_logits[:, 0].astype(jnp.float32), axis=-1)[:, no_speech]
    prefill_last_logits = jnp.repeat(sel_logits[:, 1][:, None], K, axis=1)  # (B, K, V)

    C = max_candidates
    init = dict(
        i=jnp.int32(0),
        last_logits=prefill_last_logits.astype(jnp.float32),  # (B, K, V)
        last_token=jnp.tile(prompts[:, -1:], (1, K)),
        penult_token=jnp.tile(prompts[:, -2:-1], (1, K)),
        max_timestamp=jnp.full((B, K), ts_begin - 1, jnp.int32),
        tokens=jnp.full((B, K, max_new), eot, jnp.int32),
        sum_logprobs=jnp.tile(
            jnp.concatenate([jnp.zeros((1,)), jnp.full((K - 1,), NEG)]
                            ).astype(jnp.float32)[None], (B, 1)),
        finished_seqs=jnp.full((B, C, max_new), eot, jnp.int32),
        finished_scores=jnp.full((B, C), NEG, jnp.float32),
        finished_len=jnp.zeros((B, C), jnp.int32),
        n_finished=jnp.zeros((B,), jnp.int32),
        steps=jnp.zeros((B,), jnp.int32),  # per-window step count at freeze
        cache=cache,
    )

    def window_done(c):
        # per-window stop: pool full OR the total token count would exceed
        # n_text_ctx (whisper stops decoding there; the greedy path forces
        # EOT at the same position, decoding.py)
        within_ctx = (prompt_lens + c["i"]) < (dims.n_text_ctx - 1)
        return (c["n_finished"] >= C) | ~within_ctx  # (B,)

    def cond(c):
        return (c["i"] < max_new) & jnp.any(~window_done(c))

    def body(c):
        i = c["i"]
        active = ~window_done(c)  # (B,)
        logits = c["last_logits"].reshape(B * K, V)
        if suppress_blank:
            logits = jnp.where(i == 0, logits + blank_mask[None, :], logits)
        logits = logits + suppress_mask[None, :]
        if not without_timestamps:
            logits = apply_timestamp_rules(
                logits, c["last_token"].reshape(-1), c["penult_token"].reshape(-1),
                c["max_timestamp"].reshape(-1), i,
                ts_begin=ts_begin, eot=eot, no_timestamps=no_timestamps,
                max_initial_timestamp_index=max_initial_timestamp_index,
            )
        logprobs = jax.nn.log_softmax(logits, axis=-1).reshape(B, K, V)
        flat = (c["sum_logprobs"][:, :, None] + logprobs).reshape(B, K * V)
        top_scores, top_idx = lax.top_k(flat, 2 * K)  # (B, 2K)
        src_beam = top_idx // V
        token = top_idx % V
        is_eot = token == eot

        # walk candidates in descending score, all windows in lock-step;
        # eot -> finished pool (capacity C), others -> next beams until K are
        # filled (whisper's break-at-K). A finished window pushes nothing.
        def push(state, j):
            (n_new, n_fin, sel_src, sel_tok, sel_score,
             fin_seqs, fin_scores, fin_len) = state
            cand_eot = is_eot[:, j]
            take_beam = (~cand_eot) & (n_new < K) & active
            take_fin = cand_eot & (n_fin < C) & (n_new < K) & active

            slot = jnp.minimum(n_new, K - 1)
            sel_src = sel_src.at[bidx, slot].set(
                jnp.where(take_beam, src_beam[:, j], sel_src[bidx, slot]))
            sel_tok = sel_tok.at[bidx, slot].set(
                jnp.where(take_beam, token[:, j], sel_tok[bidx, slot]))
            sel_score = sel_score.at[bidx, slot].set(
                jnp.where(take_beam, top_scores[:, j], sel_score[bidx, slot]))
            n_new = n_new + take_beam.astype(jnp.int32)

            seq = c["tokens"][bidx, src_beam[:, j]]  # (B, max_new)
            slot_f = jnp.minimum(n_fin, C - 1)
            fin_seqs = fin_seqs.at[bidx, slot_f].set(
                jnp.where(take_fin[:, None], seq, fin_seqs[bidx, slot_f]))
            fin_scores = fin_scores.at[bidx, slot_f].set(
                jnp.where(take_fin, top_scores[:, j], fin_scores[bidx, slot_f]))
            fin_len = fin_len.at[bidx, slot_f].set(
                jnp.where(take_fin, i, fin_len[bidx, slot_f]))
            n_fin = n_fin + take_fin.astype(jnp.int32)
            return (n_new, n_fin, sel_src, sel_tok, sel_score,
                    fin_seqs, fin_scores, fin_len), None

        state0 = (
            jnp.zeros((B,), jnp.int32), c["n_finished"],
            jnp.zeros((B, K), jnp.int32), jnp.zeros((B, K), jnp.int32),
            jnp.zeros((B, K), jnp.float32),
            c["finished_seqs"], c["finished_scores"], c["finished_len"],
        )
        (n_new, n_fin, sel_src, sel_tok, sel_score, fin_seqs, fin_scores, fin_len), _ = lax.scan(
            push, state0, jnp.arange(2 * K)
        )

        # frozen windows keep their state verbatim: identity beam selection,
        # eot fed through the decoder (harmless no-op rows)
        ident = jnp.tile(jnp.arange(K, dtype=jnp.int32)[None], (B, 1))
        sel_src = jnp.where(active[:, None], sel_src, ident)
        sel_tok = jnp.where(active[:, None], sel_tok, eot)
        sel_score = jnp.where(active[:, None], sel_score, c["sum_logprobs"])

        # reshuffle beam state along the selected source beams
        tokens = c["tokens"][bidx[:, None], sel_src].at[:, :, i].set(
            jnp.where(active[:, None], sel_tok, c["tokens"][bidx[:, None], sel_src][:, :, i]),
            mode="drop",
        )
        max_ts_g = c["max_timestamp"][bidx[:, None], sel_src]
        max_ts = jnp.where(
            (sel_tok >= ts_begin) & active[:, None],
            jnp.maximum(max_ts_g, sel_tok), max_ts_g,
        )
        rows = (bidx[:, None] * K + sel_src).reshape(-1)  # (B*K,) flat gather
        cache_g = c["cache"]._replace(
            k=c["cache"].k[:, rows], v=c["cache"].v[:, rows]
        )
        logits_new, cache_new, _ = decode_step(
            params, sel_tok.reshape(-1)[:, None], cache_g, P + i, dims,
            pos_offset=pad_len, kv_valid_from=pad_len,
            # no attention capture: beam alignment comes from the
            # teacher-forced pass, so emitting per-layer scores here would be
            # pure HBM waste (profiled at ~40% of a captured decode step)
            capture_attention=False,
            allow_pallas=allow_pallas, mesh=mesh, beam_group=beam_group,
        )
        return dict(
            i=i + 1,
            last_logits=logits_new[:, -1].astype(jnp.float32).reshape(B, K, V),
            last_token=sel_tok,
            penult_token=c["last_token"][bidx[:, None], sel_src],
            max_timestamp=max_ts,
            tokens=tokens,
            sum_logprobs=sel_score,
            finished_seqs=fin_seqs,
            finished_scores=fin_scores,
            finished_len=fin_len,
            n_finished=n_fin,
            steps=jnp.where(active, i + 1, c["steps"]),
            cache=cache_new,
        )

    out = lax.while_loop(cond, body, init)
    return dict(
        finished_seqs=out["finished_seqs"],
        finished_scores=out["finished_scores"],
        finished_len=out["finished_len"],
        n_finished=out["n_finished"],
        beam_tokens=out["tokens"],
        beam_scores=out["sum_logprobs"],
        n_steps=out["steps"],
        no_speech_prob=no_speech_prob,
    )


def rank_beam_results(
    out: dict, eot: int, length_penalty: Optional[float]
) -> Tuple[list, float]:
    """Host-side finalization + MaximumLikelihoodRanker (whisper semantics).

    Returns (tokens excluding eot, sum_logprob of the winner).
    """
    n_fin = int(out["n_finished"])
    seqs = np.asarray(out["finished_seqs"])[:n_fin]
    scores = np.asarray(out["finished_scores"])[:n_fin].tolist()
    lens = np.asarray(out["finished_len"])[:n_fin].tolist()
    candidates = [(seqs[j][: lens[j]].tolist(), scores[j]) for j in range(n_fin)]

    beam_size = int(np.asarray(out["beam_tokens"]).shape[0])
    if len(candidates) < beam_size:
        # whisper's BeamSearchDecoder.finalize: only when fewer than beam_size
        # sequences finished, pad with still-running beams (descending score)
        # until beam_size candidates exist — NOT up to max_candidates
        beam_tokens = np.asarray(out["beam_tokens"])
        beam_scores = np.asarray(out["beam_scores"])
        order = np.argsort(-beam_scores)
        n_steps = int(np.asarray(out["n_steps"]).reshape(-1)[0])
        for b in order:
            if len(candidates) >= beam_size:
                break
            toks = beam_tokens[b][:n_steps].tolist()
            toks = toks[: toks.index(eot)] if eot in toks else toks
            candidates.append((toks, float(beam_scores[b])))

    assert candidates, "beam search produced no candidates"

    def penalty(length):
        if length_penalty is None:
            return max(length, 1)
        return ((5.0 + length) / 6.0) ** length_penalty

    ranked = max(candidates, key=lambda ts: ts[1] / penalty(len(ts[0])))
    return ranked[0], ranked[1]
