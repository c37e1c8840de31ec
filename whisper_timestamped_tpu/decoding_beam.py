"""Beam-search window decoding (whisper ``BeamSearchDecoder`` semantics).

One jitted program per window: prompt prefill shared across beams, then a
``lax.while_loop`` where each step applies the logit filters per beam, merges
the global candidate pool in descending score order (eot candidates retire to
a finished pool with ``beam_size*patience`` capacity, exactly like whisper's
dict-based implementation), and gathers the KV cache along the winning beams.
Final ranking (length-penalized avg logprob) happens on the host.

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
    "allow_pallas",
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
):
    """Single-window beam decode. Returns dict with finished
    sequences/scores and no_speech_prob."""
    xa = encode(params, mel, dims, allow_pallas=allow_pallas)
    return _beam_core(
        params, xa, prompt, prompt_len, suppress_mask, blank_mask,
        dims=dims, beam_size=beam_size, max_candidates=max_candidates,
        max_new=max_new, sample_begin=sample_begin, eot=eot,
        ts_begin=ts_begin, no_timestamps=no_timestamps,
        sot_index_from_end=sot_index_from_end,
        max_initial_timestamp_index=max_initial_timestamp_index,
        suppress_blank=suppress_blank, without_timestamps=without_timestamps,
        allow_pallas=allow_pallas,
    )


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
):
    """Batched beam decode: B independent windows in one program (the
    batched pipeline's pass-1 for ``beam_size``; no reference counterpart —
    the reference is strictly batch-1, reference ``transcribe.py:806``).

    The encoder runs batched over all windows (one big MXU-friendly
    program, Pallas allowed); the per-window beam loop is ``vmap``-ped —
    beams become a (B, K) grid and the ``lax.while_loop`` runs until every
    window finishes. Pallas is disabled inside the vmapped region (the
    stacked-attention kernels carry no batching rule); the XLA decode path
    batches cleanly."""
    xa = encode(params, mels, dims, allow_pallas=allow_pallas)

    def one(xa1, prompt, plen):
        return _beam_core(
            params, xa1[None], prompt, plen, suppress_mask, blank_mask,
            dims=dims, beam_size=beam_size, max_candidates=max_candidates,
            max_new=max_new, sample_begin=sample_begin, eot=eot,
            ts_begin=ts_begin, no_timestamps=no_timestamps,
            sot_index_from_end=sot_index_from_end,
            max_initial_timestamp_index=max_initial_timestamp_index,
            suppress_blank=suppress_blank,
            without_timestamps=without_timestamps,
            allow_pallas=False,
        )

    return jax.vmap(one)(xa, prompts, prompt_lens)


def _beam_core(
    params,
    xa: jnp.ndarray,  # (1, T, D) encoded audio
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
):
    """One window's beam search over pre-encoded audio (vmap-safe)."""
    from .models.whisper_jax import (  # internal reuse
        _attention, _linear, _ln, _logits, cross_attention,
    )

    K = beam_size
    P = sample_begin
    V = dims.n_vocab
    no_speech = no_timestamps - 1
    NEG = jnp.float32(-1e30)

    ctx_len = min(((P + max_new + 7) // 8) * 8, ((dims.n_text_ctx + 7) // 8) * 8 + 8)
    # prefill at batch 1 — all beams are identical until the first sampled
    # token (enforced by the -1e30 sum_logprobs init), so running the P-slot
    # prefill per beam would be K x redundant work; the KV caches are tiled
    # to K rows afterwards
    cache = init_cache(params, xa, dims, ctx_len=ctx_len)

    pad1 = jnp.full((1,), P - prompt_len, jnp.int32)
    pad_len = jnp.full((K,), P - prompt_len, jnp.int32)

    dec = params["decoder"]
    slot_ids = jnp.arange(P, dtype=jnp.int32)
    pos_ids = jnp.maximum(slot_ids[None, :] - pad1[:, None], 0)
    prompt_k = jnp.tile(prompt[None, :], (K, 1))
    x = dec["tok_emb"][prompt[None, :]] + dec["pos_emb"][pos_ids]
    x = x.astype(cache.k.dtype)

    ctx = ctx_len
    key_ids = lax.broadcasted_iota(jnp.int32, (P, ctx), 1)
    q_ids = lax.broadcasted_iota(jnp.int32, (P, ctx), 0)
    valid = (key_ids[None] >= pad1[:, None, None]) & (key_ids[None] <= q_ids[None])
    valid = valid | (key_ids == q_ids)[None]
    prefill_mask = jnp.where(valid, 0.0, -jnp.inf).astype(x.dtype)[:, None]

    def prefill_block(carry, layer_in):
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
    # tile every per-batch cache array from 1 row to K beam rows
    cache = KVCache(*(jnp.repeat(a, K, axis=1) for a in (k_c, v_c, cache.xk,
                                                         cache.xv, cache.xk_scale, cache.xv_scale)))
    sot_slot = P - sot_index_from_end
    x_sel = jnp.stack([x[:, sot_slot], x[:, -1]], axis=1)  # (1, 2, D)
    sel_logits = _logits(_ln(x_sel, dec["ln"]), dec)
    no_speech_prob = jax.nn.softmax(sel_logits[0, 0].astype(jnp.float32))[no_speech]
    prefill_last_logits = jnp.repeat(sel_logits[:, 1], K, axis=0)  # (K, V)

    C = max_candidates
    init = dict(
        i=jnp.int32(0),
        last_logits=prefill_last_logits.astype(jnp.float32),  # (K, V)
        last_token=prompt_k[:, -1],
        penult_token=prompt_k[:, -2],
        max_timestamp=jnp.full((K,), ts_begin - 1, jnp.int32),
        tokens=jnp.full((K, max_new), eot, jnp.int32),
        sum_logprobs=jnp.concatenate([jnp.zeros((1,)), jnp.full((K - 1,), NEG)]).astype(jnp.float32),
        finished_seqs=jnp.full((C, max_new), eot, jnp.int32),
        finished_scores=jnp.full((C,), NEG, jnp.float32),
        finished_len=jnp.zeros((C,), jnp.int32),
        n_finished=jnp.int32(0),
        cache=cache,
    )

    def cond(c):
        # sequence-length cap: whisper stops decoding once the total token
        # count would exceed n_text_ctx (the greedy path forces EOT at the
        # same position, decoding.py); unfinished beams finalize eot-implied
        within_ctx = (prompt_len + c["i"]) < (dims.n_text_ctx - 1)
        return (c["i"] < max_new) & (c["n_finished"] < C) & within_ctx

    def body(c):
        i = c["i"]
        logits = c["last_logits"]
        if suppress_blank:
            logits = jnp.where(i == 0, logits + blank_mask[None, :], logits)
        logits = logits + suppress_mask[None, :]
        if not without_timestamps:
            logits = apply_timestamp_rules(
                logits, c["last_token"], c["penult_token"], c["max_timestamp"], i,
                ts_begin=ts_begin, eot=eot, no_timestamps=no_timestamps,
                max_initial_timestamp_index=max_initial_timestamp_index,
            )
        logprobs = jax.nn.log_softmax(logits, axis=-1)  # (K, V)
        flat = (c["sum_logprobs"][:, None] + logprobs).reshape(-1)  # (K*V,)
        top_scores, top_idx = lax.top_k(flat, 2 * K)
        src_beam = top_idx // V
        token = top_idx % V
        is_eot = token == eot

        # walk candidates in descending score; eot -> finished (capacity C),
        # others -> next beams until K are filled (whisper's break-at-K)
        def push(state, j):
            (n_new, n_fin, sel_src, sel_tok, sel_score,
             fin_seqs, fin_scores, fin_len) = state
            cand_eot = is_eot[j]
            take_beam = (~cand_eot) & (n_new < K)
            take_fin = cand_eot & (n_fin < C) & (n_new < K)

            sel_src = jnp.where(take_beam, sel_src.at[n_new].set(src_beam[j]), sel_src)
            sel_tok = jnp.where(take_beam, sel_tok.at[n_new].set(token[j]), sel_tok)
            sel_score = jnp.where(take_beam, sel_score.at[n_new].set(top_scores[j]), sel_score)
            n_new = n_new + jnp.where(take_beam, 1, 0)

            seq = c["tokens"][src_beam[j]]
            fin_seqs = jnp.where(take_fin, fin_seqs.at[n_fin].set(seq), fin_seqs)
            fin_scores = jnp.where(take_fin, fin_scores.at[n_fin].set(top_scores[j]), fin_scores)
            fin_len = jnp.where(take_fin, fin_len.at[n_fin].set(i), fin_len)
            n_fin = n_fin + jnp.where(take_fin, 1, 0)
            return (n_new, n_fin, sel_src, sel_tok, sel_score,
                    fin_seqs, fin_scores, fin_len), None

        state0 = (
            jnp.int32(0), c["n_finished"],
            jnp.zeros((K,), jnp.int32), jnp.zeros((K,), jnp.int32), jnp.zeros((K,), jnp.float32),
            c["finished_seqs"], c["finished_scores"], c["finished_len"],
        )
        (n_new, n_fin, sel_src, sel_tok, sel_score, fin_seqs, fin_scores, fin_len), _ = lax.scan(
            push, state0, jnp.arange(2 * K)
        )

        # reshuffle beam state along the selected source beams
        tokens = c["tokens"][sel_src].at[:, i].set(sel_tok)
        max_ts = jnp.where(
            sel_tok >= ts_begin,
            jnp.maximum(c["max_timestamp"][sel_src], sel_tok),
            c["max_timestamp"][sel_src],
        )
        cache_g = c["cache"]._replace(
            k=c["cache"].k[:, sel_src], v=c["cache"].v[:, sel_src]
        )
        logits_new, cache_new, _ = decode_step(
            params, sel_tok[:, None], cache_g, P + i, dims,
            pos_offset=pad_len, kv_valid_from=pad_len,
            allow_pallas=allow_pallas,
        )
        return dict(
            i=i + 1,
            last_logits=logits_new[:, -1].astype(jnp.float32),
            last_token=sel_tok,
            penult_token=c["last_token"][sel_src],
            max_timestamp=max_ts,
            tokens=tokens,
            sum_logprobs=sel_score,
            finished_seqs=fin_seqs,
            finished_scores=fin_scores,
            finished_len=fin_len,
            n_finished=n_fin,
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
        n_steps=out["i"],
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
        n_steps = int(out["n_steps"])
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
