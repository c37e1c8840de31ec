"""Device-resident window-advance state for the batched pipeline fast path.

The batched loop's per-iteration serial chain is: decode window N → fetch
tokens → host computes the seek advance + next prompt → dispatch window N+1.
On a remote-tunnel TPU the fetch + host turnaround costs ~1-2 s per iteration
with the device idle (measured: region-232 iterations ~4.95 s in-pipeline vs
~2.95 s execution in isolation).

This module keeps everything the NEXT dispatch depends on — per-stream seek,
done mask, and the rolling token history that feeds
``condition_on_previous_text`` prompts — in jitted device state:

    decode(N)  ──▶  advance_window_state (seek', hist', done')   [device]
                        │
    build_prompt_batch(hist') + mel gather  ──▶  decode(N+1)     [device]

so iteration N+1 is dispatched before iteration N's outputs ever reach the
host. The host drains token/logprob outputs one iteration behind (their
transfers and the segment bookkeeping overlap the next window's execution)
and only blocks on the tiny per-iteration done mask.

The state-update rules replicate the host path bit-for-bit (asserted by
tests/test_deviceflow.py against ``extract_window_segments`` and
``DecodeEngine.build_prompt``):

* seek advance = whisper's transcribe-loop rule (consecutive-timestamp
  slicing; reference behavior at ``openai-whisper`` via
  ``/root/reference/whisper_timestamped/transcribe.py:568-707``'s segment
  flushing): full ``segment_size`` advance unless the window ends with an
  incomplete segment after a consecutive-timestamp pair, in which case seek
  moves to the last paired timestamp.
* history = the concatenation of the tokens of every COMPLETED segment
  (``engine.extract_window_segments``), kept to the last
  ``n_text_ctx // 2 - 1`` tokens — exactly the truncation
  ``DecodeEngine.build_prompt`` applies (reference ``transcribe.py:201-204``).
* prompt buffer = right-aligned ``[sot_prev, history..., sot, lang, task]``
  with per-row valid lengths, matching ``build_prompt(region=PROMPT_REGION)``.

The fast path only engages for configurations where the host makes no
data-dependent decisions between windows (see
``BatchTranscriber._device_flow_ok``): greedy decoding at temperature 0 with
a single-element temperature schedule (no fallback re-decodes). The
no-speech window skip is NOT such a decision: with thresholds set,
``advance_window_state`` computes the skip on device from the same
no_speech_prob/sum_logprobs buffers, identically to the host rule.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..audio import N_FRAMES
from ..engine import INPUT_STRIDE


class WindowState(NamedTuple):
    """Per-stream device state between window iterations (all (B,) / (B, H))."""

    seek: jnp.ndarray  # int32 mel-frame cursor per stream
    done: jnp.ndarray  # bool: seek >= content_frames
    hist: jnp.ndarray  # int32 (B, H) rolling prompt history, right-aligned
    count: jnp.ndarray  # int32 valid entries in hist (<= H)


@partial(
    jax.jit,
    static_argnames=("eot", "ts_begin", "no_speech_threshold", "logprob_threshold"),
)
def advance_window_state(
    tokens: jnp.ndarray,  # (B, M) int32 decode output (eot-padded)
    state: WindowState,
    content_frames: jnp.ndarray,  # (B,) int32
    *,
    eot: int,
    ts_begin: int,
    no_speech_prob: jnp.ndarray = None,  # (B,) f32 (required with a threshold)
    sum_logprobs: jnp.ndarray = None,  # (B,) f32 (required with a threshold)
    no_speech_threshold: float = None,
    logprob_threshold: float = None,
) -> WindowState:
    """One window's seek/history update, all rows at once (device).

    Mirrors ``engine.extract_window_segments``'s seek rule and its
    ``all_tokens.extend(seg.tokens)`` history accumulation: completed
    segments' tokens enter the history; the unconsumed tail after the last
    consecutive-timestamp pair does not. With ``no_speech_threshold`` set,
    the no-speech window skip (full-window advance, nothing enters the
    history — ``extract_window_segments``'s skip branch) is ALSO computed
    here, so the quality thresholds no longer force the host loop.
    """
    B, M = tokens.shape
    idx = jnp.arange(M, dtype=jnp.int32)

    is_eot = tokens == eot
    has_eot = jnp.any(is_eot, axis=1)
    n_text = jnp.where(has_eot, jnp.argmax(is_eot, axis=1).astype(jnp.int32), M)

    valid = idx[None, :] < n_text[:, None]
    is_ts = (tokens >= ts_begin) & valid
    # consec[i] == True at the SECOND token of a consecutive-timestamp pair
    consec = is_ts & jnp.pad(is_ts[:, :-1], ((0, 0), (1, 0)))
    has_consec = jnp.any(consec, axis=1)
    last_consec = jnp.max(jnp.where(consec, idx[None, :], -1), axis=1)

    def at(mask_or_vals, pos):
        return jnp.take_along_axis(
            mask_or_vals, jnp.maximum(pos, 0)[:, None], axis=1
        )[:, 0]

    single_ending = (n_text >= 2) & at(is_ts, n_text - 1) & ~at(is_ts, n_text - 2)

    segment_size = jnp.minimum(N_FRAMES, content_frames - state.seek)
    partial_adv = has_consec & ~single_ending
    # tokens consumed into the prompt history (completed segments only)
    consumed = jnp.where(partial_adv, last_consec, n_text)
    last_ts_pos = at(tokens, last_consec - 1) - ts_begin
    advance = jnp.where(partial_adv, last_ts_pos * INPUT_STRIDE, segment_size)

    if no_speech_threshold is not None:
        # whisper's skip rule (extract_window_segments:881-886): silence
        # advances a full window and contributes nothing to the prompt
        skip = no_speech_prob > no_speech_threshold
        if logprob_threshold is not None:
            avg_lp = sum_logprobs / (n_text + 1).astype(jnp.float32)
            skip = skip & ~(avg_lp > logprob_threshold)
        advance = jnp.where(skip, segment_size, advance)
        consumed = jnp.where(skip, 0, consumed)

    new_seek = jnp.where(state.done, state.seek, state.seek + advance)
    consumed = jnp.where(state.done, 0, consumed)
    done = new_seek >= content_frames

    # slide the right-aligned history window left by `consumed`
    H = state.hist.shape[1]
    combined = jnp.concatenate([state.hist, tokens], axis=1)
    new_hist = jax.vmap(
        lambda row, e: lax.dynamic_slice(row, (e,), (H,))
    )(combined, consumed)
    new_count = jnp.minimum(state.count + consumed, H)
    return WindowState(seek=new_seek, done=done, hist=new_hist, count=new_count)


@partial(jax.jit, static_argnames=("region", "eot", "sot_prev"))
def build_prompt_batch(
    hist: jnp.ndarray,  # (B, H) right-aligned history
    count: jnp.ndarray,  # (B,)
    sot_seq: jnp.ndarray,  # (B, S) int32: [sot, lang, task] (or [sot])
    *,
    region: int,
    eot: int,
    sot_prev: int,
):
    """Device counterpart of ``DecodeEngine.build_prompt`` for the uniform
    full-region batched case: right-aligned
    ``[pad..., sot_prev?, history, sot_seq]`` plus per-row valid lengths.
    Junk slots are eot (always a valid embedding id; the decode program masks
    them via ``prompt_len``)."""
    B, H = hist.shape
    S = sot_seq.shape[1]
    c = jnp.minimum(count, H)
    # one extra slot on the left for sot_prev, placed at index H - c
    ext = jnp.concatenate([jnp.full((B, 1), eot, jnp.int32), hist], axis=1)
    pos = jnp.arange(H + 1, dtype=jnp.int32)[None, :]
    ext = jnp.where((pos == (H - c)[:, None]) & (c > 0)[:, None], sot_prev, ext)
    pad_cols = region - (H + 1) - S
    assert pad_cols >= 0, (region, H, S)
    buf = jnp.concatenate(
        [jnp.full((B, pad_cols), eot, jnp.int32), ext, sot_seq], axis=1
    )
    plen = jnp.where(c > 0, c + 1 + S, S).astype(jnp.int32)
    return buf, plen


@jax.jit
def pack_host_outputs(
    tokens: jnp.ndarray,  # (B, M) int32 decode output
    token_logprobs: jnp.ndarray,  # (B, M) float32
    sum_logprobs: jnp.ndarray,  # (B,) float32
    no_speech_prob: jnp.ndarray,  # (B,) float32
    state: WindowState,
) -> jnp.ndarray:
    """Concatenate every per-window host-bound output into ONE (B, 2M+4)
    float32 buffer: ``[tokens(bitcast) | logprobs | sum | nsp | done | seek]``.

    On a remote-tunnel TPU each host read is a round trip, and reads issued
    while a decode is in flight block until it completes — so the whole
    per-iteration host drain must fit in the idle gap between window N
    landing and window N+1 dispatching. Packing makes that gap exactly one
    blocking read (int32 lanes ride along bitcast; the host views them back).
    """
    tok_f = jax.lax.bitcast_convert_type(tokens, jnp.float32)
    seek_f = jax.lax.bitcast_convert_type(state.seek, jnp.float32)[:, None]
    return jnp.concatenate(
        [
            tok_f,
            token_logprobs.astype(jnp.float32),
            sum_logprobs.astype(jnp.float32)[:, None],
            no_speech_prob.astype(jnp.float32)[:, None],
            state.done.astype(jnp.float32)[:, None],
            seek_f,
        ],
        axis=1,
    )


def split_host_outputs(packed: np.ndarray, M: int):
    """Host-side inverse of ``pack_host_outputs`` (on the fetched np array).

    Returns (tokens, token_logprobs, sum_logprobs, no_speech_prob, done, seek).
    """
    p = np.asarray(packed, np.float32)
    tokens = p[:, :M].view(np.int32)
    logprobs = p[:, M : 2 * M]
    sums = p[:, 2 * M]
    nsp = p[:, 2 * M + 1]
    done = p[:, 2 * M + 2] != 0.0
    seek = p[:, 2 * M + 3 : 2 * M + 4].view(np.int32)[:, 0]
    return tokens, logprobs, sums, nsp, done, seek


def initial_state(
    streams_tokens,  # per-stream host token history (list of list[int])
    seeks,  # per-stream host seek (list[int])
    content_frames,  # list[int]
    batch_size: int,
    hist_len: int,
    eot: int,
    place=None,
) -> WindowState:
    """Upload host-side per-stream state into a WindowState (used to enter
    the device flow after the host-path first iteration)."""
    B = batch_size
    hist = np.full((B, hist_len), eot, np.int32)
    count = np.zeros((B,), np.int32)
    seek = np.zeros((B,), np.int32)
    frames = np.zeros((B,), np.int32)
    for i, toks in enumerate(streams_tokens):
        tail = list(toks)[-hist_len:]
        if tail:
            hist[i, hist_len - len(tail):] = tail
        count[i] = min(len(toks), hist_len)
        seek[i] = seeks[i]
        frames[i] = content_frames[i]
    done = seek >= frames
    arrs = (jnp.asarray(seek), jnp.asarray(done), jnp.asarray(hist), jnp.asarray(count))
    if place is not None:
        arrs = place(arrs)
    return WindowState(*arrs), (jnp.asarray(frames) if place is None else place(jnp.asarray(frames)))
