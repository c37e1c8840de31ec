"""Fully on-device batched word alignment.

The host alignment path (alignment.py) fetches each window's alignment-head
attention — (max_new, K, 1500) per window, tens of MB per batch — across the
host↔device link before running median/softmax/DTW on CPU. On a remote-tunnel
TPU that transfer alone costs ~1 s per 12-window batch (measured ~27 MB/s).

This module keeps the whole pipeline on device:

    attention buffer (device, from decode_window_jit)
      → gather per-segment token rows            (XLA)
      → column slice to [start_token, +M_PAD)    (XLA, vmapped dynamic_slice)
      → fused cost kernel (median9→softmax→mean→L2→negate + weight edits)
                                                  (Pallas, grid over segments)
      → wavefront DTW step codes                  (Pallas, grid over segments)
      → path backtrace → per-token start frames   (XLA fori_loop, all segments
                                                   in lock-step)

and fetches only the (S, N_pad) int32 start-frame matrix — a few KB. The
start frames are exactly the ``jumps`` array ``perform_word_alignment``
derives from the DTW path (reference ``transcribe.py:1648-1654``), so the
host-side word assembly consumes them via ``precomputed_jumps``.

Gating: device alignment requires subwords_can_be_empty=True (symmetric1 step
pattern), medfilt_width=9, qk_scale=1, and no plotting — the reference's
defaults. Anything else falls back to the host path per segment.
``detect_disfluencies=True`` stays on the device path: the cost matrix the
kernel already computes is fetched alongside the jumps (``fetch_cost=True``)
and host-side peak detection (reference ``transcribe.py:1656-1736``) runs on
those rows — still K× less transfer than fetching the per-head attention.
"""

from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .audio import N_FRAMES
from .alignment import AlignmentPlan, plan_alignment
from .ops.pallas_kernels import (
    DIAG,
    LEFT,
    attention_to_cost_batched,
    dtw_codes_batched,
)

M_PAD = ((N_FRAMES // 2 + 127) // 128) * 128  # 1536: frame capacity per segment
# token bucket matches the cost kernel's row chunk (VMEM-bounded inner loop);
# 64/128/192/256 cover every segment (<= 226 tokens incl. both timestamps)
TOKEN_BUCKET = 64
# segment counts bucket GEOMETRICALLY (8, 16, 32, 64, ...): the count varies
# window to window, and every distinct padded shape is a separate compiled
# program — on a deferred-compile backend a fresh shape stalls the decode
# pipeline for seconds, so the shape set must be small and warm up fast
SEG_BUCKET_MIN = 8
MAX_K = 32  # VMEM budget: refuse device alignment for huge head selections


def default_device_alignment() -> bool:
    """Resolve ``device_alignment=None``: the WTT_DEVICE_ALIGN env var wins
    ("1"/"0"), otherwise ON whenever the default JAX backend is an
    accelerator. On TPU the host alignment path's per-window
    (max_new, K, 1500) attention fetch is the dominant cost (~27 MB/s over a
    remote tunnel), so the on-device aligner is the serving default; the
    caller still falls back to the host path automatically when the gating
    conditions (module docstring) do not hold."""
    import os

    env = os.environ.get("WTT_DEVICE_ALIGN")
    if env is not None:
        return env == "1"
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - backend probing never fatal
        return False


def _seg_bucket(S: int) -> int:
    b = SEG_BUCKET_MIN
    while b < S:
        b *= 2
    return b


class SegmentAlignTask(NamedTuple):
    """One segment's device-alignment request."""

    plan: AlignmentPlan
    flat_rows: np.ndarray  # row index into the flattened attention buffer,
    #                        one per planned token (len == len(plan.tokens))
    max_duration: Optional[int]  # absolute column cap (segment_frames // 2)


def _backtrace_batch(codes: jnp.ndarray, n: jnp.ndarray, m: jnp.ndarray) -> jnp.ndarray:
    """Walk the step codes backward from (n-1, m-1), all segments in lock-step.

    codes: (S, D, N) diagonal-major; returns starts (S, N) int32 where
    starts[s, i] = first frame of token row i on the optimal path (the host
    path's ``jumps[i]``). Rows >= n are untouched (zeros).
    """
    S, D, N = codes.shape
    rng = jnp.arange(S)

    def body(_, state):
        i, j, starts = state
        starts = starts.at[rng, i].set(j)  # backward walk: last write = min j
        c = codes[rng, i + j, i]
        at_origin = (i == 0) & (j == 0)
        # host backtrace rules (dtw_path_pallas / ops.dtw): at i==0 step left,
        # at j==0 step up, else follow the code
        diag = c == DIAG
        left = c == LEFT
        ni = jnp.where(i == 0, 0, jnp.where(j == 0, i - 1, jnp.where(left, i, i - 1)))
        nj = jnp.where(i == 0, j - 1, jnp.where(j == 0, j, jnp.where(left | diag, j - 1, j)))
        ni = jnp.where(at_origin, 0, ni)
        nj = jnp.maximum(jnp.where(at_origin, 0, nj), 0)
        return ni, nj, starts

    starts0 = jnp.zeros((S, N), jnp.int32)
    _, _, starts = lax.fori_loop(0, D, body, (n - 1, m - 1, starts0))
    return starts


@functools.partial(jax.jit, static_argnames=("n_pad", "return_cost", "interpret"))
def _align_jumps_jit(
    attn_flat: jnp.ndarray,  # (R_total, K, T) attention rows (any float dtype)
    rows: jnp.ndarray,  # (S, n_pad) int32 row gather indices
    dims: jnp.ndarray,  # (S, 4) int32: (n_tokens, span, maxdur_col, start_token)
    *,
    n_pad: int,
    return_cost: bool = False,
    interpret=None,
):
    S = rows.shape[0]
    start = dims[:, 3]
    g = attn_flat[rows]  # (S, n_pad, K, T)
    g = jnp.transpose(g, (0, 2, 1, 3))  # (S, K, n_pad, T)
    # column window [start, start + M_PAD): start+span <= N_FRAMES//2 <= T
    gp = jnp.pad(g, ((0, 0), (0, 0), (0, 0), (0, M_PAD)))
    sliced = jax.vmap(
        lambda x, st: lax.dynamic_slice_in_dim(x, st, M_PAD, axis=-1)
    )(gp, start)
    cost = attention_to_cost_batched(sliced, dims, interpret=interpret)
    codes = dtw_codes_batched(cost, dims, interpret=interpret)
    starts = _backtrace_batch(codes, dims[:, 0], dims[:, 1])
    return (starts, cost) if return_cost else starts


def make_task(
    tokens: Sequence[int],
    row_offset: int,
    local_rows: Sequence[int],
    tokenizer,
    *,
    refine_whisper_precision_nframes: int = 0,
    unfinished_decoding: bool = False,
    max_duration: Optional[int] = None,
) -> Optional[SegmentAlignTask]:
    """Plan one segment. ``local_rows[k]`` is the attention row (within the
    window's buffer) feeding token k; ``row_offset`` positions the window's
    rows inside the flattened buffer. Returns None when the plan is empty."""
    plan = plan_alignment(
        tokens, tokenizer, refine_whisper_precision_nframes, unfinished_decoding
    )
    if plan.empty:
        return None
    local = np.asarray(local_rows, np.int64)
    flat = row_offset + local[plan.row_indices]
    return SegmentAlignTask(plan=plan, flat_rows=flat, max_duration=max_duration)


def compute_jumps_batch(
    attn_flat,  # (R_total, K, T) device array (or numpy for tests)
    tasks: List[SegmentAlignTask],
    interpret=None,
    fetch: bool = True,
    fetch_cost: bool = False,
):
    """Run the on-device aligner for a batch of segments. Returns, per task,
    the (n_tokens+1,) int64 jumps array for ``precomputed_jumps`` — or, with
    ``fetch_cost=True``, a (jumps, cost) pair where cost is the segment's
    (n_tokens, span) f32 DTW cost matrix (median→softmax→mean→L2→negate with
    the weight edits applied), the rows host-side disfluency peak detection
    consumes as ``precomputed_cost``.

    ``fetch=False`` dispatches the aligner and starts an async device→host
    copy, returning a zero-arg resolver for the same list — the caller
    collects results later so the (KB-scale) transfer rides behind other
    device work instead of blocking here."""
    if not tasks:
        return [] if fetch else (lambda: [])
    if not isinstance(attn_flat, jnp.ndarray):
        attn_flat = jnp.asarray(np.asarray(attn_flat))
    S = len(tasks)
    n_max = max(len(t.plan.tokens) for t in tasks)
    n_pad = int(np.ceil(max(n_max, TOKEN_BUCKET) / TOKEN_BUCKET) * TOKEN_BUCKET)
    S_pad = _seg_bucket(S)

    rows = np.zeros((S_pad, n_pad), np.int32)
    dims = np.zeros((S_pad, 4), np.int32)
    dims[:, 0] = 2  # dummy segments: 2 tokens, 2 frames
    dims[:, 1] = 2
    dims[:, 2] = M_PAD
    for s, t in enumerate(tasks):
        n = len(t.plan.tokens)
        span = t.plan.end_token - t.plan.start_token
        rows[s, :n] = t.flat_rows
        maxdur = M_PAD  # sentinel: no masking
        if t.max_duration and t.plan.start_token < t.max_duration:
            maxdur = min(t.max_duration, M_PAD)
        dims[s] = (n, span, maxdur, t.plan.start_token)

    res = _align_jumps_jit(
        attn_flat,
        jnp.asarray(rows),
        jnp.asarray(dims),
        n_pad=n_pad,
        return_cost=fetch_cost,
        interpret=interpret,
    )
    starts_dev, cost_dev = res if fetch_cost else (res, None)
    for arr in (starts_dev, cost_dev):
        copy_async = getattr(arr, "copy_to_host_async", None)
        if copy_async is not None:
            copy_async()

    def resolve() -> List:
        starts = np.asarray(starts_dev)
        cost = np.asarray(cost_dev) if fetch_cost else None
        out = []
        for s, t in enumerate(tasks):
            n = len(t.plan.tokens)
            span = t.plan.end_token - t.plan.start_token
            jumps = np.concatenate([starts[s, :n], [span - 1]]).astype(np.int64)
            out.append((jumps, cost[s, :n, :span]) if fetch_cost else jumps)
        return out

    return resolve() if fetch else resolve
