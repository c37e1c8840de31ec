"""Dynamic-time-warping over attention cost matrices.

Replaces the ``dtw-python`` Cython core the reference calls at
``transcribe.py:1571-1581``. Two step patterns are supported:

  * ``symmetric1``: moves diagonal / left / up, unit weights — tie-break order
    diagonal, left, up (matching dtw-python's strict-improvement scan over
    pattern rows).
  * the reference's custom pattern (``subwords_can_be_empty=False``,
    ``transcribe.py:1571-1580``): diagonal / left only, so two tokens can
    never share a frame.

TPU-first shape: the DP is computed as a ``lax.scan`` over anti-diagonals
(wavefront parallelism — every cell of a diagonal is independent), emitting a
step-choice matrix; the O(N+M) backtrace runs on the host over one small
int8 copy. A same-semantics pure-numpy oracle backs the unit tests and serves
as a host fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# step codes in the choice matrix
DIAG, LEFT, UP = 0, 1, 2
_INF = np.float32(np.inf)


# ---------------------------------------------------------------------------
# numpy oracle (also the host fallback)
# ---------------------------------------------------------------------------


def dtw_path_numpy_wavefront(
    x: np.ndarray, allow_vertical: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized numpy anti-diagonal DP (same semantics as the scalar oracle,
    ~20x faster on host; the production host path until the Pallas kernel)."""
    x = np.asarray(x, np.float64)
    N, M = x.shape
    steps = np.zeros((N, M), np.int8)
    i_vec = np.arange(N)
    g1 = np.full(N, np.inf)
    g2 = np.full(N, np.inf)
    inf1 = np.array([np.inf])
    for d in range(N + M - 1):
        j_vec = d - i_vec
        valid = (j_vec >= 0) & (j_vec < M)
        lo = max(0, d - M + 1)
        hi = min(d, N - 1)
        x_d = np.full(N, np.inf)
        x_d[lo : hi + 1] = x[i_vec[lo : hi + 1], j_vec[lo : hi + 1]]

        g1_up = np.concatenate([inf1, g1[:-1]])
        g2_diag = np.concatenate([inf1, g2[:-1]])
        cand_diag = np.where((i_vec >= 1) & (j_vec >= 1), g2_diag, np.inf)
        cand_left = np.where(j_vec >= 1, g1, np.inf)
        cand_up = (
            np.where(i_vec >= 1, g1_up, np.inf) if allow_vertical else np.full(N, np.inf)
        )
        best = cand_diag
        code = np.zeros(N, np.int8)
        better = cand_left < best
        code[better] = LEFT
        best = np.minimum(best, cand_left)
        better = cand_up < best
        code[better] = UP
        best = np.minimum(best, cand_up)

        g_new = np.where((i_vec == 0) & (j_vec == 0), x_d, x_d + best)
        g_new[~valid] = np.inf
        steps[i_vec[lo : hi + 1], j_vec[lo : hi + 1]] = code[lo : hi + 1]
        g2, g1 = g1, g_new
    return _backtrace_dense(steps, N, M)


def dtw_path_numpy(x: np.ndarray, allow_vertical: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Full-matrix DP + backtrace. Returns (index1s, index2s) like dtw-python."""
    x = np.asarray(x, np.float64)
    N, M = x.shape
    g = np.full((N, M), np.inf)
    steps = np.zeros((N, M), np.int8)
    g[0, 0] = x[0, 0]
    for j in range(1, M):
        g[0, j] = g[0, j - 1] + x[0, j]
        steps[0, j] = LEFT
    if allow_vertical:
        for i in range(1, N):
            g[i, 0] = g[i - 1, 0] + x[i, 0]
            steps[i, 0] = UP
    for i in range(1, N):
        row_prev = g[i - 1]
        row = g[i]
        for j in range(1, M):
            best = row_prev[j - 1]
            code = DIAG
            if row[j - 1] < best:
                best = row[j - 1]
                code = LEFT
            if allow_vertical and row_prev[j] < best:
                best = row_prev[j]
                code = UP
            row[j] = x[i, j] + best
            steps[i, j] = code
    return _backtrace_dense(steps, N, M)


def _backtrace_dense(steps: np.ndarray, N: int, M: int):
    i, j = N - 1, M - 1
    path = [(i, j)]
    while i > 0 or j > 0:
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            s = steps[i, j]
            if s == DIAG:
                i, j = i - 1, j - 1
            elif s == LEFT:
                j -= 1
            else:
                i -= 1
        path.append((i, j))
    path.reverse()
    arr = np.array(path, np.int64)
    return arr[:, 0], arr[:, 1]


# ---------------------------------------------------------------------------
# jnp wavefront kernel
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("allow_vertical",))
def dtw_cost_jnp(x: jnp.ndarray, allow_vertical: bool = True) -> jnp.ndarray:
    """Anti-diagonal wavefront DP. x: (N, M) cost. Returns the step-choice
    tensor in diagonal-major layout: (N+M-1, N) int8 where entry [d, i] is the
    step taken to arrive at cell (i, d-i)."""
    x = x.astype(jnp.float32)
    N, M = x.shape
    i_vec = jnp.arange(N)

    def scan_step(carry, d):
        g1, g2 = carry  # g_{d-1}, g_{d-2}, each (N,)
        j_vec = d - i_vec
        valid = (j_vec >= 0) & (j_vec < M)
        x_d = jnp.where(valid, x[i_vec, jnp.clip(j_vec, 0, M - 1)], _INF)

        g1_up = jnp.concatenate([jnp.full((1,), _INF), g1[:-1]])  # g_{d-1}[i-1]
        g2_diag = jnp.concatenate([jnp.full((1,), _INF), g2[:-1]])  # g_{d-2}[i-1]

        cand_diag = jnp.where((i_vec >= 1) & (j_vec >= 1), g2_diag, _INF)
        cand_left = jnp.where(j_vec >= 1, g1, _INF)
        if allow_vertical:
            cand_up = jnp.where(i_vec >= 1, g1_up, _INF)
        else:
            cand_up = jnp.full((N,), _INF)

        best = cand_diag
        code = jnp.full((N,), DIAG, jnp.int8)
        code = jnp.where(cand_left < best, LEFT, code)
        best = jnp.minimum(best, cand_left)
        code = jnp.where(cand_up < best, UP, code)
        best = jnp.minimum(best, cand_up)

        origin = (i_vec == 0) & (j_vec == 0)
        g_new = jnp.where(origin, x_d, x_d + best)
        g_new = jnp.where(valid, g_new, _INF)
        return (g_new, g1), code

    init = (jnp.full((N,), _INF), jnp.full((N,), _INF))
    _, codes = lax.scan(scan_step, init, jnp.arange(N + M - 1))
    return codes  # (N+M-1, N)


def dtw_path(x, allow_vertical: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """DTW alignment path of a cost matrix (device DP, host backtrace)."""
    x = jnp.asarray(x)
    N, M = x.shape
    codes = np.asarray(dtw_cost_jnp(x, allow_vertical))  # one device->host copy
    i, j = N - 1, M - 1
    path = [(i, j)]
    while i > 0 or j > 0:
        if i == 0:
            j -= 1
        elif j == 0:
            i -= 1
        else:
            s = codes[i + j, i]
            if s == DIAG:
                i, j = i - 1, j - 1
            elif s == LEFT:
                j -= 1
            else:
                i -= 1
        path.append((i, j))
    path.reverse()
    arr = np.array(path, np.int64)
    return arr[:, 0], arr[:, 1]
