"""Median filter along the last axis (attention smoothing).

Replaces ``scipy.ndimage.median_filter(x, (1, 1, w))`` as used by the
reference's aligner (``transcribe.py:29,1546``): reflect-mode edges, odd
window. Implemented as a static gather + ``jnp.median`` over the window axis —
jittable and batched, runs on-device next to the attention it smooths.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("width",))
def median_filter_last_axis(x: jnp.ndarray, width: int = 9) -> jnp.ndarray:
    """Median filter with window ``width`` (odd) along the last axis.

    Edge handling matches scipy's default mode='reflect' (aka numpy
    'symmetric': the edge sample participates in its own reflection).
    """
    assert width % 2 == 1, "median filter width must be odd"
    half = width // 2
    T = x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
    xp = jnp.pad(x, pad, mode="symmetric")
    idx = np.arange(T)[:, None] + np.arange(width)[None, :]  # (T, width)
    windows = xp[..., idx]  # (..., T, width)
    return jnp.median(windows, axis=-1)


def median_filter_numpy(x: np.ndarray, width: int = 9) -> np.ndarray:
    """Host version (no compile): same semantics, via sliding_window_view."""
    assert width % 2 == 1
    half = width // 2
    pad = [(0, 0)] * (x.ndim - 1) + [(half, half)]
    xp = np.pad(x, pad, mode="symmetric")
    windows = np.lib.stride_tricks.sliding_window_view(xp, width, axis=-1)
    return np.median(windows, axis=-1)
