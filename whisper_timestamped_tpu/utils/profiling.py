"""Tracing & per-stage timing.

The reference has no profiling at all (survey §5: only a step counter at
``transcribe.py:416``). Here: lightweight accumulating stage timers used by
the engine/API (read them with ``get_stage_timings()``), plus a context
manager around ``jax.profiler`` for full TPU traces viewable in TensorBoard/
Perfetto.
"""

from __future__ import annotations

import collections
import contextlib
import logging
import time
from typing import Dict

logger = logging.getLogger("whisper_timestamped_tpu")

_timings: Dict[str, float] = collections.defaultdict(float)
_counts: Dict[str, int] = collections.defaultdict(int)


@contextlib.contextmanager
def stage_timer(name: str):
    """Accumulate wall time under ``name`` (e.g. 'mel', 'decode', 'align')."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _timings[name] += dt
        _counts[name] += 1
        logger.debug("stage %s: %.1f ms", name, dt * 1000)


def get_stage_timings() -> Dict[str, dict]:
    return {
        k: {"total_s": _timings[k], "count": _counts[k], "mean_ms": 1000 * _timings[k] / max(_counts[k], 1)}
        for k in _timings
    }


def reset_stage_timings() -> None:
    _timings.clear()
    _counts.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace to ``log_dir``."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
