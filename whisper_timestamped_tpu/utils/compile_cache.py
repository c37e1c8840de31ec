"""Persistent XLA compilation cache setup that actually takes effect.

On images whose ``sitecustomize`` imports jax at interpreter start (the TPU
tunnel backend registers itself that way), jax's env-var-backed config
options are frozen before any user script runs — ``os.environ.setdefault``
in the script is a silent no-op and every process recompiles from scratch
(~35 min for the large-v3 serving program). ``jax.config.update`` works at
any time, so scripts call this instead.
"""

import os


def enable_persistent_compile_cache(path: str = None, skip_on_cpu: bool = False) -> str:
    """Point jax at a persistent compilation cache directory and force cache
    writes.

    Two things the obvious env-var approach gets wrong here:

    * ``JAX_COMPILATION_CACHE_DIR`` set after ``import jax`` (including via
      ``os.environ.setdefault`` at the top of a script, when sitecustomize
      already imported jax) never reaches ``jax.config``.
    * The tunnel backend reports near-zero compile times (the real compile
      is remote/deferred and blocks at first execution), so at the default
      1 s min-compile-time threshold jax silently skips every cache write.

    With ``skip_on_cpu`` (the CLI sets it), CPU-only processes leave the
    cache alone: threshold-0 writes would grow ``~/.cache/jax_comp``
    unboundedly for workloads that gain nothing from it.

    Returns the cache directory in effect (None when skipped).
    """
    import jax

    if skip_on_cpu and jax.default_backend() == "cpu":
        return None

    path = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "jax_comp")
    )
    # honor an explicitly exported threshold (power users may re-raise it);
    # default to 0 because the tunnel's reported compile times are ~0 s
    min_secs = float(os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0"))
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_secs)
    _reset_cache_singleton()
    return path


def _reset_cache_singleton() -> None:
    """Drop jax's in-process cache object so the new directory takes effect.

    The persistent cache is a lazily created singleton pinned to whatever
    directory was configured at its FIRST use — after that,
    ``jax.config.update("jax_compilation_cache_dir", ...)`` changes the
    config but not the live cache, and writes keep going to the old dir."""
    try:
        from jax._src import compilation_cache

        compilation_cache.reset_cache()
    except Exception:  # private API; tolerate its absence in future jax
        pass
