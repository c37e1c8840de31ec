"""Persistent XLA compilation cache setup that actually takes effect.

On images whose ``sitecustomize`` imports jax at interpreter start (the TPU
tunnel backend registers itself that way), jax's env-var-backed config
options are frozen before any user script runs — ``os.environ.setdefault``
in the script is a silent no-op and every process recompiles from scratch
(~35 min for the large-v3 serving program). ``jax.config.update`` works at
any time, so scripts call this instead.
"""

import os


def enable_persistent_compile_cache(path: str = None) -> str:
    """Point jax at a persistent compilation cache directory and force cache
    writes.

    Two things the obvious env-var approach gets wrong here:

    * ``JAX_COMPILATION_CACHE_DIR`` set after ``import jax`` (including via
      ``os.environ.setdefault`` at the top of a script, when sitecustomize
      already imported jax) never reaches ``jax.config``.
    * The tunnel backend reports near-zero compile times (the real compile
      is remote/deferred and blocks at first execution), so at the default
      1 s min-compile-time threshold jax silently skips every cache write.

    Returns the cache directory in effect.
    """
    import jax

    path = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.join(os.path.expanduser("~"), ".cache", "jax_comp")
    )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return path
