"""The persistent-compile-cache helper must produce cache entries when
enabled mid-process (the env-var route is frozen once jax is imported —
see utils/compile_cache.py). Guards the fix against jax config renames."""

import os

import jax
import jax.numpy as jnp

from whisper_timestamped_tpu.utils import enable_persistent_compile_cache


def test_cache_entries_written(tmp_path):
    cache_dir = str(tmp_path / "jax_cache")
    assert enable_persistent_compile_cache(cache_dir) == cache_dir

    @jax.jit
    def f(x):
        return (x @ (x + 1.0)).sum()

    f(jnp.ones((64, 64))).block_until_ready()
    entries = os.listdir(cache_dir)
    assert entries, "no compilation cache entries written"
    # restore: other tests in this process shouldn't keep writing entries
    jax.config.update("jax_compilation_cache_dir", None)


def test_env_fallback_order(tmp_path, monkeypatch):
    explicit = str(tmp_path / "explicit")
    env_dir = str(tmp_path / "from_env")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", env_dir)
    assert enable_persistent_compile_cache(explicit) == explicit
    assert enable_persistent_compile_cache() == env_dir
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
    assert enable_persistent_compile_cache().endswith(
        os.path.join(".cache", "jax_comp")
    )
    jax.config.update("jax_compilation_cache_dir", None)
