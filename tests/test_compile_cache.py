"""The persistent-compile-cache helper must produce cache entries when
enabled mid-process (the env-var route is frozen once jax is imported —
see utils/compile_cache.py). Guards the fix against jax config renames."""

import os

import jax
import jax.numpy as jnp
import pytest

from whisper_timestamped_tpu.utils import enable_persistent_compile_cache


@pytest.fixture
def restore_cache_config():
    """Whatever a test does to the global jax cache config, undo it —
    otherwise a mid-test failure leaves the whole in-process session writing
    cache entries into a deleted tmp_path."""
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        yield
    finally:
        from whisper_timestamped_tpu.utils.compile_cache import _reset_cache_singleton

        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
        _reset_cache_singleton()


def test_cache_entries_written(tmp_path, restore_cache_config):
    cache_dir = str(tmp_path / "jax_cache")
    assert enable_persistent_compile_cache(cache_dir) == cache_dir

    @jax.jit
    def f(x):
        return (x @ (x + 1.0)).sum()

    f(jnp.ones((64, 64))).block_until_ready()
    entries = os.listdir(cache_dir)
    assert entries, "no compilation cache entries written"


def test_env_fallback_order(tmp_path, monkeypatch, restore_cache_config):
    explicit = str(tmp_path / "explicit")
    env_dir = str(tmp_path / "from_env")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", env_dir)
    assert enable_persistent_compile_cache(explicit) == explicit
    assert enable_persistent_compile_cache() == env_dir
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
    assert enable_persistent_compile_cache().endswith(
        os.path.join(".cache", "jax_comp")
    )


def test_min_compile_time_env_honored(tmp_path, monkeypatch, restore_cache_config):
    monkeypatch.setenv("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2.5")
    enable_persistent_compile_cache(str(tmp_path / "c"))
    assert jax.config.jax_persistent_cache_min_compile_time_secs == 2.5
