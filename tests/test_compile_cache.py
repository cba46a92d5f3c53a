"""Persistent XLA compilation cache plumbing (skips the 5-15 min
remote cold compile on restarts/bench reruns — see PERF.md)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from mca_tpu.utils.compile_cache import enable_compile_cache


def test_enable_compile_cache_populates(tmp_path, monkeypatch):
    cache = str(tmp_path / "xla")
    monkeypatch.setenv("MCA_COMPILE_CACHE", cache)
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        assert enable_compile_cache() == cache
        # zero the thresholds so a tiny test graph qualifies
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0
        )
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(64, 64)), jnp.float32
        )
        float(jax.jit(lambda a: jnp.tanh(a @ a).sum())(x))
        assert os.listdir(cache), "persistent cache did not populate"
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old_min
        )


def test_disable_via_env(monkeypatch):
    monkeypatch.setenv("MCA_COMPILE_CACHE", "0")
    assert enable_compile_cache() is None
