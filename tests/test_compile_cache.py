"""Persistent XLA compilation cache plumbing (VERDICT r3 item 6)."""

import os
import time

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.utils import compile_cache


def test_persistent_cache_populates_and_replays(tmp_path, monkeypatch):
    d = str(tmp_path / "xla")
    monkeypatch.delenv("CW_COMPILE_CACHE", raising=False)
    monkeypatch.setattr(compile_cache, "_ENABLED_DIR", None)
    assert compile_cache.enable_persistent_cache(d) == d
    # idempotent re-enable
    assert compile_cache.enable_persistent_cache(d) == d

    @jax.jit
    def f(x):
        return jnp.tanh(x) @ x.T

    def n_f_entries():
        return sum(e.startswith("jit_f") for e in os.listdir(d))

    f(jnp.ones((128, 128))).block_until_ready()

    def wait_for_entry():
        # cache writes may complete asynchronously relative to dispatch
        for _ in range(50):
            if n_f_entries():
                return True
            time.sleep(0.1)
        return False

    assert wait_for_entry(), "compiled executable was not persisted"

    # a fresh in-process compile of the SAME program must replay from
    # the disk cache, not add a second entry for the same key (helper
    # jits like broadcast_in_dim can straggle — count only jit_f)
    jax.clear_caches()
    f(jnp.ones((128, 128))).block_until_ready()
    time.sleep(0.5)
    assert n_f_entries() == 1, "re-compile added a new entry"


def test_persistent_cache_env_disable(monkeypatch):
    monkeypatch.setenv("CW_COMPILE_CACHE", "0")
    monkeypatch.setattr(compile_cache, "_ENABLED_DIR", None)
    assert compile_cache.enable_persistent_cache() is None
