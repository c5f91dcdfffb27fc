"""Per-row ring-column write strategies (ops/ring_scatter.py).

Batched speculation writes verify blocks at per-row cache positions;
the three strategies (XLA scatter / per-row DUS / Pallas DMA) must be
bit-identical — the choice is pure perf policy (CW_RING_SCATTER),
measured on-chip by experiments/ring_scatter_designs.py.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.models import (decode_step, decode_step_multi,
                                       encode, init_cache, init_params)
from crisperwhisper_tpu.ops.ring_scatter import write_block_columns_group
from helpers import rand_mel, tiny_arch

MODES = ("scatter", "dus", "dma")


@pytest.mark.parametrize("s", [1, 3])
def test_ring_scatter_modes_bit_identical(s):
    """All strategies write the same bytes (int8 ring + f32 scales,
    grouped call, random per-row offsets)."""
    rng = np.random.default_rng(0)
    L, B, h, dh, T = 3, 5, 2, 4, 16
    ring_k = jnp.asarray(rng.integers(-127, 127, (L, B, h, dh, T)),
                         jnp.int8)
    ring_s = jnp.asarray(rng.standard_normal((L, B, h, T)), jnp.float32)
    blk_k = jnp.asarray(rng.integers(-127, 127, (B, h, dh, s)), jnp.int8)
    blk_s = jnp.asarray(rng.standard_normal((B, h, s)), jnp.float32)
    pos = jnp.asarray(rng.integers(0, T - s, (B,)), jnp.int32)
    li = jnp.int32(1)

    outs = {}
    for mode in MODES:
        rk, rs_ = write_block_columns_group(
            [(ring_k, blk_k), (ring_s, blk_s)], li, pos, mode=mode)
        outs[mode] = (np.asarray(rk), np.asarray(rs_))

    # manual reference
    ref = np.array(ring_k)
    for b in range(B):
        p = int(pos[b])
        ref[1, b, :, :, p:p + s] = np.asarray(blk_k[b])
    np.testing.assert_array_equal(outs["scatter"][0], ref)
    for mode in ("dus", "dma"):
        for a, b_ in zip(outs["scatter"], outs[mode]):
            np.testing.assert_array_equal(a, b_)


@pytest.mark.parametrize("mode", MODES)
def test_decode_step_multi_vector_pos_same_under_mode(mode, monkeypatch):
    """decode_step_multi with per-row positions (the batched-speculation
    verify pass) produces bitwise-identical logits and cache under every
    write strategy."""
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    enc = encode(params, arch, jnp.asarray(rand_mel(batch=3, seed=2)))
    cache = init_cache(params, arch, enc, cross_dtype=jnp.int8,
                       self_dtype=jnp.int8, cache_len=24)
    rng = np.random.default_rng(1)
    block = jnp.asarray(rng.integers(2, 40, (3, 4)), jnp.int32)
    positions = jnp.asarray([5, 2, 4], jnp.int32)
    toks = jnp.asarray([11, 12, 13], jnp.int32)

    def run():
        logits, new_cache, _ = decode_step_multi(params, arch, block,
                                                 positions, cache)
        # single-token per-row writes too (the draft-chain shape)
        logits1, cache1, _ = decode_step(params, arch, toks, positions,
                                         cache)
        return (np.asarray(logits), np.asarray(new_cache.self_k),
                np.asarray(new_cache.self_k_scale, np.float32),
                np.asarray(logits1), np.asarray(cache1.self_v))

    monkeypatch.setenv("CW_RING_SCATTER", "scatter")
    ref = run()
    monkeypatch.setenv("CW_RING_SCATTER", mode)
    got = run()
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)
