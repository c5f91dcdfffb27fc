"""Per-row position support in decode_step / decode_step_multi.

A position VECTOR [B] (each row at its own ring offset — the batched
assisted-decoding primitive) must behave exactly like running every row
separately with its scalar position: same logits, same alignment rows,
same cache columns written at each row's own slots.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.models import (alignment_selector, decode_step,
                                       decode_step_multi, encode, init_cache,
                                       init_params)
from helpers import TINY_SPECIALS, rand_mel, tiny_arch

B = 3
RING = 24


def _setup(self_dtype):
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    enc = encode(params, arch, jnp.asarray(rand_mel(batch=B, seed=2)))
    sel = jnp.asarray(alignment_selector(arch, ((0, 0), (1, 1))))
    cache = init_cache(params, arch, enc, cross_dtype=jnp.int8,
                       self_dtype=self_dtype, cache_len=RING)
    return arch, params, enc, sel, cache


def _row_cache(cache, r):
    return jax.tree.map(
        lambda x: None if x is None else x[:, r:r + 1], cache)


def _prefill(params, arch, cache, n, seed=7):
    """Write n real columns at positions [0, n) for every row."""
    rng = np.random.default_rng(seed)
    for i in range(n):
        toks = jnp.asarray(rng.integers(2, 40, (B,)), jnp.int32)
        _, cache, _ = decode_step(params, arch, toks, jnp.int32(i), cache)
    return cache


@pytest.mark.parametrize("self_dtype", [None, jnp.int8])
def test_decode_step_vector_positions_match_per_row(self_dtype):
    arch, params, enc, sel, cache = _setup(self_dtype)
    cache = _prefill(params, arch, cache, 6)
    positions = np.array([6, 3, 5], np.int32)     # per-row offsets
    toks = jnp.asarray([11, 12, 13], jnp.int32)

    logits_v, cache_v, align_v = decode_step(
        params, arch, toks, jnp.asarray(positions), cache, align_sel=sel)

    for r in range(B):
        lr, cr, ar = decode_step(
            params, arch, toks[r:r + 1], jnp.int32(positions[r]),
            _row_cache(cache, r), align_sel=sel)
        np.testing.assert_allclose(np.asarray(logits_v[r]),
                                   np.asarray(lr[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(align_v[r]),
                                   np.asarray(ar[0]), atol=1e-6)
        # the row's written column matches the per-row run (tolerances:
        # B=3 vs B=1 programs fuse differently -> f32 rounding; int8
        # quantization can flip a tie by one code)
        np.testing.assert_allclose(
            np.asarray(cache_v.self_k[:, r, :, :, positions[r]],
                       np.float32),
            np.asarray(cr.self_k[:, 0, :, :, positions[r]], np.float32),
            atol=1.0 if self_dtype is not None else 1e-5, rtol=1e-3)
        if self_dtype is not None:
            np.testing.assert_allclose(
                np.asarray(cache_v.self_k_scale[:, r, :, positions[r]],
                           np.float32),
                np.asarray(cr.self_k_scale[:, 0, :, positions[r]],
                           np.float32), rtol=1e-2)


@pytest.mark.parametrize("self_dtype", [None, jnp.int8])
def test_decode_step_multi_vector_positions_match_per_row(self_dtype):
    arch, params, enc, sel, cache = _setup(self_dtype)
    cache = _prefill(params, arch, cache, 5)
    s = 4
    positions = np.array([5, 2, 4], np.int32)
    rng = np.random.default_rng(1)
    block = jnp.asarray(rng.integers(2, 40, (B, s)), jnp.int32)

    logits_v, cache_v, align_v = decode_step_multi(
        params, arch, block, jnp.asarray(positions), cache, align_sel=sel)

    for r in range(B):
        lr, cr, ar = decode_step_multi(
            params, arch, block[r:r + 1], jnp.int32(positions[r]),
            _row_cache(cache, r), align_sel=sel)
        np.testing.assert_allclose(np.asarray(logits_v[r]),
                                   np.asarray(lr[0]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(align_v[r]),
                                   np.asarray(ar[0]), atol=1e-6)
        for i in range(s):
            np.testing.assert_allclose(
                np.asarray(cache_v.self_v[:, r, :, :, positions[r] + i],
                           np.float32),
                np.asarray(cr.self_v[:, 0, :, :, positions[r] + i],
                           np.float32),
                atol=1.0 if self_dtype is not None else 1e-5, rtol=1e-3)


def test_vector_position_all_equal_matches_scalar():
    arch, params, enc, sel, cache = _setup(jnp.int8)
    cache = _prefill(params, arch, cache, 4)
    toks = jnp.asarray([5, 6, 7], jnp.int32)
    l_s, c_s, a_s = decode_step(params, arch, toks, jnp.int32(4), cache,
                                align_sel=sel)
    l_v, c_v, a_v = decode_step(params, arch, toks,
                                jnp.full((B,), 4, jnp.int32), cache,
                                align_sel=sel)
    np.testing.assert_allclose(np.asarray(l_s), np.asarray(l_v), atol=1e-5)
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_v), atol=1e-6)
    for xs, xv in zip(jax.tree.leaves(c_s), jax.tree.leaves(c_v)):
        np.testing.assert_allclose(np.asarray(xs, np.float32),
                                   np.asarray(xv, np.float32),
                                   atol=1.0, rtol=1e-3)
