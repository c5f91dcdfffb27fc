"""decode_step_multi (block prefill / speculative verify pass) must match
a chain of single-token decode_step calls exactly: same logits, same
cache contents, same alignment rows."""

import numpy as np

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.models import (alignment_selector, decode_step,
                                       decode_step_multi, encode,
                                       init_cache, init_params)
from helpers import rand_mel, tiny_arch


def _setup(batch=3, seed=0, **cache_kwargs):
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(seed))
    enc = encode(params, arch, jnp.asarray(rand_mel(batch=batch, seed=seed)))
    cache = init_cache(params, arch, enc, cache_len=32, **cache_kwargs)
    return arch, params, cache


def _run_single_chain(params, arch, cache, tokens, start, align_sel=None,
                      key_mask=None):
    logits_all, aligns = [], []
    for i in range(tokens.shape[1]):
        logits, cache, align = decode_step(
            params, arch, tokens[:, i], jnp.int32(start + i), cache,
            align_sel=align_sel, key_mask=key_mask)
        logits_all.append(logits)
        aligns.append(align)
    return jnp.stack(logits_all, 1), cache, jnp.stack(aligns, 2)


def test_multi_matches_single_chain():
    arch, params, cache = _setup()
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, arch.vocab_size, (3, 5)), jnp.int32)
    sel = jnp.asarray(alignment_selector(arch, ((0, 1), (1, 0))))

    ref_logits, ref_cache, ref_align = _run_single_chain(
        params, arch, cache, tokens, 0, align_sel=sel)
    got_logits, got_cache, got_align = decode_step_multi(
        params, arch, tokens, jnp.int32(0), cache, align_sel=sel)

    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(ref_logits), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_align),
                               np.asarray(ref_align), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_cache.self_k),
                               np.asarray(ref_cache.self_k), atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_cache.self_v),
                               np.asarray(ref_cache.self_v), atol=1e-6)


def test_multi_continues_from_nonzero_position():
    """Block write at position > 0 (the speculative re-feed case) after a
    prior prefix, including overwrite of stale columns."""
    arch, params, cache = _setup(seed=2)
    rng = np.random.default_rng(3)
    prefix = jnp.asarray(rng.integers(0, arch.vocab_size, (3, 4)), jnp.int32)
    block = jnp.asarray(rng.integers(0, arch.vocab_size, (3, 3)), jnp.int32)

    # single-token chain through prefix, then plant STALE columns beyond
    _, cache_a, _ = _run_single_chain(params, arch, cache, prefix, 0)
    stale = cache_a._replace(
        self_k=cache_a.self_k.at[..., 5:8].set(99.0),
        self_v=cache_a.self_v.at[..., 5:8].set(-99.0))

    ref_logits, _, _ = _run_single_chain(params, arch, cache_a, block, 4)
    got_logits, _, _ = decode_step_multi(params, arch, block, jnp.int32(4),
                                         stale)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(ref_logits), atol=1e-5)


def test_multi_with_quantized_caches():
    arch, params, cache = _setup(seed=4, cross_dtype=jnp.int8,
                                 self_dtype=jnp.int8)
    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.integers(0, arch.vocab_size, (3, 4)), jnp.int32)
    ref_logits, ref_cache, _ = _run_single_chain(params, arch, cache,
                                                 tokens, 0)
    got_logits, got_cache, _ = decode_step_multi(params, arch, tokens,
                                                 jnp.int32(0), cache)
    np.testing.assert_allclose(np.asarray(got_logits),
                               np.asarray(ref_logits), atol=2e-4)
    np.testing.assert_array_equal(np.asarray(got_cache.self_k),
                                  np.asarray(ref_cache.self_k))


def test_multi_respects_key_mask():
    """Left-pad masking (conditioned prompts): masked ring slots must not
    be attended even when written. Logits AT the pad query positions are
    junk in both implementations (fully-masked softmax) and legitimately
    differ — the contract covers the non-pad positions and every step
    after the block."""
    arch, params, cache = _setup(seed=6)
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(0, arch.vocab_size, (3, 6)), jnp.int32)
    key_mask = jnp.ones((3, 32), bool).at[:, :2].set(False)

    ref_logits, ref_cache, _ = _run_single_chain(params, arch, cache,
                                                 tokens, 0,
                                                 key_mask=key_mask)
    got_logits, got_cache, _ = decode_step_multi(
        params, arch, tokens, jnp.int32(0), cache, key_mask=key_mask)
    np.testing.assert_allclose(np.asarray(got_logits)[:, 2:],
                               np.asarray(ref_logits)[:, 2:], atol=1e-5)

    # the step after the block must agree too (it reads the cache)
    nxt = jnp.asarray(rng.integers(0, arch.vocab_size, (3,)), jnp.int32)
    ref_n, _, _ = decode_step(params, arch, nxt, jnp.int32(6), ref_cache,
                              key_mask=key_mask)
    got_n, _, _ = decode_step(params, arch, nxt, jnp.int32(6), got_cache,
                              key_mask=key_mask)
    np.testing.assert_allclose(np.asarray(got_n), np.asarray(ref_n),
                               atol=1e-5)
