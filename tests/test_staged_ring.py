"""Staged ring growth (GenerationOptions.staged_ring_quantum).

The greedy/sampling decode loop can run in ring-width stages so the
self-attention read scales with the live prefix instead of the full
allocated ring. Padded ring slots contribute exact zeros to every
reduction (masked scores -> exp == 0.0), so when the reduction tree's
GROUPING of the live values is unchanged the staged loop is
BIT-IDENTICAL to the single full-width loop — pinned below for rings
within a few quanta. At production widths the grouping is NOT always
preserved: a vectorized sum over a 128-wide stage parenthesizes the
same nonzero summands differently than over the full ring, so
probabilities (align/logprob) can move by reduction-order ulp while
token sequences stay exact (measured round 4:
test_staged_ring_default_quantum_production_ring, 9.3e-10 max abs).
Same class as assisted decoding's verify-block einsum reassociation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding.greedy import greedy_decode_jit
from crisperwhisper_tpu.models import alignment_selector, encode, init_params
from helpers import TINY_SPECIALS, rand_mel, tiny_arch


def _setup():
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    enc = encode(params, arch, jnp.asarray(rand_mel(batch=2, seed=4)))
    sel = jnp.asarray(alignment_selector(arch, ((0, 1), (1, 2))))
    return arch, params, enc, sel


@pytest.mark.parametrize("self_dtype", [None, jnp.int8])
@pytest.mark.parametrize("p", [1, 3])
def test_staged_ring_bitwise_equals_plain(self_dtype, p):
    arch, params, enc, sel = _setup()
    prompt = jnp.concatenate(
        [jnp.full((2, 1), TINY_SPECIALS.sot, jnp.int32)]
        + [jnp.full((2, 1), TINY_SPECIALS.no_timestamps, jnp.int32)] * (p - 1),
        axis=1)
    base = dict(max_initial_timestamp_index=50)
    kw = dict(align_sel=sel, cross_cache_dtype=jnp.int8,
              self_cache_dtype=self_dtype)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS,
                            GenerationOptions(**base), enc, prompt, 20,
                            **kw)
    got = greedy_decode_jit(params, arch, TINY_SPECIALS,
                            GenerationOptions(**base,
                                              staged_ring_quantum=8),
                            enc, prompt, 20, **kw)
    np.testing.assert_array_equal(np.asarray(ref.sequences),
                                  np.asarray(got.sequences))
    np.testing.assert_array_equal(np.asarray(ref.num_generated),
                                  np.asarray(got.num_generated))
    np.testing.assert_array_equal(np.asarray(ref.align_probs),
                                  np.asarray(got.align_probs))
    np.testing.assert_array_equal(np.asarray(ref.sum_logprobs),
                                  np.asarray(got.sum_logprobs))
    np.testing.assert_array_equal(np.asarray(ref.no_speech_probs),
                                  np.asarray(got.no_speech_probs))


def test_staged_ring_sampling_bitwise():
    """Temperature sampling consumes the SAME rng stream per step, so the
    staged loop must reproduce sampled sequences bitwise too."""
    arch, params, enc, sel = _setup()
    prompt = jnp.full((2, 1), TINY_SPECIALS.sot, jnp.int32)
    base = dict(max_initial_timestamp_index=50, temperatures=(0.8,))
    kw = dict(align_sel=sel, temperature=0.8,
              rng=jax.random.PRNGKey(11), cross_cache_dtype=jnp.int8,
              self_cache_dtype=jnp.int8)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS,
                            GenerationOptions(**base), enc, prompt, 18,
                            **kw)
    got = greedy_decode_jit(params, arch, TINY_SPECIALS,
                            GenerationOptions(**base,
                                              staged_ring_quantum=8),
                            enc, prompt, 18, **kw)
    np.testing.assert_array_equal(np.asarray(ref.sequences),
                                  np.asarray(got.sequences))


def test_staged_ring_noop_when_mask_or_small():
    """The staged path must not engage (identical programs/output) when a
    key_mask is present or the ring fits one quantum."""
    arch, params, enc, sel = _setup()
    prompt = jnp.full((2, 3), TINY_SPECIALS.sot, jnp.int32)
    mask = jnp.asarray([[False, True, True], [True, True, True]])
    base = dict(max_initial_timestamp_index=50)
    kw = dict(align_sel=sel, prompt_mask=mask)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS,
                            GenerationOptions(**base), enc, prompt, 12,
                            **kw)
    got = greedy_decode_jit(params, arch, TINY_SPECIALS,
                            GenerationOptions(**base,
                                              staged_ring_quantum=8),
                            enc, prompt, 12, **kw)
    np.testing.assert_array_equal(np.asarray(ref.sequences),
                                  np.asarray(got.sequences))
    big_q = GenerationOptions(**base, staged_ring_quantum=512)
    got2 = greedy_decode_jit(params, arch, TINY_SPECIALS, big_q, enc,
                             prompt[:, :1], 12, align_sel=sel)
    ref2 = greedy_decode_jit(params, arch, TINY_SPECIALS,
                             GenerationOptions(**base), enc,
                             prompt[:, :1], 12, align_sel=sel)
    np.testing.assert_array_equal(np.asarray(ref2.sequences),
                                  np.asarray(got2.sequences))


@pytest.mark.parametrize("self_dtype", [None, jnp.int8])
def test_staged_ring_beam_bitwise(self_dtype):
    """Beam search under staged ring growth must be bit-identical too
    (per-beam rings make the self read NB x greedy's)."""
    from crisperwhisper_tpu.decoding.beam import beam_decode_jit

    arch, params, enc, sel = _setup()
    prompt = jnp.concatenate(
        [jnp.full((2, 1), TINY_SPECIALS.sot, jnp.int32),
         jnp.full((2, 1), TINY_SPECIALS.no_timestamps, jnp.int32)], axis=1)
    base = dict(max_initial_timestamp_index=50)
    kw = dict(num_beams=3, align_sel=sel, return_timestamps=False,
              cross_cache_dtype=jnp.int8, self_cache_dtype=self_dtype)
    ref = beam_decode_jit(params, arch, TINY_SPECIALS,
                          GenerationOptions(**base), enc, prompt, 18, **kw)
    got = beam_decode_jit(params, arch, TINY_SPECIALS,
                          GenerationOptions(**base,
                                            staged_ring_quantum=8),
                          enc, prompt, 18, **kw)
    np.testing.assert_array_equal(np.asarray(ref.sequences),
                                  np.asarray(got.sequences))
    np.testing.assert_array_equal(np.asarray(ref.sequences_scores),
                                  np.asarray(got.sequences_scores))
    np.testing.assert_array_equal(np.asarray(ref.align_probs),
                                  np.asarray(got.align_probs))
    np.testing.assert_array_equal(np.asarray(ref.num_generated),
                                  np.asarray(got.num_generated))


@pytest.mark.parametrize("self_dtype", [None, jnp.int8])
def test_staged_ring_assisted_bitwise(self_dtype):
    """Assisted decoding (prompt-lookup, batched) under staged ring
    growth: sequences, lengths and alignment must be bit-identical."""
    from crisperwhisper_tpu.decoding.assisted import assisted_decode_jit

    arch, params, enc, sel = _setup()
    prompt = jnp.full((2, 1), TINY_SPECIALS.sot, jnp.int32)
    base = dict(max_initial_timestamp_index=50)
    kw = dict(suppress_mask=None, align_sel=sel,
              cross_cache_dtype=jnp.int8, self_cache_dtype=self_dtype)
    ref = assisted_decode_jit(params, arch, None, None, TINY_SPECIALS,
                              GenerationOptions(**base), enc, None,
                              prompt, 18, spec_len=3, **kw)
    got = assisted_decode_jit(params, arch, None, None, TINY_SPECIALS,
                              GenerationOptions(**base,
                                                staged_ring_quantum=8),
                              enc, None, prompt, 18, spec_len=3, **kw)
    np.testing.assert_array_equal(np.asarray(ref.sequences),
                                  np.asarray(got.sequences))
    np.testing.assert_array_equal(np.asarray(ref.num_generated),
                                  np.asarray(got.num_generated))
    # the verify block's width-axis einsum reassociates partial sums per
    # matrix width on this backend (live terms identical, zero tail
    # exact) -> alignment agrees to reduction-order ulp, sequences exact
    np.testing.assert_allclose(np.asarray(got.align_probs),
                               np.asarray(ref.align_probs), atol=1e-6)


def test_staged_ring_assisted_self_draft_bitwise():
    """A REAL draft (layer-truncated self-draft) stages its own rings
    alongside the main model's; output stays bit-identical."""
    from crisperwhisper_tpu.decoding.assisted import (assisted_decode_jit,
                                                      make_self_draft)

    arch, params, enc, sel = _setup()
    draft_params, draft_arch = make_self_draft(params, arch, 1)
    prompt = jnp.full((2, 1), TINY_SPECIALS.sot, jnp.int32)
    base = dict(max_initial_timestamp_index=50)
    kw = dict(align_sel=sel, cross_cache_dtype=jnp.int8,
              self_cache_dtype=jnp.int8)
    ref = assisted_decode_jit(params, arch, draft_params, draft_arch,
                              TINY_SPECIALS, GenerationOptions(**base),
                              enc, enc, prompt, 18, spec_len=3, **kw)
    got = assisted_decode_jit(params, arch, draft_params, draft_arch,
                              TINY_SPECIALS,
                              GenerationOptions(**base,
                                                staged_ring_quantum=8),
                              enc, enc, prompt, 18, spec_len=3, **kw)
    np.testing.assert_array_equal(np.asarray(ref.sequences),
                                  np.asarray(got.sequences))
    np.testing.assert_allclose(np.asarray(got.align_probs),
                               np.asarray(ref.align_probs), atol=1e-6)


def test_staged_ring_default_quantum_production_ring():
    """ADVICE r3: the SHIPPED default quantum was never exercised at a
    ring wider than one quantum. Decode 150 tokens on an arch with
    max_target_positions=192 so the default (64 after the round-4
    on-chip sweep) runs a real multi-stage loop, and pin
    GenerationOptions() (default ON) against staged_ring_quantum=0
    (single full-width loop).

    Finding (round 4, this test): at ring widths ABOVE one quantum the
    padded-zeros argument no longer yields bitwise equality — a
    vectorized reduction over a 128-wide stage groups the same nonzero
    summands into a different tree than a 151-wide full ring, so the
    attention softmax rounds differently (measured: align_probs max abs
    9.3e-10 / rel 2.4e-7 = one f32 ulp; sequences/num_generated exact).
    Tokens are pinned bitwise; probabilities to reduction-order ulp."""
    from crisperwhisper_tpu.config import WhisperArch
    from helpers import TINY

    arch = WhisperArch(**{**TINY, "max_target_positions": 192})
    params = init_params(arch, jax.random.PRNGKey(0))
    enc = encode(params, arch, jnp.asarray(rand_mel(batch=2, seed=4)))
    sel = jnp.asarray(alignment_selector(arch, ((0, 1), (1, 2))))
    prompt = jnp.full((2, 1), TINY_SPECIALS.sot, jnp.int32)
    base = dict(max_initial_timestamp_index=50)
    kw = dict(align_sel=sel, cross_cache_dtype=jnp.int8,
              self_cache_dtype=jnp.int8)

    default = GenerationOptions(**base)
    assert default.staged_ring_quantum == 64
    got = greedy_decode_jit(params, arch, TINY_SPECIALS, default, enc,
                            prompt, 150, **kw)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS,
                            GenerationOptions(**base,
                                              staged_ring_quantum=0),
                            enc, prompt, 150, **kw)
    for field in ("sequences", "num_generated"):
        np.testing.assert_array_equal(np.asarray(getattr(ref, field)),
                                      np.asarray(getattr(got, field)),
                                      err_msg=field)
    for field in ("align_probs", "sum_logprobs", "no_speech_probs"):
        np.testing.assert_allclose(np.asarray(getattr(got, field)),
                                   np.asarray(getattr(ref, field)),
                                   rtol=3e-6, atol=1e-8, err_msg=field)
