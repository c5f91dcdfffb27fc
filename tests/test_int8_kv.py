"""int8 cross-KV cache: quality and plumbing checks (CPU path)."""

import numpy as np

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import greedy_decode_jit
from crisperwhisper_tpu.models import encode, init_params
from crisperwhisper_tpu.models.whisper import _quantize_int8
from helpers import TINY_SPECIALS, rand_mel, tiny_arch


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 100, 64)).astype(np.float32))
    q, s = _quantize_int8(x)
    deq = q.astype(jnp.float32) * s.astype(jnp.float32)
    err = np.abs(np.asarray(deq - x))
    amax = np.abs(np.asarray(x)).max(-1, keepdims=True)
    assert (err <= amax / 127.0 + 1e-6).all()


def test_int4_decode_token_agreement():
    """int4 cross cache (the large-batch serving option): coarser than
    int8 but must still overwhelmingly agree on greedy tokens."""
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    mel = rand_mel(batch=4, seed=9)
    enc = encode(params, arch, jnp.asarray(mel))
    prompt = jnp.full((4, 1), TINY_SPECIALS.sot, jnp.int32)
    opts = GenerationOptions(max_initial_timestamp_index=50)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            16)
    got = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            16, cross_cache_dtype=jnp.int4)
    agree = (np.asarray(ref.sequences) == np.asarray(got.sequences)).mean()
    assert agree >= 0.75, agree


def test_int8_decode_token_agreement():
    """Greedy tokens with the int8 cross cache should overwhelmingly agree
    with bf16/f32 on the tiny model (small logit perturbation)."""
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    mel = rand_mel(batch=4, seed=9)
    enc = encode(params, arch, jnp.asarray(mel))
    prompt = jnp.full((4, 1), TINY_SPECIALS.sot, jnp.int32)
    opts = GenerationOptions(max_initial_timestamp_index=50)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            16)
    got = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            16, cross_cache_dtype=jnp.int8)
    agree = (np.asarray(ref.sequences) == np.asarray(got.sequences)).mean()
    assert agree >= 0.85, agree


def test_int8_self_cache_token_agreement():
    """Quantized SELF ring (columns quantized as written): greedy tokens
    should overwhelmingly agree with the full-precision ring."""
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    mel = rand_mel(batch=4, seed=9)
    enc = encode(params, arch, jnp.asarray(mel))
    prompt = jnp.full((4, 1), TINY_SPECIALS.sot, jnp.int32)
    opts = GenerationOptions(max_initial_timestamp_index=50)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            16)
    got = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            16, self_cache_dtype=jnp.int8)
    agree = (np.asarray(ref.sequences) == np.asarray(got.sequences)).mean()
    assert agree >= 0.85, agree


def test_int8_both_caches_with_alignment():
    """Both rings quantized at once + alignment capture stays sane
    (probabilities in [0, 1], finite, rows roughly normalized)."""
    from crisperwhisper_tpu.models import alignment_selector

    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    mel = rand_mel(batch=2, seed=3)
    enc = encode(params, arch, jnp.asarray(mel))
    prompt = jnp.full((2, 1), TINY_SPECIALS.sot, jnp.int32)
    opts = GenerationOptions(max_initial_timestamp_index=50)
    sel = jnp.asarray(alignment_selector(arch, ((0, 0), (1, 1))))
    res = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            8, align_sel=sel,
                            cross_cache_dtype=jnp.int8,
                            self_cache_dtype=jnp.int8)
    probs = np.asarray(res.align_probs)
    assert np.isfinite(probs).all()
    assert probs.min() >= 0.0 and probs.max() <= 1.0 + 1e-3
    sums = probs.sum(-1)
    recorded = sums[sums > 0]
    assert recorded.size and np.allclose(recorded, 1.0, atol=2e-2)


def test_int8_self_ring_beam_agreement():
    """Beam search with the int8 SELF ring (self_cache_dtype) must
    overwhelmingly agree with the bf16-ring beams: scales ride the
    while-loop carry and are reordered with the rings at each beam
    shuffle. Multi-token prompt exercises the quantized prefill ring."""
    from crisperwhisper_tpu.decoding.beam import beam_decode_jit

    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    mel = rand_mel(batch=2, seed=3)
    enc = encode(params, arch, jnp.asarray(mel))
    prompt = jnp.concatenate(
        [jnp.full((2, 1), TINY_SPECIALS.sot, jnp.int32),
         jnp.full((2, 1), TINY_SPECIALS.no_timestamps, jnp.int32)], axis=1)
    opts = GenerationOptions(max_initial_timestamp_index=50)
    kw = dict(num_beams=4, return_timestamps=False)
    ref = beam_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                          16, **kw)
    got = beam_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                          16, self_cache_dtype=jnp.int8, **kw)
    agree = (np.asarray(ref.sequences) == np.asarray(got.sequences)).mean()
    assert agree >= 0.75, agree
    np.testing.assert_allclose(np.asarray(got.sequences_scores),
                               np.asarray(ref.sequences_scores), atol=0.15)
