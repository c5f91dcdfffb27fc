"""Batch-1 whole-step Pallas decoder kernel (ops/pallas_decode_b1).

The kernel is a serving NUMERICS OPTION (f32 residual stream vs the XLA
step's bf16), so parity is token-agreement + tolerance, like the int8/
int4 cache options (tests/test_int8_kv.py). Interpret mode on CPU; the
Mosaic-compiled TPU path is covered by scripts/b1_kernel_bench.py and
the bench row.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.models import (alignment_selector, decode_step,
                                       encode, init_cache, init_params)
from crisperwhisper_tpu.models.quantize import (fuse_decoder_qkv,
                                                quantize_decoder_weights)
from crisperwhisper_tpu.ops.pallas_decode_b1 import (decode_step_b1,
                                                     supported)
from helpers import rand_mel, tiny_arch


def _setup(cross_dtype=jnp.int8, ring=32):
    arch = tiny_arch()
    params = quantize_decoder_weights(
        fuse_decoder_qkv(init_params(arch, jax.random.PRNGKey(0)),
                         arch.head_dim))
    mel = rand_mel(batch=1, seed=5)
    enc = encode(params, arch, jnp.asarray(mel))
    cache = init_cache(params, arch, enc, cross_dtype=cross_dtype,
                       cache_len=ring, self_dtype=jnp.int8)
    sel = jnp.asarray(alignment_selector(arch, ((0, 1), (1, 2))))
    return arch, params, cache, sel


@pytest.mark.parametrize("cross_dtype", [jnp.int8, jnp.int4])
def test_b1_kernel_step_parity(cross_dtype):
    """Chained steps: argmax must agree with the XLA decode_step every
    step; logits/alignment within the bf16-vs-f32 numerics band; the
    quantized ring columns within 1 LSB."""
    arch, params, cache, sel = _setup(cross_dtype)
    assert supported(params, arch, cache, None, 1, jnp.int32(0),
                     jnp.asarray([7], jnp.int32))
    ca = cb = cache
    tok = 7
    for i in range(8):
        tt = jnp.asarray([tok], jnp.int32)
        la, ca, aa = decode_step(params, arch, tt, jnp.int32(i), ca,
                                 align_sel=sel)
        lb, cb, ab = decode_step_b1(params, arch, tt, jnp.int32(i), cb,
                                    align_sel=sel, interpret=True)
        la, lb = np.asarray(la), np.asarray(lb)
        assert la.argmax() == lb.argmax(), i
        np.testing.assert_allclose(lb, la, atol=5e-3)
        np.testing.assert_allclose(np.asarray(ab), np.asarray(aa),
                                   atol=1e-4)
        assert np.abs(np.asarray(ca.self_k, np.int32)
                      - np.asarray(cb.self_k, np.int32)).max() <= 1
        assert np.abs(np.asarray(ca.self_v, np.int32)
                      - np.asarray(cb.self_v, np.int32)).max() <= 1
        tok = int(la.argmax())
    # cross cache untouched
    np.testing.assert_array_equal(np.asarray(cb.cross_k, np.int32),
                                  np.asarray(cache.cross_k, np.int32))


def test_b1_kernel_greedy_integration():
    """greedy_decode with opts.b1_decode_kernel must produce a token
    stream in high agreement with the plain path (numerics option), and
    must AUTO-FALL-BACK (bit-identical output) when the config is
    outside the kernel's gate (here: bf16 caches)."""
    from crisperwhisper_tpu.config import GenerationOptions
    from crisperwhisper_tpu.decoding.greedy import greedy_decode_jit
    from helpers import TINY_SPECIALS

    arch, params, _, sel = _setup()
    mel = rand_mel(batch=1, seed=5)
    enc = encode(params, arch, jnp.asarray(mel))
    prompt = jnp.full((1, 1), TINY_SPECIALS.sot, jnp.int32)
    base = dict(max_initial_timestamp_index=50)
    opts_off = GenerationOptions(**base)
    opts_on = GenerationOptions(**base, b1_decode_kernel=True)
    kw = dict(align_sel=sel, cross_cache_dtype=jnp.int8,
              self_cache_dtype=jnp.int8)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts_off, enc,
                            prompt, 16, **kw)
    got = greedy_decode_jit(params, arch, TINY_SPECIALS, opts_on, enc,
                            prompt, 16, **kw)
    r = np.asarray(ref.sequences)[0]
    g = np.asarray(got.sequences)[0]
    n = min(int(ref.num_generated[0]), int(got.num_generated[0]))
    agree = float((r[:n] == g[:n]).mean())
    assert agree >= 0.9, (agree, r[:n], g[:n])
    # outside the gate (bf16 caches): flag must be a no-op, bit-identical
    ref_bf = greedy_decode_jit(params, arch, TINY_SPECIALS, opts_off, enc,
                               prompt, 16, align_sel=sel)
    got_bf = greedy_decode_jit(params, arch, TINY_SPECIALS, opts_on, enc,
                               prompt, 16, align_sel=sel)
    np.testing.assert_array_equal(np.asarray(ref_bf.sequences),
                                  np.asarray(got_bf.sequences))
    np.testing.assert_array_equal(np.asarray(ref_bf.align_probs),
                                  np.asarray(got_bf.align_probs))


def test_b1_kernel_supported_gate():
    """The gate must reject every configuration the kernel does not
    implement (so greedy_decode can fall back safely)."""
    arch, params, cache, sel = _setup()
    tok = jnp.asarray([7], jnp.int32)
    ok = lambda **kw: supported(  # noqa: E731
        kw.get("params", params), arch, kw.get("cache", cache),
        kw.get("key_mask"), kw.get("beam_groups", 1),
        kw.get("position", jnp.int32(0)), kw.get("tokens", tok))
    assert ok()
    assert not ok(tokens=jnp.asarray([7, 8], jnp.int32))        # batch 2
    assert not ok(position=jnp.asarray([0], jnp.int32))         # vector pos
    assert not ok(key_mask=jnp.ones((1, 32), bool))             # masked
    assert not ok(beam_groups=2)
    bf16_cache = init_cache(params, arch,
                            jnp.zeros((1, arch.max_source_positions,
                                       arch.d_model)), cache_len=32)
    assert not ok(cache=bf16_cache)                             # bf16 caches
    unfused = quantize_decoder_weights(
        init_params(arch, jax.random.PRNGKey(0)))
    assert not ok(params=unfused)                               # no fused qkv


def test_b1_kernel_multi_parity():
    """M-token block step vs decode_step_multi (the assisted verify
    pass): argmax agreement per block row, logits within the numerics
    band, ring block columns within 1 LSB; and at S=1 the multi kernel
    must be BITWISE identical to the single-token kernel."""
    from crisperwhisper_tpu.models import decode_step_multi
    from crisperwhisper_tpu.ops.pallas_decode_b1 import decode_step_b1_multi

    arch, params, cache, sel = _setup(jnp.int8)
    # shared warm ring: 3 XLA single steps populate both sides equally
    ca = cb = cache
    for i, tok in enumerate((7, 11, 13)):
        tt = jnp.asarray([tok], jnp.int32)
        _, ca, _ = decode_step(params, arch, tt, jnp.int32(i), ca,
                               align_sel=sel)
        _, cb, _ = decode_step(params, arch, tt, jnp.int32(i), cb,
                               align_sel=sel)
    block = jnp.asarray([[17, 19, 23, 29]], jnp.int32)
    la, ca2, aa = decode_step_multi(params, arch, block, jnp.int32(3), ca,
                                    align_sel=sel)
    lb, cb2, ab = decode_step_b1_multi(params, arch, block, jnp.int32(3),
                                       cb, align_sel=sel, interpret=True)
    la, lb = np.asarray(la), np.asarray(lb)
    assert la.shape == lb.shape == (1, 4, arch.vocab_size)
    for i in range(4):
        assert la[0, i].argmax() == lb[0, i].argmax(), i
    np.testing.assert_allclose(lb, la, atol=5e-3)
    assert np.asarray(ab).shape == np.asarray(aa).shape
    np.testing.assert_allclose(np.asarray(ab), np.asarray(aa), atol=1e-4)
    assert np.abs(np.asarray(ca2.self_k, np.int32)
                  - np.asarray(cb2.self_k, np.int32)).max() <= 1
    assert np.abs(np.asarray(ca2.self_v, np.int32)
                  - np.asarray(cb2.self_v, np.int32)).max() <= 1
    np.testing.assert_allclose(
        np.asarray(cb2.self_k_scale, np.float32),
        np.asarray(ca2.self_k_scale, np.float32), rtol=1e-2, atol=1e-6)

    # S=1 block == single-token kernel, bitwise
    one = jnp.asarray([[17]], jnp.int32)
    l1, c1, a1 = decode_step_b1(params, arch, one[:, 0], jnp.int32(3), cb,
                                align_sel=sel, interpret=True)
    lm, cm, am = decode_step_b1_multi(params, arch, one, jnp.int32(3), cb,
                                      align_sel=sel, interpret=True)
    np.testing.assert_array_equal(np.asarray(lm[:, 0]), np.asarray(l1))
    np.testing.assert_array_equal(np.asarray(am[:, :, 0]), np.asarray(a1))
    np.testing.assert_array_equal(np.asarray(cm.self_k), np.asarray(c1.self_k))
    np.testing.assert_array_equal(np.asarray(cm.self_k_scale),
                                  np.asarray(c1.self_k_scale))


@pytest.mark.parametrize("cross_dtype", [jnp.int8, jnp.int4])
def test_b1_kernel_self_draft_chain(cross_dtype):
    """Self-draft (layer-truncated) assisted decoding with the B=1
    kernel: the DRAFT CHAIN itself runs on the kernel (draft_quant gate
    — quantized fused draft params sliced from the main checkpoint, int8
    draft ring). Output must still equal greedy with the kernel: draft
    numerics only move the acceptance rate, the verify pass pins the
    tokens. int4 cross is the serving/bench configuration
    (scripts/spec_accept_bench.py B1K=1 SELF_DRAFT=K)."""
    from crisperwhisper_tpu.config import GenerationOptions
    from crisperwhisper_tpu.decoding.assisted import (assisted_decode_jit,
                                                      make_self_draft)
    from crisperwhisper_tpu.decoding.greedy import greedy_decode_jit
    from helpers import TINY_SPECIALS

    arch, params, _, sel = _setup()
    draft_params, draft_arch = make_self_draft(params, arch, 1)
    mel = rand_mel(batch=1, seed=5)
    enc = encode(params, arch, jnp.asarray(mel))
    prompt = jnp.full((1, 1), TINY_SPECIALS.sot, jnp.int32)
    opts = GenerationOptions(max_initial_timestamp_index=50,
                             b1_decode_kernel=True)
    kw = dict(align_sel=sel, cross_cache_dtype=cross_dtype,
              self_cache_dtype=jnp.int8)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc,
                            prompt, 16, **kw)
    got = assisted_decode_jit(params, arch, draft_params, draft_arch,
                              TINY_SPECIALS, opts, enc, enc, prompt, 16,
                              spec_len=3, **kw)
    np.testing.assert_array_equal(np.asarray(ref.sequences),
                                  np.asarray(got.sequences))
    np.testing.assert_array_equal(np.asarray(ref.num_generated),
                                  np.asarray(got.num_generated))
    np.testing.assert_allclose(np.asarray(got.align_probs),
                               np.asarray(ref.align_probs), atol=2e-3)
    # and the bf16-draft fallback (kernel off) still matches plain greedy
    opts_off = GenerationOptions(max_initial_timestamp_index=50)
    ref_off = greedy_decode_jit(params, arch, TINY_SPECIALS, opts_off, enc,
                                prompt, 16, **kw)
    got_off = assisted_decode_jit(params, arch, draft_params, draft_arch,
                                  TINY_SPECIALS, opts_off, enc, enc, prompt,
                                  16, spec_len=3, **kw)
    np.testing.assert_array_equal(np.asarray(ref_off.sequences),
                                  np.asarray(got_off.sequences))


def test_b1_kernel_assisted_prompt_lookup():
    """Prompt-lookup assisted decoding with the B=1 kernel verify must
    equal greedy decoding with the B=1 kernel (the exactness contract
    under the kernel's own numerics): the multi-block kernel chains the
    same per-row math as the single-token kernel."""
    from crisperwhisper_tpu.config import GenerationOptions
    from crisperwhisper_tpu.decoding.assisted import assisted_decode_jit
    from crisperwhisper_tpu.decoding.greedy import greedy_decode_jit
    from helpers import TINY_SPECIALS

    arch, params, _, sel = _setup()
    mel = rand_mel(batch=1, seed=5)
    enc = encode(params, arch, jnp.asarray(mel))
    prompt = jnp.full((1, 1), TINY_SPECIALS.sot, jnp.int32)
    opts = GenerationOptions(max_initial_timestamp_index=50,
                             b1_decode_kernel=True)
    kw = dict(align_sel=sel, cross_cache_dtype=jnp.int8,
              self_cache_dtype=jnp.int8)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc,
                            prompt, 16, **kw)
    got = assisted_decode_jit(params, arch, None, None, TINY_SPECIALS,
                              opts, enc, None, prompt, 16, spec_len=3,
                              **kw)
    np.testing.assert_array_equal(np.asarray(ref.sequences),
                                  np.asarray(got.sequences))
    np.testing.assert_array_equal(np.asarray(ref.num_generated),
                                  np.asarray(got.num_generated))
    np.testing.assert_allclose(np.asarray(got.align_probs),
                               np.asarray(ref.align_probs), atol=2e-3)


def test_b1_kernel_beams_step_parity():
    """Beam-rows kernel vs decode_step(beam_groups=NB) at batch 1:
    chained steps with beam-reorder gathers between them (the real
    beam-loop usage). Per-row argmax agreement, logits/alignment within
    the numerics band, per-row ring columns within 1 LSB."""
    from crisperwhisper_tpu.ops.pallas_decode_b1 import (
        decode_step_b1_beams, supported_beams)

    nb = 3
    arch = tiny_arch()
    params = quantize_decoder_weights(
        fuse_decoder_qkv(init_params(arch, jax.random.PRNGKey(0)),
                         arch.head_dim))
    mel = rand_mel(batch=1, seed=11)
    enc = encode(params, arch, jnp.asarray(mel))
    cache = init_cache(params, arch, enc, cross_dtype=jnp.int8,
                       cache_len=32, self_dtype=jnp.int8,
                       self_batch=nb)
    sel = jnp.asarray(alignment_selector(arch, ((0, 1), (1, 2))))
    assert supported_beams(params, arch, cache, None, jnp.int32(0),
                           jnp.zeros((nb,), jnp.int32))

    rng = np.random.default_rng(0)
    ca = cb = cache
    toks = jnp.asarray([5, 9, 13], jnp.int32)
    for i in range(6):
        la, ca, aa = decode_step(params, arch, toks, jnp.int32(i), ca,
                                 align_sel=sel, beam_groups=nb)
        lb, cb, ab = decode_step_b1_beams(params, arch, toks, jnp.int32(i),
                                          cb, align_sel=sel,
                                          interpret=True)
        la, lb = np.asarray(la), np.asarray(lb)
        assert (la.argmax(-1) == lb.argmax(-1)).all(), i
        np.testing.assert_allclose(lb, la, atol=5e-3)
        np.testing.assert_allclose(np.asarray(ab), np.asarray(aa),
                                   atol=1e-4)
        assert np.abs(np.asarray(ca.self_k, np.int32)
                      - np.asarray(cb.self_k, np.int32)).max() <= 1
        assert np.abs(np.asarray(ca.self_v, np.int32)
                      - np.asarray(cb.self_v, np.int32)).max() <= 1
        # beam reorder between steps (gather rings + scales by src beam),
        # exercising per-row ring divergence
        src = jnp.asarray(rng.integers(0, nb, size=nb), jnp.int32)
        reorder = lambda c: c._replace(  # noqa: E731
            self_k=c.self_k[:, src], self_v=c.self_v[:, src],
            self_k_scale=c.self_k_scale[:, src],
            self_v_scale=c.self_v_scale[:, src])
        ca, cb = reorder(ca), reorder(cb)
        toks = jnp.asarray(la.argmax(-1), jnp.int32)[src]
    np.testing.assert_array_equal(np.asarray(cb.cross_k, np.int32),
                                  np.asarray(cache.cross_k, np.int32))


def test_b1_kernel_beam_decode_integration():
    """beam_decode with opts.b1_decode_kernel at batch 1 + int8 self
    ring: high token agreement with the plain XLA beam path; outside the
    gate (bf16 ring) the flag must be a bit-identical no-op."""
    from crisperwhisper_tpu.config import GenerationOptions
    from crisperwhisper_tpu.decoding.beam import beam_decode_jit
    from helpers import TINY_SPECIALS

    arch, params, _, sel = _setup()
    mel = rand_mel(batch=1, seed=7)
    enc = encode(params, arch, jnp.asarray(mel))
    prompt = jnp.concatenate(
        [jnp.full((1, 1), TINY_SPECIALS.sot, jnp.int32),
         jnp.full((1, 1), TINY_SPECIALS.no_timestamps, jnp.int32)], axis=1)
    base = dict(max_initial_timestamp_index=50)
    opts_off = GenerationOptions(**base)
    opts_on = GenerationOptions(**base, b1_decode_kernel=True)
    kw = dict(num_beams=4, align_sel=sel, return_timestamps=False,
              cross_cache_dtype=jnp.int8, self_cache_dtype=jnp.int8)
    ref = beam_decode_jit(params, arch, TINY_SPECIALS, opts_off, enc,
                          prompt, 16, **kw)
    got = beam_decode_jit(params, arch, TINY_SPECIALS, opts_on, enc,
                          prompt, 16, **kw)
    r, g = np.asarray(ref.sequences)[0], np.asarray(got.sequences)[0]
    n = min(int(ref.num_generated[0]), int(got.num_generated[0]))
    agree = float((r[:n] == g[:n]).mean())
    assert agree >= 0.9, (agree, r[:n], g[:n])
    np.testing.assert_allclose(np.asarray(got.sequences_scores),
                               np.asarray(ref.sequences_scores), atol=0.1)
    # outside the gate: bf16 self ring -> flag is a no-op, bit-identical
    kw_bf = dict(num_beams=4, align_sel=sel, return_timestamps=False)
    ref_bf = beam_decode_jit(params, arch, TINY_SPECIALS, opts_off, enc,
                             prompt, 16, **kw_bf)
    got_bf = beam_decode_jit(params, arch, TINY_SPECIALS, opts_on, enc,
                             prompt, 16, **kw_bf)
    np.testing.assert_array_equal(np.asarray(ref_bf.sequences),
                                  np.asarray(got_bf.sequences))
    np.testing.assert_array_equal(np.asarray(ref_bf.align_probs),
                                  np.asarray(got_bf.align_probs))


def test_b1_kernel_beams_supported_gate():
    """supported_beams must reject configurations outside the beam-rows
    kernel's contract so beam_decode falls back to the XLA step."""
    from crisperwhisper_tpu.ops.pallas_decode_b1 import supported_beams

    nb = 3
    arch = tiny_arch()
    params = quantize_decoder_weights(
        fuse_decoder_qkv(init_params(arch, jax.random.PRNGKey(0)),
                         arch.head_dim))
    enc = encode(params, arch, jnp.asarray(rand_mel(batch=1, seed=1)))
    cache = init_cache(params, arch, enc, cross_dtype=jnp.int8,
                       cache_len=32, self_dtype=jnp.int8, self_batch=nb)
    toks = jnp.zeros((nb,), jnp.int32)
    ok = lambda **kw: supported_beams(  # noqa: E731
        kw.get("params", params), arch, kw.get("cache", cache),
        kw.get("key_mask"), kw.get("position", jnp.int32(0)),
        kw.get("tokens", toks))
    assert ok()
    assert not ok(tokens=jnp.zeros((1,), jnp.int32))       # single row ->
    #                                                        greedy kernel
    assert not ok(tokens=jnp.zeros((9,), jnp.int32))       # R > 8 (VMEM)
    assert not ok(position=jnp.zeros((nb,), jnp.int32))    # vector pos
    assert not ok(key_mask=jnp.ones((nb, 32), bool))       # masked
    assert not ok(tokens=jnp.zeros((2,), jnp.int32))       # ring rows != R
    bf16_cache = init_cache(params, arch, enc, cache_len=32,
                            self_batch=nb)
    assert not ok(cache=bf16_cache)                        # bf16 rings
    enc2 = encode(params, arch, jnp.asarray(rand_mel(batch=2, seed=1)))
    multi_item = init_cache(params, arch, enc2, cross_dtype=jnp.int8,
                            cache_len=32, self_dtype=jnp.int8,
                            self_batch=nb)
    assert not ok(cache=multi_item)                        # cross batch != 1


def test_b1_kernel_rows_step_parity():
    """Multi-stream rows kernel vs plain decode_step at batch R: R
    DISTINCT items (per-row cross caches), chained steps. Per-row argmax
    agreement, logits/alignment within the numerics band, per-row ring
    columns within 1 LSB."""
    from crisperwhisper_tpu.ops.pallas_decode_b1 import (decode_step_rows,
                                                         supported_rows)

    r = 4
    arch = tiny_arch()
    params = quantize_decoder_weights(
        fuse_decoder_qkv(init_params(arch, jax.random.PRNGKey(0)),
                         arch.head_dim))
    mel = rand_mel(batch=r, seed=3)
    enc = encode(params, arch, jnp.asarray(mel))
    cache = init_cache(params, arch, enc, cross_dtype=jnp.int8,
                       cache_len=32, self_dtype=jnp.int8)
    sel = jnp.asarray(alignment_selector(arch, ((0, 1), (1, 2))))
    assert supported_rows(params, arch, cache, None, jnp.int32(0),
                          jnp.zeros((r,), jnp.int32))

    ca = cb = cache
    toks = jnp.asarray([5, 9, 13, 2], jnp.int32)
    for i in range(6):
        la, ca, aa = decode_step(params, arch, toks, jnp.int32(i), ca,
                                 align_sel=sel)
        lb, cb, ab = decode_step_rows(params, arch, toks, jnp.int32(i),
                                      cb, align_sel=sel, interpret=True)
        la, lb = np.asarray(la), np.asarray(lb)
        assert (la.argmax(-1) == lb.argmax(-1)).all(), i
        np.testing.assert_allclose(lb, la, atol=5e-3)
        np.testing.assert_allclose(np.asarray(ab), np.asarray(aa),
                                   atol=1e-4)
        assert np.abs(np.asarray(ca.self_k, np.int32)
                      - np.asarray(cb.self_k, np.int32)).max() <= 1
        assert np.abs(np.asarray(ca.self_v, np.int32)
                      - np.asarray(cb.self_v, np.int32)).max() <= 1
        toks = jnp.asarray(la.argmax(-1), jnp.int32)
    np.testing.assert_array_equal(np.asarray(cb.cross_k, np.int32),
                                  np.asarray(cache.cross_k, np.int32))


def test_b1_kernel_rows_greedy_integration():
    """greedy_decode at SMALL BATCH (3 streams) with
    opts.b1_decode_kernel: high per-row token agreement with the plain
    XLA path; outside the gate (bf16 caches) the flag is a bit-identical
    no-op."""
    from crisperwhisper_tpu.config import GenerationOptions
    from crisperwhisper_tpu.decoding.greedy import greedy_decode_jit
    from helpers import TINY_SPECIALS

    b = 3
    arch = tiny_arch()
    params = quantize_decoder_weights(
        fuse_decoder_qkv(init_params(arch, jax.random.PRNGKey(0)),
                         arch.head_dim))
    mel = rand_mel(batch=b, seed=9)
    enc = encode(params, arch, jnp.asarray(mel))
    sel = jnp.asarray(alignment_selector(arch, ((0, 1), (1, 2))))
    prompt = jnp.full((b, 1), TINY_SPECIALS.sot, jnp.int32)
    base = dict(max_initial_timestamp_index=50)
    opts_off = GenerationOptions(**base)
    opts_on = GenerationOptions(**base, b1_decode_kernel=True)
    kw = dict(align_sel=sel, cross_cache_dtype=jnp.int8,
              self_cache_dtype=jnp.int8)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts_off, enc,
                            prompt, 16, **kw)
    got = greedy_decode_jit(params, arch, TINY_SPECIALS, opts_on, enc,
                            prompt, 16, **kw)
    for i in range(b):
        rr = np.asarray(ref.sequences)[i]
        gg = np.asarray(got.sequences)[i]
        n = min(int(ref.num_generated[i]), int(got.num_generated[i]))
        agree = float((rr[:n] == gg[:n]).mean())
        assert agree >= 0.9, (i, agree, rr[:n], gg[:n])
    # outside the gate (bf16 caches): flag must be a no-op, bit-identical
    ref_bf = greedy_decode_jit(params, arch, TINY_SPECIALS, opts_off, enc,
                               prompt, 16, align_sel=sel)
    got_bf = greedy_decode_jit(params, arch, TINY_SPECIALS, opts_on, enc,
                               prompt, 16, align_sel=sel)
    np.testing.assert_array_equal(np.asarray(ref_bf.sequences),
                                  np.asarray(got_bf.sequences))
    np.testing.assert_array_equal(np.asarray(ref_bf.align_probs),
                                  np.asarray(got_bf.align_probs))


def test_b1_kernel_rows_supported_gate():
    """supported_rows must reject configurations outside the
    multi-stream kernel's contract so greedy_decode falls back to the
    XLA step."""
    from crisperwhisper_tpu.ops.pallas_decode_b1 import supported_rows

    r = 3
    arch = tiny_arch()
    params = quantize_decoder_weights(
        fuse_decoder_qkv(init_params(arch, jax.random.PRNGKey(0)),
                         arch.head_dim))
    enc = encode(params, arch, jnp.asarray(rand_mel(batch=r, seed=1)))
    cache = init_cache(params, arch, enc, cross_dtype=jnp.int8,
                       cache_len=32, self_dtype=jnp.int8)
    toks = jnp.zeros((r,), jnp.int32)
    ok = lambda **kw: supported_rows(  # noqa: E731
        kw.get("params", params), arch, kw.get("cache", cache),
        kw.get("key_mask"), kw.get("position", jnp.int32(0)),
        kw.get("tokens", toks))
    assert ok()
    assert not ok(tokens=jnp.zeros((1,), jnp.int32))       # single row ->
    #                                                        greedy kernel
    assert not ok(tokens=jnp.zeros((9,), jnp.int32))       # R > 8 (VMEM)
    assert not ok(position=jnp.zeros((r,), jnp.int32))     # vector pos
    assert not ok(key_mask=jnp.ones((r, 32), bool))        # masked
    bf16_cache = init_cache(params, arch, enc, cache_len=32)
    assert not ok(cache=bf16_cache)                        # bf16 rings
    # a BEAMS-layout cache (one shared cross item, R rings) must NOT pass
    # the rows gate — that config belongs to supported_beams
    enc1 = encode(params, arch, jnp.asarray(rand_mel(batch=1, seed=1)))
    beam_cache = init_cache(params, arch, enc1, cross_dtype=jnp.int8,
                            cache_len=32, self_dtype=jnp.int8,
                            self_batch=r)
    assert not ok(cache=beam_cache)                        # cross rows != R
