"""Fused QKV projection: exactness vs the unfused path."""

import numpy as np

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import greedy_decode_jit
from crisperwhisper_tpu.models import encode, init_params
from crisperwhisper_tpu.models.quantize import fuse_decoder_qkv
from helpers import TINY_SPECIALS, rand_mel, tiny_arch


def test_fused_qkv_decode_identical():
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    fused = fuse_decoder_qkv(params, arch.head_dim)
    assert "qkv" in fused["decoder"]["layers"]["self"]
    assert "q" not in fused["decoder"]["layers"]["self"]
    mel = rand_mel(batch=3, seed=12)
    enc = encode(params, arch, jnp.asarray(mel))
    prompt = jnp.full((3, 1), TINY_SPECIALS.sot, jnp.int32)
    opts = GenerationOptions(max_initial_timestamp_index=50)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            16)
    got = greedy_decode_jit(fused, arch, TINY_SPECIALS, opts, enc, prompt,
                            16)
    np.testing.assert_array_equal(np.asarray(ref.sequences),
                                  np.asarray(got.sequences))
    np.testing.assert_allclose(np.asarray(ref.sum_logprobs),
                               np.asarray(got.sum_logprobs), atol=1e-4)


def test_fused_qkv_teacher_forced_close():
    from crisperwhisper_tpu.models import decoder_forward
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(1))
    fused = fuse_decoder_qkv(params, arch.head_dim)
    mel = rand_mel(batch=1, seed=13)
    enc = encode(params, arch, jnp.asarray(mel))
    ids = jnp.asarray(np.array([[TINY_SPECIALS.sot, 4, 9, 12]], np.int32))
    ref = np.asarray(decoder_forward(params, arch, ids, enc))
    got = np.asarray(decoder_forward(fused, arch, ids, enc))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)
