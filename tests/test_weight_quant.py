"""Weight-only int8 quantization: exactness of plumbing + quality."""

import numpy as np

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import greedy_decode_jit
from crisperwhisper_tpu.models import encode, init_params
from crisperwhisper_tpu.models.quantize import (quantization_error,
                                                quantize_decoder_weights)
from helpers import TINY_SPECIALS, rand_mel, tiny_arch


def test_dense_int8_path_matches_dequant():
    from crisperwhisper_tpu.models.whisper import dense
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 96)).astype(np.float32)) * 0.05
    b = jnp.asarray(rng.standard_normal(96).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((3, 64)).astype(np.float32))
    from crisperwhisper_tpu.models.quantize import _quantize_dense
    q = _quantize_dense({"w": w, "b": b})
    ref = dense(x, {"w": (q["w_q"].astype(jnp.float32)
                          * q["w_scale"].astype(jnp.float32)), "b": b})
    got = dense(x, q)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)


def test_quantized_decoder_token_agreement():
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    qparams = quantize_decoder_weights(params)
    err = quantization_error(params, qparams)
    assert all(v < 0.02 for v in err.values()), err
    mel = rand_mel(batch=4, seed=9)
    enc = encode(params, arch, jnp.asarray(mel))
    prompt = jnp.full((4, 1), TINY_SPECIALS.sot, jnp.int32)
    opts = GenerationOptions(max_initial_timestamp_index=50)
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc, prompt,
                            16)
    got = greedy_decode_jit(qparams, arch, TINY_SPECIALS, opts, enc, prompt,
                            16)
    agree = (np.asarray(ref.sequences) == np.asarray(got.sequences)).mean()
    assert agree >= 0.9, agree
