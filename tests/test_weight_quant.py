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


def test_int4_grouped_weights_logit_deviation():
    """Group-wise int4 decoder weights (serving knob, off by default):
    the tiny RANDOM model is the worst case for argmax stability (its
    logits are near-flat, so any perturbation flips ties — unlike a
    trained checkpoint's peaked distributions), so the pinned contract is
    logit-level: bounded deviation + a runnable decode. The dense-path
    implementation itself is exactness-tested below."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from crisperwhisper_tpu.config import GenerationOptions
    from crisperwhisper_tpu.decoding import greedy_decode_jit
    from crisperwhisper_tpu.models import (decoder_forward, encode,
                                           init_params)
    from crisperwhisper_tpu.models.quantize import quantize_decoder_weights
    from helpers import TINY_SPECIALS, rand_mel, tiny_arch

    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    q4 = quantize_decoder_weights(params, bits=4)
    mel = rand_mel(batch=2, seed=9)
    enc = encode(params, arch, jnp.asarray(mel))
    ids = jnp.asarray([[TINY_SPECIALS.sot, 5, 9, 12]] * 2, jnp.int32)
    ref = np.asarray(decoder_forward(params, arch, ids, enc))
    got = np.asarray(decoder_forward(q4, arch, ids, enc))
    dev = np.abs(got - ref)
    scale = np.abs(ref).max()
    assert np.median(dev) / scale < 0.05, np.median(dev) / scale
    assert dev.max() / scale < 0.5, dev.max() / scale
    # and the full decode path runs with int4 weights
    prompt = jnp.full((2, 1), TINY_SPECIALS.sot, jnp.int32)
    opts = GenerationOptions(max_initial_timestamp_index=50)
    out = greedy_decode_jit(q4, arch, TINY_SPECIALS, opts, enc, prompt, 8)
    assert np.asarray(out.sequences).shape == (2, 9)


def test_int4_grouped_dense_impl_exact():
    """dense() on the grouped-int4 layout must equal the dequantized
    matmul exactly (the folding is an implementation detail)."""
    import jax.numpy as jnp
    import numpy as np
    from crisperwhisper_tpu.models.whisper import dense
    from crisperwhisper_tpu.models.quantize import (
        _quantize_dense_int4_grouped)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32) * .02)
    b = jnp.asarray(rng.standard_normal((128,)).astype(np.float32) * .01)
    x = jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32))
    q = _quantize_dense_int4_grouped({"w": w, "b": b}, group_size=32)
    assert q["w_q4"].dtype == jnp.uint8          # nibble-packed storage
    assert q["w_q4"].shape == (2, 16, 128)       # [G, gsz/2, d_out]
    from crisperwhisper_tpu.models.quantize import unpack_int4
    deq = (unpack_int4(q["w_q4"]).astype(jnp.float32)
           * q["w_gscale"][:, None, :].astype(jnp.float32)).reshape(64, 128)
    np.testing.assert_allclose(np.asarray(dense(x, q)),
                               np.asarray(x @ deq + b), atol=1e-6)


def test_int4_grouped_dequant_error_bound():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from crisperwhisper_tpu.models import init_params
    from crisperwhisper_tpu.models.quantize import (
        _quantize_dense_int4_grouped)
    from helpers import tiny_arch

    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(1))
    p = {"w": params["decoder"]["layers"]["mlp"]["fc1"]["w"][0]}
    q = _quantize_dense_int4_grouped(p, group_size=64)
    from crisperwhisper_tpu.models.quantize import unpack_int4
    w_q = unpack_int4(q["w_q4"])
    g, gsz, dout = w_q.shape
    deq = (w_q.astype(jnp.float32)
           * q["w_gscale"][:, None, :].astype(jnp.float32)
           ).reshape(g * gsz, dout)
    err = np.abs(np.asarray(deq) - np.asarray(p["w"], np.float32))
    # per-group amax/7 is the quantization step; error <= step/2 + eps
    wg = np.asarray(p["w"], np.float32).reshape(g, gsz, dout)
    step = np.abs(wg).max(1, keepdims=True) / 7.0
    # scales are stored bf16 (rel rounding <= 2^-9); a quantized value of
    # up to 7 amplifies that to 7 * scale * 2^-9 = step * ~0.014 on top
    # of the half-step quantization bound
    assert (err.reshape(g, gsz, dout) <= step / 2 + step * 0.02 + 1e-6).all()
