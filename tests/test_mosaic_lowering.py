"""Compile-only Mosaic LOWERING smokes for every whole-step kernel
variant (VERDICT r3 item 1: "interpret green, Mosaic red" must never
ship again).

AOT lowering with ``lowering_platforms=("tpu",)`` runs the full Pallas →
Mosaic MLIR module build on the host — the stage that rejected all four
round-3 kernels (erfc gelu, gather shape mismatch) — with no TPU and no
device memory: operands are ShapeDtypeStructs, so even the REAL serving
geometry (large-v3, K=1500, ring 384) lowers in seconds on the CPU
backend. Mosaic's later machine-code pass still only runs on the chip
(scripts/b1_kernel_bench.py + the bench rows cover that), but every
lowering-class rejection is caught here, in the suite.
"""

import jax
import jax.numpy as jnp
import pytest

from crisperwhisper_tpu.config import WhisperArch
from crisperwhisper_tpu.models.whisper import DecoderCache
from crisperwhisper_tpu.ops.pallas_decode_b1 import (
    decode_step_b1, decode_step_b1_beams, decode_step_b1_multi,
    decode_step_rows)
from helpers import tiny_arch


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(tuple(shape), dtype)


def _fake_quant_decoder(arch):
    """ShapeDtypeStruct pytree of the quantized fused-qkv decoder params
    the kernel consumes (shapes as models/quantize.py produces them)."""
    L, d, f = arch.decoder_layers, arch.d_model, arch.decoder_ffn_dim

    def dense_q(k, n):
        return {"w_q": _sds((L, k, n), jnp.int8),
                "w_scale": _sds((L, 1, n), jnp.bfloat16),
                "b": _sds((L, n), jnp.bfloat16)}

    def ln2():
        return {"scale": _sds((L, d), jnp.bfloat16),
                "bias": _sds((L, d), jnp.bfloat16)}

    return {"decoder": {
        "layers": {
            "ln1": ln2(), "ln2": ln2(), "ln3": ln2(),
            "self": {"qkv": dense_q(d, 3 * d), "o": dense_q(d, d)},
            "cross": {"q": dense_q(d, d), "o": dense_q(d, d)},
            "mlp": {"fc1": dense_q(d, f), "fc2": dense_q(f, d)},
        },
        "tok_emb": _sds((arch.vocab_size, d), jnp.bfloat16),
        "pos_emb": _sds((arch.max_target_positions, d), jnp.bfloat16),
        "ln": {"scale": _sds((d,), jnp.bfloat16),
               "bias": _sds((d,), jnp.bfloat16)},
    }}


def _fake_cache(arch, ring, cross_dtype, self_b=1, cross_b=1, k_enc=None):
    L = arch.decoder_layers
    h = arch.decoder_attention_heads
    dh = arch.head_dim
    k_enc = k_enc or arch.max_source_positions
    return DecoderCache(
        cross_k=_sds((L, cross_b, h, dh, k_enc), cross_dtype),
        cross_v=_sds((L, cross_b, h, dh, k_enc), cross_dtype),
        cross_k_scale=_sds((L, cross_b, h, k_enc), jnp.bfloat16),
        cross_v_scale=_sds((L, cross_b, h, k_enc), jnp.bfloat16),
        self_k=_sds((L, self_b, h, dh, ring), jnp.int8),
        self_v=_sds((L, self_b, h, dh, ring), jnp.int8),
        self_k_scale=_sds((L, self_b, h, ring), jnp.bfloat16),
        self_v_scale=_sds((L, self_b, h, ring), jnp.bfloat16),
    )


def _lower(step_fn, arch, tokens_sds, ring, cross_dtype,
           self_b=1, cross_b=1, n_align=4):
    params = _fake_quant_decoder(arch)
    cache = _fake_cache(arch, ring, cross_dtype,
                        self_b=self_b, cross_b=cross_b)
    sel = _sds((arch.decoder_layers, arch.decoder_attention_heads,
                n_align), jnp.float32)
    pos = _sds((), jnp.int32)

    def fn(params, tokens, pos, cache, sel):
        return step_fn(params, arch, tokens, pos, cache, align_sel=sel,
                       align_dtype=jnp.bfloat16, interpret=False)

    # .lower(platforms=tpu) builds the Mosaic module on the host — this
    # is exactly where round 3's four bench rows died.
    jax.jit(fn).trace(params, tokens_sds, pos, cache, sel).lower(
        lowering_platforms=("tpu",))


GEOMETRIES = [
    pytest.param("tiny", id="tiny"),
    pytest.param("large_v3", id="large_v3"),
]


def _arch(name):
    return tiny_arch() if name == "tiny" else WhisperArch.large_v3()


@pytest.mark.parametrize("cross_dtype", [jnp.int8, jnp.int4],
                         ids=["int8", "int4"])
@pytest.mark.parametrize("geom", GEOMETRIES)
def test_lower_b1(geom, cross_dtype):
    arch = _arch(geom)
    _lower(decode_step_b1, arch, _sds((1,), jnp.int32),
           ring=384 if geom == "large_v3" else 32, cross_dtype=cross_dtype)


@pytest.mark.parametrize("cross_dtype", [jnp.int8, jnp.int4],
                         ids=["int8", "int4"])
@pytest.mark.parametrize("geom", GEOMETRIES)
def test_lower_b1_multi(geom, cross_dtype):
    arch = _arch(geom)
    _lower(decode_step_b1_multi, arch, _sds((1, 6), jnp.int32),
           ring=384 if geom == "large_v3" else 32, cross_dtype=cross_dtype)


@pytest.mark.parametrize("geom", GEOMETRIES)
def test_lower_beams(geom):
    arch = _arch(geom)
    _lower(decode_step_b1_beams, arch, _sds((5,), jnp.int32),
           ring=384 if geom == "large_v3" else 32, cross_dtype=jnp.int4,
           self_b=5, cross_b=1)


@pytest.mark.parametrize("geom", GEOMETRIES)
def test_lower_rows(geom):
    arch = _arch(geom)
    _lower(decode_step_rows, arch, _sds((4,), jnp.int32),
           ring=384 if geom == "large_v3" else 32, cross_dtype=jnp.int4,
           self_b=4, cross_b=4)
