"""Compile-only probe ladder for the axon remote-compile backend.

Localizes server-side Mosaic/compile failures (HTTP 500
"tpu_compile_helper subprocess exit code 1") by AOT-compiling a ladder
of programs of increasing complexity — ShapeDtypeStruct operands only,
so nothing is uploaded or executed; each rung costs one remote compile.

Usage: python scripts/probe_pallas_compile.py [rungs]
  rungs: comma list from {plain,pallas_add,dtw,b1_tiny,b1_large}
         (default: all, in order)
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

import jax
import jax.numpy as jnp

RUNGS = (sys.argv[1].split(",") if len(sys.argv) > 1
         else ["plain", "pallas_add", "dtw", "b1_tiny", "b1_large"])


def probe(name, fn):
    t0 = time.perf_counter()
    try:
        fn()
        print(f"PROBE {name}: OK ({time.perf_counter() - t0:.1f} s)",
              flush=True)
    except Exception as e:
        print(f"PROBE {name}: FAIL ({time.perf_counter() - t0:.1f} s): "
              f"{type(e).__name__}", flush=True)
        traceback.print_exc()
        print(f"PROBE {name} FULL: {e}", flush=True)


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(tuple(shape), dtype)


def plain():
    jax.jit(lambda x: (x @ x).sum()).trace(
        _sds((256, 256), jnp.bfloat16)).lower().compile()


def pallas_add():
    from jax.experimental import pallas as pl

    def k(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0

    f = pl.pallas_call(k, out_shape=_sds((8, 128), jnp.float32))
    jax.jit(f).trace(_sds((8, 128), jnp.float32)).lower().compile()


def dtw():
    from crisperwhisper_tpu.ops.pallas_dtw import pallas_dtw_jump_times
    jax.jit(pallas_dtw_jump_times).trace(
        _sds((4, 64, 128), jnp.float32), _sds((4,), jnp.int32),
        _sds((4,), jnp.int32)).lower().compile()


def _b1(arch, ring):
    from test_mosaic_lowering import _fake_cache, _fake_quant_decoder
    from crisperwhisper_tpu.ops.pallas_decode_b1 import decode_step_b1
    params = _fake_quant_decoder(arch)
    cache = _fake_cache(arch, ring, jnp.int4)
    sel = _sds((arch.decoder_layers, arch.decoder_attention_heads, 4),
               jnp.float32)

    def fn(params, tokens, pos, cache, sel):
        return decode_step_b1(params, arch, tokens, pos, cache,
                              align_sel=sel, align_dtype=jnp.bfloat16,
                              interpret=False)

    jax.jit(fn).trace(params, _sds((1,), jnp.int32), _sds((), jnp.int32),
                      cache, sel).lower().compile()


def b1_tiny():
    from helpers import tiny_arch
    _b1(tiny_arch(), 32)


def b1_large():
    from crisperwhisper_tpu.config import WhisperArch
    _b1(WhisperArch.large_v3(), 384)


def _variant(step_fn, tokens_shape, ring, self_b=1, cross_b=1):
    from test_mosaic_lowering import _fake_cache, _fake_quant_decoder
    from crisperwhisper_tpu.config import WhisperArch
    arch = WhisperArch.large_v3()
    params = _fake_quant_decoder(arch)
    cache = _fake_cache(arch, ring, jnp.int4, self_b=self_b,
                        cross_b=cross_b)
    sel = _sds((arch.decoder_layers, arch.decoder_attention_heads, 4),
               jnp.float32)

    def fn(params, tokens, pos, cache, sel):
        return step_fn(params, arch, tokens, pos, cache, align_sel=sel,
                       align_dtype=jnp.bfloat16, interpret=False)

    jax.jit(fn).trace(params, _sds(tokens_shape, jnp.int32),
                      _sds((), jnp.int32), cache, sel).lower().compile()


def multi_large():
    from crisperwhisper_tpu.ops.pallas_decode_b1 import decode_step_b1_multi
    _variant(decode_step_b1_multi, (1, 6), 384)


def beams_large():
    from crisperwhisper_tpu.ops.pallas_decode_b1 import decode_step_b1_beams
    _variant(decode_step_b1_beams, (5,), 384, self_b=5)


def rows_large():
    from crisperwhisper_tpu.ops.pallas_decode_b1 import decode_step_rows
    _variant(decode_step_rows, (4,), 384, self_b=4, cross_b=4)


def main():
    print("devices:", jax.devices(), flush=True)
    fns = {"plain": plain, "pallas_add": pallas_add, "dtw": dtw,
           "b1_tiny": b1_tiny, "b1_large": b1_large,
           "multi_large": multi_large, "beams_large": beams_large,
           "rows_large": rows_large}
    for r in RUNGS:
        probe(r, fns[r])


if __name__ == "__main__":
    main()
