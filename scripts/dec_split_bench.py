"""Decode-step cost attribution (large-v3 geometry, real TPU).

Times a 128-step chained decode loop with individual sublayers ablated
(decode_step(ablate=...)) to attribute the per-step budget between
self-attention (ring read/write), cross-attention (the dominant int4
cache read), MLP/weight streaming, and the LM head (tok_emb read).
All steps run inside ONE jitted fori_loop per variant so the axon
per-dispatch tunnel latency is amortized (NOTES_ROUND2.md quirk list).

Usage: python scripts/dec_split_bench.py [batch] [n_steps]
Env: ITERS, RING (self ring length, default 256),
     VARIANTS comma list (default all).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import WhisperArch
from crisperwhisper_tpu.models import (alignment_selector, decode_step,
                                       init_cache, init_params)
from crisperwhisper_tpu.models.quantize import (fuse_decoder_qkv,
                                                quantize_decoder_weights)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
N = int(sys.argv[2]) if len(sys.argv) > 2 else 128
ITERS = int(os.environ.get("ITERS", "3"))
RING = int(os.environ.get("RING", "256"))
# cache dtypes (serving defaults int4 cross / int8 self); CROSS=int8 is
# the int8-MXU A/B partner — with an int8 cache the MXU dot needs no
# per-element widening pass at all (experiments/decode_int8_mxu.py)
CROSS = {"int4": jnp.int4, "int8": jnp.int8,
         "bf16": jnp.bfloat16}[os.environ.get("CROSS", "int4")]
SELF = {"int4": jnp.int4, "int8": jnp.int8,
        "bf16": jnp.bfloat16}[os.environ.get("SELF", "int8")]

VARIANTS = {
    # name: sublayers removed
    "full": frozenset(),
    "-selfwrite": frozenset({"selfwrite"}),   # ring scatters only
    "-lmhead": frozenset({"lmhead"}),
    "-cross": frozenset({"cross"}),
    "-self": frozenset({"self"}),
    "-mlp": frozenset({"mlp"}),
    "only-cross": frozenset({"self", "mlp", "lmhead"}),
    "only-self": frozenset({"cross", "mlp", "lmhead"}),
    "only-mlp": frozenset({"cross", "self", "lmhead"}),
    "empty": frozenset({"cross", "self", "mlp", "lmhead"}),
}


def main():
    arch = WhisperArch.large_v3()
    params = init_params(arch, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    params = quantize_decoder_weights(fuse_decoder_qkv(params, arch.head_dim))
    heads = tuple(((2 + 2 * i) % arch.decoder_layers,
                   i % arch.decoder_attention_heads) for i in range(15))
    align_sel = jnp.asarray(alignment_selector(arch, heads))
    rng = np.random.default_rng(0)
    enc = jnp.asarray(rng.standard_normal(
        (B, arch.max_source_positions, arch.d_model)).astype(np.float32)
        * 0.05, jnp.bfloat16)
    tokens0 = jnp.full((B,), 50258, jnp.int32)
    n_k = enc.shape[1]

    def make_loop(ablate):
        def run(params, tokens0, enc):
            # cache built IN-GRAPH: s4 arrays cannot be jit arguments on
            # the axon backend (see models/quantize.py caveat)
            cache = init_cache(params, arch, enc, cross_dtype=CROSS,
                               self_dtype=SELF, cache_len=RING)
            acc0 = jnp.zeros((B, 15, n_k), jnp.float32)

            def body(i, carry):
                tokens, cache, acc = carry
                logits, cache, align = decode_step(
                    params, arch, tokens, i, cache, align_sel=align_sel,
                    align_dtype=jnp.bfloat16, ablate=ablate)
                return (jnp.argmax(logits, -1).astype(jnp.int32), cache,
                        acc + align)

            tokens, cache, acc = jax.lax.fori_loop(
                0, N, body, (tokens0, cache, acc0))
            # tiny host-syncable scalar depending on everything
            return tokens[0] + (acc.sum() / 1e9).astype(jnp.int32)
        return jax.jit(run)

    names = os.environ.get("VARIANTS")
    names = names.split(",") if names else list(VARIANTS)
    results = {}
    for name in names:
        fn = make_loop(VARIANTS[name])
        int(fn(params, tokens0, enc))                # compile + warm
        t0 = time.perf_counter()
        for _ in range(ITERS):
            int(fn(params, tokens0, enc))
        dt = (time.perf_counter() - t0) / ITERS
        results[name] = dt / N * 1e3
        print(f"{name:12s} {dt:7.3f} s  = {dt / N * 1e3:6.2f} ms/step",
              flush=True)
    if "full" in results:
        full = results["full"]
        for name, v in results.items():
            if name.startswith("-"):
                print(f"marginal {name[1:]:8s} {full - v:6.2f} ms/step")


if __name__ == "__main__":
    main()
