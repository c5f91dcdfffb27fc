"""B=1 whole-step Pallas decoder kernel vs the XLA decode_step (real TPU).

Times N chained decode steps inside ONE jitted fori_loop per variant
(axon per-dispatch tunnel latency must be amortized — NOTES_ROUND2.md),
at large-v3 geometry, int8 weights (fused qkv), int8 self ring,
int4/int8 cross cache.

Usage: python scripts/b1_kernel_bench.py [n_steps]
Env: ITERS (default 3), RING (default 384), CROSS (int4|int8, default
int4), VARIANTS ("xla,kernel" | "xla_multi,kernel_multi" w/ BLK |
"xla_beam,kernel_beam" w/ NB — the hf-pipeline-default num_beams=5
single-stream shape | "xla_rows,kernel_rows" w/ NROWS — small-batch
multi-stream decode, per-row cross caches).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("PLATFORM"):    # the axon plugin overrides JAX_PLATFORMS;
    jax.config.update("jax_platforms", os.environ["PLATFORM"])  # this wins

import jax.numpy as jnp

from crisperwhisper_tpu.config import WhisperArch
from crisperwhisper_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache(tpu_only=True)   # a lost tunnel must not cost the
#                                          (multi-minute) compile again
from crisperwhisper_tpu.models import (alignment_selector, decode_step,
                                       init_cache, init_params)
from crisperwhisper_tpu.models.quantize import (fuse_decoder_qkv,
                                                quantize_decoder_weights)
from crisperwhisper_tpu.ops.pallas_decode_b1 import decode_step_b1

N = int(sys.argv[1]) if len(sys.argv) > 1 else 128
ITERS = int(os.environ.get("ITERS", "3"))
RING = int(os.environ.get("RING", "384"))
CROSS = os.environ.get("CROSS", "int4")
VARIANTS = os.environ.get("VARIANTS", "xla,kernel").split(",")


def main():
    arch = WhisperArch.large_v3()

    # Param prep pitfalls on axon (each measured >14 min): eager
    # per-leaf init is hundreds of tunnel dispatches; a jitted build with
    # CONSTANT inputs gets constant-folded on the host single-threaded;
    # jitting the full init+quantize program needs a slow remote compile;
    # and host numpy + device_put moves ~1 GB through the ~1 MB/s tunnel
    # (834 s measured, and a transient UNAVAILABLE loses the whole run).
    # Fastest + robust: ONE lean jitted randint program generates the
    # already-quantized pytree entirely on device — values are arbitrary
    # (timing/parity only needs both variants to read the SAME arrays).
    t0 = time.perf_counter()
    L, d, f = arch.decoder_layers, arch.d_model, arch.decoder_ffn_dim

    @jax.jit
    def build(key):
        kit = iter(jax.random.split(key, 40))

        def dense_q(k, n):
            return {"w_q": jax.random.randint(next(kit), (L, k, n),
                                              -127, 128, jnp.int8),
                    "w_scale": jnp.full((L, 1, n), 0.02 / 127,
                                        jnp.bfloat16),
                    "b": (jax.random.normal(next(kit), (L, n),
                                            jnp.bfloat16) * 0.01)}

        def ln():
            return {"scale": jnp.ones((L, d), jnp.bfloat16),
                    "bias": (jax.random.normal(next(kit), (L, d),
                                               jnp.bfloat16) * 0.01)}

        return {"decoder": {
            "layers": {
                "ln1": ln(), "ln2": ln(), "ln3": ln(),
                "self": {"qkv": dense_q(d, 3 * d), "o": dense_q(d, d)},
                "cross": {"q": dense_q(d, d), "k": dense_q(d, d),
                          "v": dense_q(d, d), "o": dense_q(d, d)},
                "mlp": {"fc1": dense_q(d, f), "fc2": dense_q(f, d)},
            },
            "tok_emb": jax.random.normal(next(kit), (arch.vocab_size, d),
                                         jnp.bfloat16) * 0.02,
            "pos_emb": jax.random.normal(
                next(kit), (arch.max_target_positions, d),
                jnp.bfloat16) * 0.02,
            "ln": {"scale": jnp.ones((d,), jnp.bfloat16),
                   "bias": jnp.zeros((d,), jnp.bfloat16)},
        }}

    params = jax.block_until_ready(build(jax.random.PRNGKey(0)))
    print(f"# param build: {time.perf_counter() - t0:.0f} s", flush=True)
    enc = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (1, arch.max_source_positions, arch.d_model)).astype(np.float32),
        jnp.bfloat16)
    cross_dtype = jnp.int4 if CROSS == "int4" else jnp.int8
    ck = dict(cross_dtype=cross_dtype, cache_len=RING,
              self_dtype=jnp.int8)
    sel = jnp.asarray(alignment_selector(
        arch, ((1, 0), (2, 1), (3, 2), (5, 4))))

    # NB on jit-argument hygiene for the axon backend (both found on
    # chip, round 4):
    #  * `params` must be an explicit jit ARGUMENT, never a closure
    #    capture — closed-over arrays are embedded into the serialized
    #    HLO, and ~0.8 GB of quantized weights blows the tunnel's
    #    remote-compile request limit (HTTP 413 "length limit
    #    exceeded"; also the real cause of round 3's 35-min-then-dead
    #    compiles).
    #  * the KV CACHE must be built INSIDE the jitted program, never
    #    passed as an argument: int4 arrays created at top level carry
    #    a layout without sub_byte_element_size_in_bits=4 while the
    #    executable expects it, and axon's relayout device_put loops
    #    forever (_array_shard_arg -> device_put -> _array_shard_arg,
    #    RecursionError). The serving library already creates caches
    #    in-graph, which is why bench.py never hit this. Cache init
    #    adds ~2 ms of cross-projection work per timed call
    #    (<2% of a 128-step loop).
    def loop(step_fn, cache_kwargs):
        @jax.jit
        def run(params, enc, tok0):
            cache = init_cache(params, arch, enc, **cache_kwargs)
            def body(i, carry):
                tok, cache, acc = carry
                logits, cache, align = step_fn(params, arch, tok, i, cache,
                                               align_sel=sel)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, cache, acc + align.sum())
            tok, cache, acc = jax.lax.fori_loop(
                0, N, body, (tok0, cache, jnp.float32(0)))
            return tok, acc
        return run

    def loop_multi(step_fn, blk, cache_kwargs):
        """Chained M-token verify blocks (the assisted-decoding shape):
        each block feeds its own argmax tail forward."""
        @jax.jit
        def run(params, enc, tok0):
            cache = init_cache(params, arch, enc, **cache_kwargs)
            def body(i, carry):
                tok, cache, acc = carry
                block = jnp.concatenate(
                    [tok[:, None], jnp.full((1, blk - 1), 7, jnp.int32)],
                    axis=1)
                logits, cache, align = step_fn(
                    params, arch, block, i * blk, cache, align_sel=sel)
                nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
                return (nxt, cache, acc + align.sum())
            tok, cache, acc = jax.lax.fori_loop(
                0, N // blk, body, (tok0, cache, jnp.float32(0)))
            return tok, acc
        return run

    for name in VARIANTS:
        tok0 = jnp.asarray([7], jnp.int32)
        enc_v = enc
        if name.endswith("_multi"):
            from crisperwhisper_tpu.models import decode_step_multi
            from crisperwhisper_tpu.ops.pallas_decode_b1 import (
                decode_step_b1_multi)
            blk = int(os.environ.get("BLK", "6"))
            fn = loop_multi(decode_step_multi if name == "xla_multi"
                            else decode_step_b1_multi, blk, ck)
            denom = (N // blk) * blk
        elif name.endswith("_beam"):
            import functools
            from crisperwhisper_tpu.ops.pallas_decode_b1 import (
                decode_step_b1_beams)
            nb = int(os.environ.get("NB", "5"))
            fn = loop(functools.partial(decode_step, beam_groups=nb)
                      if name == "xla_beam" else decode_step_b1_beams,
                      dict(ck, self_batch=nb))
            denom = N          # per beam-STEP (all NB rows advance once)
            tok0 = jnp.arange(7, 7 + nb, dtype=jnp.int32)
        elif name.endswith("_rows"):
            from crisperwhisper_tpu.ops.pallas_decode_b1 import (
                decode_step_rows)
            nr = int(os.environ.get("NROWS", "4"))
            enc_v = jnp.broadcast_to(enc, (nr,) + enc.shape[1:])
            fn = loop(decode_step if name == "xla_rows"
                      else decode_step_rows, ck)
            denom = N          # per STEP (all NROWS streams advance once)
            tok0 = jnp.arange(7, 7 + nr, dtype=jnp.int32)
        else:
            fn = loop(decode_step if name == "xla" else decode_step_b1, ck)
            denom = N
        # Per-variant retry: the tunnel's remote-compile POST dies with
        # "Broken pipe" on ~30-min compiles (NOTES_ROUND4 finding 5), but
        # the terminal keeps/stages finished compiles keyed by
        # (mlir, options) byte-identity — an immediate retry of the SAME
        # program can hit that cache and return fast. One variant dying
        # must also never skip the remaining variants.
        attempts = int(os.environ.get("ATTEMPTS", "3"))
        out = None
        for attempt in range(attempts):
            try:
                t0 = time.perf_counter()
                out = jax.block_until_ready(fn(params, enc_v, tok0))
                compile_s = time.perf_counter() - t0
                break
            except Exception as e:                    # transport/compile
                print(f"{name}: attempt {attempt + 1}/{attempts} failed: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                if attempt == attempts - 1:           # full detail once
                    import traceback
                    traceback.print_exc()
                    print(f"{name}: FULL ERROR: {e}", flush=True)
        if out is None:
            continue
        best = float("inf")
        for _ in range(ITERS):
            t0 = time.perf_counter()
            out = jax.block_until_ready(fn(params, enc_v, tok0))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s} {best:7.3f} s = {best / denom * 1e3:6.2f} "
              f"ms/token (compile {compile_s:.0f} s, tok {int(out[0][0])}, "
              f"acc {float(out[1]):.3e})", flush=True)


if __name__ == "__main__":
    main()
