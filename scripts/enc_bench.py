"""Encoder component microbench (large-v3 geometry, real TPU).

Breaks the ~35% MFU encoder into suspects: full layer stack (pallas vs
XLA attention), the dense/LN/MLP chain without attention, and the
attention kernel in isolation. Prints per-variant ms and implied MFU.

Usage: python scripts/enc_bench.py [batch]
Env: VARIANTS=comma list to restrict (full,xla,dense,attn)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import WhisperArch
from crisperwhisper_tpu.models import encode, init_params
from crisperwhisper_tpu.models.whisper import (_encoder_layer, _self_qkv,
                                               dense, gelu, layer_norm,
                                               mlp_block)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 24
ITERS = int(os.environ.get("ITERS", "3"))
PEAK_TFLOPS = 197.0    # v5e bf16


def timeit(name, fn, *args, flops=None):
    # reduce outputs to ONE scalar on device: large host transfers over
    # the axon tunnel are very slow and must never be inside the timer
    reduced = jax.jit(lambda *a: jax.tree.reduce(
        lambda acc, x: acc + jnp.sum(x).astype(jnp.float32),
        fn(*a), jnp.float32(0)))
    float(reduced(*args))                # compile + warm
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(reduced(*args))
    dt = (time.perf_counter() - t0) / ITERS
    mfu = (flops / dt / 1e12) / PEAK_TFLOPS * 100 if flops else float("nan")
    print(f"{name:28s} {dt * 1e3:8.1f} ms   MFU {mfu:5.1f}%", flush=True)
    return dt


def main():
    arch = WhisperArch.large_v3()
    dtype = jnp.bfloat16
    params = init_params(arch, jax.random.PRNGKey(0), dtype=dtype)
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal(
        (B, arch.num_mel_bins, 2 * arch.max_source_positions))
        .astype(np.float32) * 0.1)

    d, t, ffn = arch.d_model, arch.max_source_positions, arch.encoder_ffn_dim
    h, dh = arch.encoder_attention_heads, arch.head_dim
    L = arch.encoder_layers
    proj_flops = 4 * 2 * t * d * d * B * L
    attn_flops = 2 * 2 * t * t * d * B * L
    mlp_flops = 2 * 2 * t * d * ffn * B * L
    total_flops = proj_flops + attn_flops + mlp_flops
    print(f"B={B} large-v3: proj {proj_flops/1e12:.1f}T attn "
          f"{attn_flops/1e12:.1f}T mlp {mlp_flops/1e12:.1f}T "
          f"= {total_flops/1e12:.1f} TFLOP", flush=True)

    variants = os.environ.get("VARIANTS", "full,xla,dense,attn").split(",")

    if "full" in variants:
        os.environ["CW_FUSED_ATTENTION"] = "1"
        fn = jax.jit(lambda p, m: encode(p, arch, m.astype(dtype)))
        timeit("encode (pallas attn)", fn, params, mel, flops=total_flops)

    if "xla" in variants:
        os.environ["CW_FUSED_ATTENTION"] = "0"
        fn = jax.jit(lambda p, m: encode(p, arch, m.astype(dtype)))
        timeit("encode (xla attn)", fn, params, mel, flops=total_flops)
        os.environ["CW_FUSED_ATTENTION"] = "1"

    x0 = jnp.asarray(rng.standard_normal((B, t, d)).astype(np.float32),
                     dtype)

    if "dense" in variants:
        # layer stack with attention replaced by identity on q (keeps all
        # projections + LN + MLP, drops the attention einsums)
        def layer_noattn(x, lp):
            y = layer_norm(x, lp["ln1"])
            scale = dh ** -0.5
            q, k, v = _self_qkv(y, lp["attn"], h, scale)
            out = q + 0.0 * k + 0.0 * v      # keep projections live
            out = jnp.swapaxes(out, -3, -2).reshape(x.shape)
            x = x + dense(out, lp["attn"]["o"])
            x = x + mlp_block(layer_norm(x, lp["ln2"]), lp["mlp"])
            return x, None

        def stack_noattn(p, x):
            x, _ = jax.lax.scan(lambda c, lp: layer_noattn(c, lp),
                                x, p["encoder"]["layers"])
            return layer_norm(x, p["encoder"]["ln_post"])

        timeit("stack w/o attn einsums", jax.jit(stack_noattn), params, x0,
               flops=proj_flops + mlp_flops)

    if "attn" in variants:
        from crisperwhisper_tpu.ops.fused_attention import fused_attention
        q = jnp.asarray(rng.standard_normal((B, h, t, dh)), dtype)
        k = jnp.asarray(rng.standard_normal((B, h, t, dh)), dtype)
        v = jnp.asarray(rng.standard_normal((B, h, t, dh)), dtype)

        def attn32(q, k, v):
            def body(c, _):
                return fused_attention(c, k, v), None
            out, _ = jax.lax.scan(body, q, None, length=L)
            return out

        timeit("pallas attn x32", jax.jit(attn32), q, k, v,
               flops=attn_flops)

    if "mlp" in variants:
        def mlp32(p, x):
            def body(c, lp):
                return c + mlp_block(layer_norm(c, lp["ln2"]), lp["mlp"]), None
            out, _ = jax.lax.scan(body, x, p["encoder"]["layers"])
            return out
        timeit("LN+MLP x32", jax.jit(mlp32), params, x0, flops=mlp_flops)

    if "ln" in variants:
        def ln32(p, x):
            def body(c, lp):
                c = layer_norm(c, lp["ln1"])
                c = layer_norm(c, lp["ln2"])
                return c, None
            out, _ = jax.lax.scan(body, x, p["encoder"]["layers"])
            return out
        timeit("LN x64", jax.jit(ln32), params, x0, flops=None)


if __name__ == "__main__":
    main()
