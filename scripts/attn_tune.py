"""Tune the encoder fused-attention kernel block size on the real chip.

Times ops/fused_attention.fused_attention at large-v3 encoder geometry
([B, 20, 1500, 64]) across q-block sizes, plus the XLA eager attention
for reference. Prints implied attention-only MFU.

Usage: python scripts/attn_tune.py [batch]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.ops.fused_attention import fused_attention

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
H, T, D = 20, 1500, 64
ITERS = int(os.environ.get("ITERS", "5"))
PEAK = 197e12


REPS = 8        # sequential calls chained INSIDE one jitted program, so
#                 per-dispatch tunnel latency (tens of ms over axon) is
#                 amortized 1/REPS and doesn't swamp the kernel time


def chain(attn):
    def run(q, k, v):
        acc = q
        for _ in range(REPS):
            acc = attn(acc, k, v).astype(q.dtype)
        return jnp.sum(acc.astype(jnp.float32))
    return jax.jit(run)


def timeit(fn, *args):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        float(fn(*args))
    return (time.perf_counter() - t0) / ITERS / REPS


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32)
                    * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32)
                    * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, T, D)).astype(np.float32)
                    * 0.1, jnp.bfloat16)
    flops = 4 * B * H * T * T * D

    def xla_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                          preferred_element_type=v.dtype)

    dt = timeit(chain(xla_attn), q, k, v)
    print(f"xla eager          {dt * 1e3:7.1f} ms  MFU "
          f"{flops / dt / PEAK * 100:5.1f}%", flush=True)
    blocks = tuple(int(x) for x in os.environ.get(
        "BLOCKS", "256,512,768").split(","))
    for bq in blocks:
        fn = chain(lambda q, k, v, bq=bq: fused_attention(q, k, v,
                                                          block_q=bq))
        dt = timeit(fn, q, k, v)
        print(f"pallas block_q={bq:4d} {dt * 1e3:7.1f} ms  MFU "
              f"{flops / dt / PEAK * 100:5.1f}%", flush=True)

    # fast-exp sweep (accuracy-gated softmax variants; EXPS env to pick)
    exps = [x for x in os.environ.get(
        "EXPS", "bf16,exp2,bf16_exp2").split(",") if x]
    ref = np.asarray(fused_attention(q, k, v), np.float32)
    for fe in exps:
        fn = chain(lambda q, k, v, fe=fe: fused_attention(q, k, v,
                                                          fast_exp=fe))
        dt = timeit(fn, q, k, v)
        got = np.asarray(fused_attention(q, k, v, fast_exp=fe), np.float32)
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"pallas exp={fe:10s} {dt * 1e3:7.1f} ms  MFU "
              f"{flops / dt / PEAK * 100:5.1f}%  max-rel-err {err:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
