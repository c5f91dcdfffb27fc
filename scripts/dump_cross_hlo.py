"""Dump the optimized HLO of one cross-attention decode chain (single
layer, large-v3 geometry) to see how XLA schedules the int4 dequant +
GEMV — diagnosing the 39%-of-peak cross-attention read efficiency
measured by scripts/dec_split_bench.py."""

import sys

import numpy as np

import jax
import jax.numpy as jnp

B, H, DH, T = 64, 20, 64, 1536


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, 1, DH)), jnp.bfloat16)
    # s4 arrays cannot cross the jit boundary on axon (see
    # models/quantize.py) — build them IN-GRAPH from int8 behind an
    # optimization barrier so the chain below sees a real s4 buffer
    k8 = jnp.asarray(rng.integers(-7, 8, (B, H, DH, T), dtype=np.int8))
    v8 = jnp.asarray(rng.integers(-7, 8, (B, H, DH, T), dtype=np.int8))
    ks = jnp.asarray(rng.standard_normal((B, H, T)) * .01, jnp.bfloat16)
    vs = jnp.asarray(rng.standard_normal((B, H, T)) * .01, jnp.bfloat16)

    def chain(q, k8, v8, ks, vs):
        k, v = jax.lax.optimization_barrier(
            (k8.astype(jnp.int4), v8.astype(jnp.int4)))
        s = jnp.einsum("bhqd,bhdt->bhqt", q, k.astype(q.dtype),
                       preferred_element_type=jnp.float32)
        s = s * ks.astype(jnp.float32)[:, :, None, :]
        p = jax.nn.softmax(s, axis=-1)
        pv = p * vs.astype(jnp.float32)[:, :, None, :]
        out = jnp.einsum("bhqt,bhdt->bhqd", pv.astype(q.dtype),
                         v.astype(q.dtype),
                         preferred_element_type=jnp.float32)
        return out, p

    lowered = jax.jit(chain).lower(q, k8, v8, ks, vs)
    compiled = lowered.compile()
    txt = compiled.as_text()
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cross_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")
    # quick summary: top-level fusions and any copies/converts outside dots
    for line in txt.splitlines():
        ls = line.strip()
        if (ls.startswith("ROOT") or " = fusion" in ls or " = copy" in ls
                or "custom-call" in ls or " = convert" in ls):
            print(ls[:160])


if __name__ == "__main__":
    main()
