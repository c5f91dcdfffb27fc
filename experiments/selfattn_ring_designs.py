"""Isolated self-attention ring designs (round 3, real TPU).

The -selfwrite ablation showed the per-layer ring scatters cost
6.9 ms/step at B=64 (scripts/dec_split_bench.py). This microbench
compares ring-update designs OUTSIDE the full decode step so variants
compile in ~1 min each instead of ~4:

  A  in-carry per-layer dynamic-update-slice (round-2 serving design)
  B  deferred: ring as scan xs, merged-softmax new column, ONE batched
     post-scan write (round-3 attempt)
  C  in-carry, K/V fused into ONE [L,B,H,2Dh,T] ring (2 scatters not 4)
  D  read-only ring + merged softmax, NO write at all (lower bound of
     B's attention form; write cost = B - D)
  E  like B but the ring rides the step loop carry UNTOUCHED by scan
     (scan closes over it) - isolates scan-xs slicing cost vs B

Geometry: L=32 layers, B=64, H=20, Dh=64, T(ring)=256, int8 ring +
per-position scales, bf16 activations. Loop: 64 steps per program.

Usage: python experiments/selfattn_ring_designs.py [variants...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

L, B, H, DH, T = 32, 64, 20, 64, 256
N_STEPS = 64
ITERS = int(os.environ.get("ITERS", "3"))
DTYPE = jnp.bfloat16


def _quantize(x, qmax=127.0):
    amax = jnp.max(jnp.abs(x), axis=-2, keepdims=True)
    sc = jnp.maximum(amax, 1e-8) / qmax
    return jnp.clip(jnp.round(x / sc), -qmax, qmax).astype(jnp.int8), sc


def make_inputs():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, 1, DH)) * 0.1, DTYPE)
    kv = jnp.asarray(rng.standard_normal((L, B, H, DH, 1)) * 0.1,
                     jnp.float32)
    ring_k = jnp.zeros((L, B, H, DH, T), jnp.int8)
    ring_v = jnp.zeros((L, B, H, DH, T), jnp.int8)
    ring_ks = jnp.ones((L, B, H, T), jnp.bfloat16)
    ring_vs = jnp.ones((L, B, H, T), jnp.bfloat16)
    return q, kv, ring_k, ring_v, ring_ks, ring_vs


def attn_old(q, k_all, v_all, ks, vs, mask):
    s = jnp.einsum("bhqd,bhdt->bhqt", q, k_all.astype(q.dtype),
                   preferred_element_type=jnp.float32)
    s = s * ks.astype(jnp.float32)[:, :, None, :]
    s = jnp.where(mask, s, jnp.float32(-1e9))
    p = jax.nn.softmax(s, axis=-1)
    pv = p * vs.astype(jnp.float32)[:, :, None, :]
    return jnp.einsum("bhqt,bhdt->bhqd", pv.astype(q.dtype),
                      v_all.astype(q.dtype),
                      preferred_element_type=jnp.float32).astype(q.dtype)


def attn_merged(q, ring_k, ring_v, ks, vs, mask_old, k_col, v_col,
                k_sc, v_sc):
    s_old = jnp.einsum("bhqd,bhdt->bhqt", q, ring_k.astype(q.dtype),
                       preferred_element_type=jnp.float32)
    s_old = s_old * ks.astype(jnp.float32)[:, :, None, :]
    s_old = jnp.where(mask_old, s_old, jnp.float32(-1e9))
    s_new = jnp.einsum("bhqd,bhdt->bhqt", q, k_col.astype(q.dtype),
                       preferred_element_type=jnp.float32)
    s_new = s_new * k_sc.astype(jnp.float32)
    m = jnp.maximum(jnp.max(s_old, axis=-1, keepdims=True), s_new)
    e_old = jnp.exp(s_old - m)
    e_new = jnp.exp(s_new - m)
    denom = jnp.sum(e_old, axis=-1, keepdims=True) + e_new
    p_old = (e_old / denom) * vs.astype(jnp.float32)[:, :, None, :]
    p_new = (e_new / denom) * v_sc.astype(jnp.float32)
    out = jnp.einsum("bhqt,bhdt->bhqd", p_old.astype(q.dtype),
                     ring_v.astype(q.dtype),
                     preferred_element_type=jnp.float32)
    return (out + p_new.astype(q.dtype)
            * jnp.swapaxes(v_col, -1, -2).astype(q.dtype)).astype(q.dtype)


def variant_A(q, kv, rk, rv, rks, rvs):
    pos_ids = jnp.arange(T)

    def step(i, carry):
        rk, rv, rks, rvs, acc = carry
        mask = (pos_ids <= i)[None, None, None, :]

        def layer(c, xs):
            rk, rv, rks, rvs, acc = c
            li, col = xs
            k_col, k_sc = _quantize(col + acc.astype(jnp.float32)
                                    .mean() * 1e-9)
            v_col, v_sc = _quantize(col * 0.5)
            rks = jax.lax.dynamic_update_slice(
                rks, k_sc[None, :, :, 0, :].astype(rks.dtype),
                (li, 0, 0, i))
            rvs = jax.lax.dynamic_update_slice(
                rvs, v_sc[None, :, :, 0, :].astype(rvs.dtype),
                (li, 0, 0, i))
            rk = jax.lax.dynamic_update_slice(rk, k_col[None],
                                              (li, 0, 0, 0, i))
            rv = jax.lax.dynamic_update_slice(rv, v_col[None],
                                              (li, 0, 0, 0, i))
            k_all = jax.lax.dynamic_index_in_dim(rk, li, 0, False)
            v_all = jax.lax.dynamic_index_in_dim(rv, li, 0, False)
            out = attn_old(q, k_all, v_all,
                           jax.lax.dynamic_index_in_dim(rks, li, 0, False),
                           jax.lax.dynamic_index_in_dim(rvs, li, 0, False),
                           mask)
            return (rk, rv, rks, rvs, acc + out.astype(jnp.float32)), 0

        (rk, rv, rks, rvs, acc), _ = jax.lax.scan(
            layer, (rk, rv, rks, rvs, acc), (jnp.arange(L), kv))
        return rk, rv, rks, rvs, acc

    acc0 = jnp.zeros((B, H, 1, DH), jnp.float32)
    out = jax.lax.fori_loop(0, N_STEPS, step, (rk, rv, rks, rvs, acc0))
    return out[4].sum()


def variant_B(q, kv, rk, rv, rks, rvs):
    pos_ids = jnp.arange(T)

    def step(i, carry):
        rk, rv, rks, rvs, acc = carry
        mask_old = (pos_ids < i)[None, None, None, :]

        def layer(c, xs):
            acc = c
            col, lrk, lrv, lrks, lrvs = xs
            k_col, k_sc = _quantize(col + acc.astype(jnp.float32)
                                    .mean() * 1e-9)
            v_col, v_sc = _quantize(col * 0.5)
            out = attn_merged(q, lrk, lrv, lrks, lrvs, mask_old,
                              k_col, v_col, k_sc, v_sc)
            return acc + out.astype(jnp.float32), \
                (k_col, v_col, k_sc[:, :, 0, :].astype(rks.dtype),
                 v_sc[:, :, 0, :].astype(rvs.dtype))

        acc, cols = jax.lax.scan(layer, acc, (kv, rk, rv, rks, rvs))
        k_cols, v_cols, k_scs, v_scs = cols
        rk = jax.lax.dynamic_update_slice(rk, k_cols, (0, 0, 0, 0, i))
        rv = jax.lax.dynamic_update_slice(rv, v_cols, (0, 0, 0, 0, i))
        rks = jax.lax.dynamic_update_slice(rks, k_scs, (0, 0, 0, i))
        rvs = jax.lax.dynamic_update_slice(rvs, v_scs, (0, 0, 0, i))
        return rk, rv, rks, rvs, acc

    acc0 = jnp.zeros((B, H, 1, DH), jnp.float32)
    out = jax.lax.fori_loop(0, N_STEPS, step, (rk, rv, rks, rvs, acc0))
    return out[4].sum()


def variant_C(q, kv, rk, rv, rks, rvs):
    rkv = jnp.concatenate([rk, rv], axis=3)          # [L,B,H,2Dh,T]
    rs = jnp.stack([rks, rvs], axis=3)               # [L,B,H,2,T]
    pos_ids = jnp.arange(T)

    def step(i, carry):
        rkv, rs, acc = carry
        mask = (pos_ids <= i)[None, None, None, :]

        def layer(c, xs):
            rkv, rs, acc = c
            li, col = xs
            k_col, k_sc = _quantize(col + acc.astype(jnp.float32)
                                    .mean() * 1e-9)
            v_col, v_sc = _quantize(col * 0.5)
            kv_col = jnp.concatenate([k_col, v_col], axis=2)  # [B,H,2Dh,1]
            sc_col = jnp.concatenate([k_sc, v_sc], axis=2)    # [B,H,2,1]
            rkv = jax.lax.dynamic_update_slice(rkv, kv_col[None],
                                               (li, 0, 0, 0, i))
            rs = jax.lax.dynamic_update_slice(
                rs, sc_col[None].astype(rs.dtype), (li, 0, 0, 0, i))
            kv_all = jax.lax.dynamic_index_in_dim(rkv, li, 0, False)
            s_all = jax.lax.dynamic_index_in_dim(rs, li, 0, False)
            out = attn_old(q, kv_all[:, :, :DH], kv_all[:, :, DH:],
                           s_all[:, :, 0], s_all[:, :, 1], mask)
            return (rkv, rs, acc + out.astype(jnp.float32)), 0

        (rkv, rs, acc), _ = jax.lax.scan(
            layer, (rkv, rs, acc), (jnp.arange(L), kv))
        return rkv, rs, acc

    acc0 = jnp.zeros((B, H, 1, DH), jnp.float32)
    out = jax.lax.fori_loop(0, N_STEPS, step, (rkv, rs, acc0))
    return out[2].sum()


def variant_D(q, kv, rk, rv, rks, rvs):
    pos_ids = jnp.arange(T)

    def step(i, carry):
        rk, rv, rks, rvs, acc = carry
        mask_old = (pos_ids < i)[None, None, None, :]

        def layer(c, xs):
            acc = c
            col, lrk, lrv, lrks, lrvs = xs
            k_col, k_sc = _quantize(col + acc.astype(jnp.float32)
                                    .mean() * 1e-9)
            v_col, v_sc = _quantize(col * 0.5)
            out = attn_merged(q, lrk, lrv, lrks, lrvs, mask_old,
                              k_col, v_col, k_sc, v_sc)
            return acc + out.astype(jnp.float32), 0

        acc, _ = jax.lax.scan(layer, acc, (kv, rk, rv, rks, rvs))
        return rk, rv, rks, rvs, acc

    acc0 = jnp.zeros((B, H, 1, DH), jnp.float32)
    out = jax.lax.fori_loop(0, N_STEPS, step, (rk, rv, rks, rvs, acc0))
    return out[4].sum()


def variant_E(q, kv, rk, rv, rks, rvs):
    """Merged-softmax attention but ring read via PER-LAYER dynamic
    slice from the step carry (closure), not scan xs."""
    pos_ids = jnp.arange(T)

    def step(i, carry):
        rk, rv, rks, rvs, acc = carry
        mask_old = (pos_ids < i)[None, None, None, :]

        def layer(c, xs):
            acc = c
            li, col = xs
            k_col, k_sc = _quantize(col + acc.astype(jnp.float32)
                                    .mean() * 1e-9)
            v_col, v_sc = _quantize(col * 0.5)
            lrk = jax.lax.dynamic_index_in_dim(rk, li, 0, False)
            lrv = jax.lax.dynamic_index_in_dim(rv, li, 0, False)
            lrks = jax.lax.dynamic_index_in_dim(rks, li, 0, False)
            lrvs = jax.lax.dynamic_index_in_dim(rvs, li, 0, False)
            out = attn_merged(q, lrk, lrv, lrks, lrvs, mask_old,
                              k_col, v_col, k_sc, v_sc)
            return acc + out.astype(jnp.float32), \
                (k_col, v_col, k_sc[:, :, 0, :].astype(rks.dtype),
                 v_sc[:, :, 0, :].astype(rvs.dtype))

        acc, cols = jax.lax.scan(layer, acc, (jnp.arange(L), kv))
        k_cols, v_cols, k_scs, v_scs = cols
        rk = jax.lax.dynamic_update_slice(rk, k_cols, (0, 0, 0, 0, i))
        rv = jax.lax.dynamic_update_slice(rv, v_cols, (0, 0, 0, 0, i))
        rks = jax.lax.dynamic_update_slice(rks, k_scs, (0, 0, 0, i))
        rvs = jax.lax.dynamic_update_slice(rvs, v_scs, (0, 0, 0, i))
        return rk, rv, rks, rvs, acc

    acc0 = jnp.zeros((B, H, 1, DH), jnp.float32)
    out = jax.lax.fori_loop(0, N_STEPS, step, (rk, rv, rks, rvs, acc0))
    return out[4].sum()


VARIANTS = {"A": variant_A, "B": variant_B, "C": variant_C,
            "D": variant_D, "E": variant_E}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    inputs = make_inputs()
    for name in names:
        fn = jax.jit(VARIANTS[name])
        float(fn(*inputs))                  # compile + warm
        t0 = time.perf_counter()
        for _ in range(ITERS):
            float(fn(*inputs))
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{name}  {dt:7.3f} s = {dt / N_STEPS * 1e3:6.2f} ms/step",
              flush=True)


if __name__ == "__main__":
    main()
