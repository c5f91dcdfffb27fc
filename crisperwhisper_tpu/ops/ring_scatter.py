"""Per-row ring-column writes for BATCHED speculation.

Batched assisted decoding (decoding/assisted.py) advances every row at
its OWN cache position: the verify block writes S contiguous K/V
columns per row at per-row offsets into the [L, B, ..., T] self rings
(models/whisper.decode_step_multi, vector-position branch — the analog
of hf modeling_whisper.py's cache writes under per-row
cache_position). XLA lowers the natural `ring.at[li, rows, ...,
pos_vec].set(...)` formulation to a scatter, and the round-3
measurement pinned that scatter as the reason batched speculation
loses its amortization win (0.86x at B=64 even at acceptance 1.0 —
NOTES_ROUND3.md item 2): single-token decode keeps XLA's in-place
dynamic-update-slice aliasing, the vector-position scatter does not.

This module provides three interchangeable write strategies, selected
by the CW_RING_SCATTER env var at trace time, all writing identical
values (bit-exact, pure perf choice):

  * "scatter" (default) — the one-scatter-per-tensor formulation the
    rest of the repo ships today.
  * "dus"     — B unrolled per-row `dynamic_update_slice`s: each is an
    in-place slab write XLA can alias, trading one scatter for B small
    updates.
  * "dma"     — a Pallas kernel over grid (B,): the ring stays in HBM
    (ANY memory space, input-output aliased — never copied), and each
    grid step issues one async DMA of row b's [.., S] slab into
    ring[li, b, ..., pos[b]:pos[b]+S]. Traffic is exactly the slabs
    (~26 MB/step at large-v3 B=64 S=5 vs the rings' ~2 GB), so this is
    the speed-of-light formulation if Mosaic's dynamic-offset DMA path
    delivers; measured by experiments/ring_scatter_designs.py before
    any default flips.

All strategies assume unique, in-bounds, per-row CONTIGUOUS slots
[pos[b], pos[b]+S) — the verify-block contract.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def scatter_mode() -> str:
    return os.environ.get("CW_RING_SCATTER", "scatter")


def write_block_columns(ring: jax.Array, blk: jax.Array, li, positions,
                        mode: str | None = None) -> jax.Array:
    """Write blk [B, ..., S] into ring [L, B, ..., T] at
    ring[li, b, ..., positions[b] : positions[b]+S] for every row b.
    Returns the updated ring (in-place-intended: callers keep the ring
    on a donated carry)."""
    return write_block_columns_group([(ring, blk)], li, positions,
                                     mode=mode)[0]


def write_block_columns_group(pairs, li, positions,
                              mode: str | None = None):
    """Grouped form: pairs is a list of (ring [L, B, ..., T],
    blk [B, ..., S]); one strategy invocation covers all tensors (the
    DMA kernel issues every tensor's copy per grid step, amortizing the
    kernel launch). Returns the updated rings, same order."""
    mode = mode or scatter_mode()
    positions = jnp.asarray(positions, jnp.int32)
    li = jnp.asarray(li, jnp.int32)
    if mode == "dus":
        return [_write_dus(r, b, li, positions) for r, b in pairs]
    if mode == "dma":
        return _write_dma_group(pairs, li, positions)
    return [_write_scatter(r, b, li, positions) for r, b in pairs]


def _write_scatter(ring, blk, li, positions):
    b = blk.shape[0]
    s = blk.shape[-1]
    rows = jnp.arange(b)[:, None]
    pos_vec = positions[:, None] + jnp.arange(s)[None, :]     # [B, S]
    idx = (li, rows) + (slice(None),) * (ring.ndim - 3) + (pos_vec,)
    return ring.at[idx].set(jnp.moveaxis(blk, -1, 1),
                            unique_indices=True,
                            mode="promise_in_bounds")


def _write_dus(ring, blk, li, positions):
    nmid = ring.ndim - 3                 # dims between the row and T
    for row in range(blk.shape[0]):
        slab = blk[row][None, None]      # [1, 1, ..., S]
        start = (li, jnp.int32(row)) + (jnp.int32(0),) * nmid \
            + (positions[row],)
        ring = jax.lax.dynamic_update_slice(ring, slab, start)
    return ring


def _write_dma_group(pairs, li, positions):
    if any(r.dtype == jnp.int4 for r, _ in pairs):
        # int4 rings are nibble-addressed; keep them on the scatter path
        return [_write_scatter(r, b, li, positions) for r, b in pairs]
    rings = [r for r, _ in pairs]
    blks = [b for _, b in pairs]
    b = blks[0].shape[0]
    shapes = tuple((r.shape, str(r.dtype), bl.shape)
                   for r, bl in zip(rings, blks))
    from .pallas_decode_b1 import _auto_interpret
    return list(_dma_call(tuple(rings), tuple(blks), li, positions,
                          shapes_key=shapes, nb=b,
                          interpret=_auto_interpret()))


@functools.partial(jax.jit,
                   static_argnames=("shapes_key", "nb", "interpret"))
def _dma_call(rings, blks, li, positions, *, shapes_key, nb, interpret):
    n = len(rings)

    def kern(*refs):
        # refs: li[1] smem, pos[B] smem, n ring ANY, n blk VMEM,
        #       n out ANY (aliased to rings), n DMA semaphore arrays [B]
        # ONE grid step: all B rows' slabs sit in VMEM (tiny — ~1 MB at
        # large-v3 B=64 S=5); issue every row's DMA back-to-back so the
        # engines queue them, then drain all semaphores.
        li_ref, pos_ref = refs[0], refs[1]
        blk_refs = refs[2 + n:2 + 2 * n]
        out_refs = refs[2 + 2 * n:2 + 3 * n]
        sems = refs[2 + 3 * n:]
        l = li_ref[0]  # noqa: E741
        dmas = []
        for row in range(nb):
            pos = pos_ref[row]
            for blk_ref, out_ref, sem in zip(blk_refs, out_refs, sems):
                s = blk_ref.shape[-1]
                dst = out_ref.at[(l, row)
                                 + (slice(None),) * (out_ref.ndim - 3)
                                 + (pl.ds(pos, s),)]
                dmas.append(pltpu.make_async_copy(
                    blk_ref.at[row], dst, sem.at[row]))
        for d in dmas:
            d.start()
        for d in dmas:
            d.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1,),
        in_specs=([pl.BlockSpec(memory_space=pltpu.ANY)] * n
                  + [pl.BlockSpec(bl.shape,
                                  # index-map args: grid index + the two
                                  # scalar-prefetch refs (li, positions)
                                  lambda i, *sp, nd=bl.ndim: (0,) * nd)
                     for bl in blks]),
        out_specs=tuple(pl.BlockSpec(memory_space=pltpu.ANY)
                        for _ in range(n)),
        scratch_shapes=[pltpu.SemaphoreType.DMA((nb,))] * n,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=tuple(jax.ShapeDtypeStruct(r.shape, r.dtype)
                        for r in rings),
        # operand order: li, positions, rings..., blks...; ring i is
        # operand 2+i and aliases output i (never copied)
        input_output_aliases={2 + i: i for i in range(n)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(li.reshape(1), positions, *rings, *blks)
