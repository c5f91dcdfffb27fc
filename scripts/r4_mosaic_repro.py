"""Round-4 repro: Mosaic lowering failure of the whole-step b1 kernel.

Runs decode_step_b1 with interpret=False on the real chip (tiny arch is
enough — the failure is a lowering rejection, not a capacity issue) and
prints the full traceback so the offending construct can be identified.
"""
import sys
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.models import (alignment_selector, decode_step,
                                       encode, init_cache, init_params)
from crisperwhisper_tpu.models.quantize import (fuse_decoder_qkv,
                                                quantize_decoder_weights)
from crisperwhisper_tpu.ops import pallas_decode_b1 as pk
from helpers import rand_mel, tiny_arch


def setup(ring=32):
    arch = tiny_arch()
    params = quantize_decoder_weights(
        fuse_decoder_qkv(init_params(arch, jax.random.PRNGKey(0)),
                         arch.head_dim))
    mel = rand_mel(batch=1, seed=5)
    enc = encode(params, arch, jnp.asarray(mel))
    cache = init_cache(params, arch, enc, cross_dtype=jnp.int8,
                       cache_len=ring, self_dtype=jnp.int8)
    sel = jnp.asarray(alignment_selector(arch, ((0, 1), (1, 2))))
    return arch, params, cache, sel


def main():
    arch, params, cache, sel = setup()
    tt = jnp.asarray([7], jnp.int32)
    try:
        logits, cache2, al = pk.decode_step_b1(
            params, arch, tt, jnp.int32(0), cache, align_sel=sel,
            interpret=False)
        jax.block_until_ready(logits)
        print("B1 OK", logits.shape)
    except Exception:
        traceback.print_exc()


if __name__ == "__main__":
    main()
