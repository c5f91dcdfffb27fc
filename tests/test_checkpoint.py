"""Orbax-native checkpoint roundtrip (incl. quantized int8 leaves)."""

import numpy as np

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.models import init_params
from crisperwhisper_tpu.models.quantize import (fuse_decoder_qkv,
                                                quantize_decoder_weights)
from crisperwhisper_tpu.utils.checkpoint import (load_saved_params,
                                                 save_params)
from helpers import tiny_arch


def test_checkpoint_roundtrip(tmp_path):
    arch = tiny_arch()
    params = quantize_decoder_weights(
        fuse_decoder_qkv(init_params(arch, jax.random.PRNGKey(0)),
                         arch.head_dim))
    path = str(tmp_path / "ckpt")
    save_params(path, params, metadata={"arch": "tiny", "quantized": True})
    restored, meta = load_saved_params(path)
    assert meta["quantized"] is True
    ref_leaves = jax.tree_util.tree_leaves_with_path(params)
    got_leaves = jax.tree_util.tree_leaves_with_path(restored)
    assert len(ref_leaves) == len(got_leaves)
    for (pa, va), (pb, vb) in zip(ref_leaves, got_leaves):
        assert pa == pb
        assert va.dtype == vb.dtype, pa
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
