"""Mesh sharding tests on the virtual 8-device CPU mesh (SURVEY.md §4.3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import greedy_decode_jit
from crisperwhisper_tpu.models import encode, init_params
from crisperwhisper_tpu.parallel import (data_sharding, make_mesh,
                                         param_pspecs, shard_params)
from helpers import TINY_SPECIALS, rand_mel, tiny_arch


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    return make_mesh(data=2, model=4)


def test_param_pspecs_cover_tree():
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    specs = param_pspecs(params)
    # same structure
    jax.tree.map(lambda a, b: None, params, specs)
    # attention qkv sharded on last dim
    assert specs["encoder"]["layers"]["attn"]["q"]["w"] == \
        jax.sharding.PartitionSpec(None, None, "model")
    assert specs["encoder"]["layers"]["attn"]["o"]["w"] == \
        jax.sharding.PartitionSpec(None, "model", None)
    assert specs["decoder"]["layers"]["mlp"]["fc2"]["w"] == \
        jax.sharding.PartitionSpec(None, "model", None)
    assert specs["decoder"]["tok_emb"] == jax.sharding.PartitionSpec()


def test_sharded_decode_matches_single_device(mesh):
    """TP+DP sharded decode must produce identical tokens to unsharded."""
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(1))
    mel = rand_mel(batch=4, seed=3)
    prompt = np.full((4, 1), TINY_SPECIALS.sot, np.int32)
    opts = GenerationOptions(max_initial_timestamp_index=50)

    enc = encode(params, arch, jnp.asarray(mel))
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc,
                            jnp.asarray(prompt), 8)

    sharded_params = shard_params(params, mesh)
    mel_sharded = jax.device_put(jnp.asarray(mel), data_sharding(mesh))
    enc_s = encode(sharded_params, arch, mel_sharded)
    out = greedy_decode_jit(sharded_params, arch, TINY_SPECIALS, opts,
                            enc_s, jnp.asarray(prompt), 8)

    np.testing.assert_array_equal(np.asarray(ref.sequences),
                                  np.asarray(out.sequences))
    np.testing.assert_allclose(np.asarray(ref.sum_logprobs),
                               np.asarray(out.sum_logprobs), atol=1e-4)
