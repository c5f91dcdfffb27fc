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


def test_pipeline_sharded_matches_unsharded(mesh, tmp_path_factory):
    """The USER-FACING pipeline served over the mesh (TP params + data-
    sharded chunk batches, hub.load_pipeline(mesh=...) wiring) must give
    identical transcripts + word timestamps to single-device serving."""
    import sys
    sys.path.insert(0, "tests")
    from vocab_fixture import build_model_vocab_dir, our_tokenizer
    from helpers import state_dict_numpy, torch_tiny_model
    from crisperwhisper_tpu.config import PipelineOptions, FeatureConfig
    from crisperwhisper_tpu.models import params_from_state_dict
    from crisperwhisper_tpu.pipeline.asr import ASRPipeline

    vocab_dir = str(tmp_path_factory.mktemp("mesh_vocab"))
    build_model_vocab_dir(vocab_dir)
    tm = torch_tiny_model(seed=0)
    params = params_from_state_dict(state_dict_numpy(tm), tiny_arch(),
                                    dtype=jnp.float32)
    tok = our_tokenizer(vocab_dir)
    gen_opts = GenerationOptions(
        alignment_heads=((0, 1), (1, 3), (0, 2)), median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        temperatures=(0.0,), max_new_tokens=16)
    pipe_opts = PipelineOptions(chunk_length_s=5, batch_size=2,
                                return_timestamps="word")
    feat_cfg = FeatureConfig(feature_size=80, chunk_length=5)

    def build(mesh_arg, p):
        return ASRPipeline(p, tiny_arch(), tok, specials=TINY_SPECIALS,
                           gen_opts=gen_opts, pipe_opts=pipe_opts,
                           feat_cfg=feat_cfg, mesh=mesh_arg)

    rng = np.random.default_rng(5)
    t = np.arange(11 * 16000) / 16000.0
    audio = (0.3 * np.sin(2 * np.pi * 220 * t)
             + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)

    ref = build(None, params)(audio, return_timestamps="word")
    got = build(mesh, shard_params(params, mesh))(audio,
                                                  return_timestamps="word")
    assert got["text"] == ref["text"]
    assert len(got["chunks"]) == len(ref["chunks"])
    for a, b in zip(ref["chunks"], got["chunks"]):
        assert a["text"] == b["text"]
        np.testing.assert_allclose(a["timestamp"], b["timestamp"],
                                   atol=1e-4)


def test_pipeline_mesh_batch_size_validation(mesh):
    from crisperwhisper_tpu.config import PipelineOptions
    from crisperwhisper_tpu.pipeline.asr import ASRPipeline
    from crisperwhisper_tpu.models import init_params
    import pytest as _pytest
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))

    class _Tok:                       # tokenizer unused before validation
        pass

    with _pytest.raises(ValueError, match="multiple"):
        ASRPipeline(params, arch, None, specials=TINY_SPECIALS,
                    pipe_opts=PipelineOptions(batch_size=3), mesh=mesh)


def test_param_pspecs_cover_quantized_tree():
    """TP specs must reach the quantized leaf layouts (w_q/w_scale,
    w_q4/w_gscale) — a silent fallthrough to replicated would make mesh
    serving of the quantized decoder inert."""
    from jax.sharding import PartitionSpec as P
    from crisperwhisper_tpu.models.quantize import (fuse_decoder_qkv,
                                                    quantize_decoder_weights)
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    from crisperwhisper_tpu.parallel import param_pspecs as pspecs

    q8 = pspecs(quantize_decoder_weights(params))
    dec = q8["decoder"]["layers"]
    assert dec["self"]["q"]["w_q"] == P(None, None, "model")
    assert dec["self"]["q"]["w_scale"] == P(None, None, "model")
    assert dec["self"]["o"]["w_q"] == P(None, "model", None)
    assert dec["self"]["o"]["w_scale"] == P()
    assert dec["mlp"]["fc2"]["w_q"] == P(None, "model", None)

    q4 = pspecs(quantize_decoder_weights(params, bits=4))
    dec4 = q4["decoder"]["layers"]
    assert dec4["mlp"]["fc1"]["w_q4"] == P(None, None, None, "model")
    assert dec4["mlp"]["fc1"]["w_gscale"] == P(None, None, "model")
    assert dec4["cross"]["o"]["w_q4"] == P(None, "model", None, None)

    fused = pspecs(quantize_decoder_weights(
        fuse_decoder_qkv(params, arch.head_dim)))
    # fused qkv deliberately replicated (block-boundary-crossing split)
    assert fused["decoder"]["layers"]["self"]["qkv"]["w_q"] == P()


def test_sharded_quantized_decode_matches_single_device(mesh):
    """int8 weights (unfused) + int8 cross cache, TP-sharded: identical
    tokens to the unsharded quantized decode."""
    from crisperwhisper_tpu.models import init_cache
    from crisperwhisper_tpu.models.quantize import quantize_decoder_weights
    arch = tiny_arch()
    params = quantize_decoder_weights(
        init_params(arch, jax.random.PRNGKey(2)))
    mel = rand_mel(batch=4, seed=6)
    prompt = np.full((4, 1), TINY_SPECIALS.sot, np.int32)
    opts = GenerationOptions(max_initial_timestamp_index=50)

    enc = encode(params, arch, jnp.asarray(mel))
    ref = greedy_decode_jit(params, arch, TINY_SPECIALS, opts, enc,
                            jnp.asarray(prompt), 8,
                            cross_cache_dtype=jnp.int8)

    sp = shard_params(params, mesh)
    enc_s = encode(sp, arch, jax.device_put(jnp.asarray(mel),
                                            data_sharding(mesh)))
    out = greedy_decode_jit(sp, arch, TINY_SPECIALS, opts, enc_s,
                            jnp.asarray(prompt), 8,
                            cross_cache_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(ref.sequences),
                                  np.asarray(out.sequences))


def test_streaming_batcher_over_mesh_pipeline(mesh, tmp_path_factory):
    """The multi-stream serving batcher drives the mesh-served pipeline
    transparently (single device-owner worker; SURVEY §5.2) and yields
    the same transcripts as direct calls."""
    import sys
    sys.path.insert(0, "tests")
    from vocab_fixture import build_model_vocab_dir, our_tokenizer
    from helpers import state_dict_numpy, torch_tiny_model
    from crisperwhisper_tpu.config import PipelineOptions, FeatureConfig
    from crisperwhisper_tpu.models import params_from_state_dict
    from crisperwhisper_tpu.pipeline.asr import ASRPipeline
    from crisperwhisper_tpu.serving import StreamingBatcher

    vocab_dir = str(tmp_path_factory.mktemp("mesh_vocab2"))
    build_model_vocab_dir(vocab_dir)
    tm = torch_tiny_model(seed=0)
    params = shard_params(
        params_from_state_dict(state_dict_numpy(tm), tiny_arch(),
                               dtype=jnp.float32), mesh)
    pipe = ASRPipeline(
        params, tiny_arch(), our_tokenizer(vocab_dir),
        specials=TINY_SPECIALS,
        gen_opts=GenerationOptions(
            alignment_heads=((0, 1), (1, 3)), median_filter_width=7,
            max_initial_timestamp_index=50,
            compression_ratio_threshold=None, logprob_threshold=None,
            no_speech_threshold=None, temperatures=(0.0,),
            max_new_tokens=12),
        pipe_opts=PipelineOptions(chunk_length_s=5, batch_size=2,
                                  return_timestamps="word"),
        feat_cfg=FeatureConfig(feature_size=80, chunk_length=5), mesh=mesh)

    rng = np.random.default_rng(9)
    t = np.arange(6 * 16000) / 16000.0
    audio = (0.3 * np.sin(2 * np.pi * 250 * t)
             + 0.05 * rng.standard_normal(t.shape)).astype(np.float32)
    ref = pipe({"raw": audio, "sampling_rate": 16000},
               return_timestamps="word")
    batcher = StreamingBatcher(pipe)
    try:
        handles = [batcher.submit({"raw": audio, "sampling_rate": 16000})
                   for _ in range(3)]
        results = [h.result(timeout=600) for h in handles]
    finally:
        batcher.shutdown()
    for r in results:
        assert r["text"] == ref["text"]
        assert len(r["chunks"]) == len(ref["chunks"])


def test_multihost_serving_mesh_single_process():
    """make_serving_mesh on the 8-device virtual CPU mesh: model axis
    must divide local devices; full end-to-end decode over the hybrid
    mesh builder's output matches make_mesh's layout semantics."""
    import pytest
    from crisperwhisper_tpu.parallel import (host_local_array,
                                             init_multihost,
                                             make_serving_mesh,
                                             process_local_batch)

    init_multihost()                      # single-process no-op
    mesh = make_serving_mesh(model=4)
    assert mesh.shape == {"data": 2, "model": 4}
    assert mesh.axis_names == ("data", "model")

    with pytest.raises(ValueError, match="divide"):
        make_serving_mesh(model=3)
    with pytest.raises(ValueError, match="data axis"):
        make_serving_mesh(model=4, data=1)

    assert process_local_batch(8) == 8    # 1 process owns the batch
    arr = host_local_array(np.ones((4, 5), np.float32), mesh)
    assert arr.shape == (4, 5)
    assert {d for s in arr.addressable_shards
            for d in [s.device]} <= set(mesh.devices.flat)


def test_multihost_mesh_runs_sharded_decode():
    """A TP=2/DP=4 serving mesh from make_serving_mesh must run the real
    sharded decode path (same flow as dryrun_multichip)."""
    from crisperwhisper_tpu.parallel import (data_sharding,
                                             make_serving_mesh,
                                             shard_params)
    from crisperwhisper_tpu.decoding import greedy_decode_jit
    from crisperwhisper_tpu.models import encode, init_params
    from crisperwhisper_tpu.config import GenerationOptions
    from helpers import TINY_SPECIALS, rand_mel, tiny_arch

    mesh = make_serving_mesh(model=2)
    arch = tiny_arch()
    params = shard_params(init_params(arch, jax.random.PRNGKey(0)), mesh)
    mel = jax.device_put(jnp.asarray(rand_mel(batch=4, seed=3)),
                         data_sharding(mesh))
    enc = encode(params, arch, mel)
    res = greedy_decode_jit(
        params, arch, TINY_SPECIALS,
        GenerationOptions(max_initial_timestamp_index=50), enc,
        jnp.full((4, 1), TINY_SPECIALS.sot, jnp.int32), 6)
    assert np.asarray(res.sequences).shape == (4, 7)
