"""Full-stack pipeline parity: our ASRPipeline vs the HF ASR pipeline
(chunking, batching, generate, DTW word timestamps, stitching) with
identical weights, tokenizer files, and audio. This is BASELINE.json
config 1 made offline."""

import numpy as np
import pytest

import jax.numpy as jnp

from crisperwhisper_tpu.config import (FeatureConfig, GenerationOptions,
                                       PipelineOptions)
from crisperwhisper_tpu.models import params_from_state_dict
from crisperwhisper_tpu.pipeline.asr import ASRPipeline
from helpers import TINY_SPECIALS, state_dict_numpy, tiny_arch, torch_tiny_model
from vocab_fixture import build_model_vocab_dir, hf_tokenizer, our_tokenizer

ALIGN_HEADS = ((0, 1), (1, 3), (0, 2))
CHUNK_S = 5          # tiny geometry: 250 positions = 500 frames = 5 s


@pytest.fixture(scope="module")
def vocab_dir(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("model_vocab"))
    build_model_vocab_dir(path)
    return path


@pytest.fixture(scope="module")
def hf_pipe(vocab_dir):
    from transformers import WhisperFeatureExtractor, pipeline
    tm = torch_tiny_model(seed=0)
    gc = tm.generation_config
    gc.no_timestamps_token_id = TINY_SPECIALS.no_timestamps
    gc.eos_token_id = TINY_SPECIALS.eot
    gc.pad_token_id = TINY_SPECIALS.eot
    gc.decoder_start_token_id = TINY_SPECIALS.sot
    gc.max_initial_timestamp_index = 50
    gc.alignment_heads = [list(h) for h in ALIGN_HEADS]
    gc.suppress_tokens = None
    gc.begin_suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.no_speech_threshold = None
    gc.logprob_threshold = None
    gc.compression_ratio_threshold = None
    gc.median_filter_width = 7
    gc.max_new_tokens = 32
    tok = hf_tokenizer(vocab_dir)
    tok.pad_token = "<|endoftext|>"
    fe = WhisperFeatureExtractor(feature_size=80, chunk_length=CHUNK_S)
    return tm, pipeline("automatic-speech-recognition", model=tm,
                        tokenizer=tok, feature_extractor=fe,
                        chunk_length_s=CHUNK_S, batch_size=2,
                        return_timestamps="word",
                        # pin greedy: transformers' ASR pipeline defaults to
                        # num_beams=5 since 4.49 (beam parity is tested once
                        # our beam search lands)
                        generate_kwargs={"max_new_tokens": 32,
                                         "num_beams": 1})


@pytest.fixture(scope="module")
def our_pipe(hf_pipe, vocab_dir):
    tm, _ = hf_pipe
    params = params_from_state_dict(state_dict_numpy(tm), tiny_arch(),
                                    dtype=jnp.float32)
    tok = our_tokenizer(vocab_dir)
    gen_opts = GenerationOptions(
        alignment_heads=ALIGN_HEADS, median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        temperatures=(0.0,), max_new_tokens=32)
    pipe_opts = PipelineOptions(chunk_length_s=CHUNK_S, batch_size=2,
                                return_timestamps="word")
    feat_cfg = FeatureConfig(feature_size=80, chunk_length=CHUNK_S)
    return ASRPipeline(params, tiny_arch(), tok,
                       specials=TINY_SPECIALS, gen_opts=gen_opts,
                       pipe_opts=pipe_opts, feat_cfg=feat_cfg)


def _audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * 16000)
    t = np.arange(n) / 16000.0
    return (0.2 * np.sin(2 * np.pi * 300 * t)
            + 0.1 * rng.standard_normal(n)).astype(np.float32)


def _compare_outputs(golden, ours):
    assert ours["text"] == golden["text"]
    assert len(ours["chunks"]) == len(golden["chunks"])
    for g, o in zip(golden["chunks"], ours["chunks"]):
        assert o["text"] == g["text"]
        gs, ge = g["timestamp"]
        os_, oe = o["timestamp"]
        # DTW f32-vs-f64 near-ties: allow one 20 ms frame
        assert abs(os_ - gs) <= 0.021 and abs(oe - ge) <= 0.021, (g, o)


@pytest.mark.parametrize("seconds,seed", [(4.0, 0), (12.3, 1), (27.7, 5)])
def test_pipeline_word_timestamps_parity(hf_pipe, our_pipe, seconds, seed):
    _, pipe = hf_pipe
    audio = _audio(seconds, seed)
    golden = pipe(audio.copy(), return_timestamps="word")
    ours = our_pipe({"raw": audio, "sampling_rate": 16000},
                    return_timestamps="word")
    _compare_outputs(golden, ours)


def test_pipeline_segment_timestamps_parity(hf_pipe, our_pipe):
    _, pipe = hf_pipe
    audio = _audio(9.0, seed=2)
    golden = pipe(audio.copy(), return_timestamps=True)
    ours = our_pipe({"raw": audio, "sampling_rate": 16000},
                    return_timestamps=True)
    assert ours["text"] == golden["text"]
    assert len(ours["chunks"]) == len(golden["chunks"])
    for g, o in zip(golden["chunks"], ours["chunks"]):
        assert o["text"] == g["text"]
        assert o["timestamp"] == tuple(g["timestamp"])


def test_pipeline_beam5_default_parity(hf_pipe, vocab_dir):
    """transformers' ASR pipeline default (num_beams=5) vs our pipeline
    with num_beams=5 — the reference's true effective decode."""
    from transformers import WhisperFeatureExtractor, pipeline
    tm, _ = hf_pipe
    tok = hf_tokenizer(vocab_dir)
    tok.pad_token = "<|endoftext|>"
    fe = WhisperFeatureExtractor(feature_size=80, chunk_length=CHUNK_S)
    pipe5 = pipeline("automatic-speech-recognition", model=tm,
                     tokenizer=tok, feature_extractor=fe,
                     chunk_length_s=CHUNK_S, batch_size=2,
                     return_timestamps="word",
                     generate_kwargs={"max_new_tokens": 32, "num_beams": 5})
    params = params_from_state_dict(state_dict_numpy(tm), tiny_arch(),
                                    dtype=jnp.float32)
    gen_opts = GenerationOptions(
        alignment_heads=ALIGN_HEADS, median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        temperatures=(0.0,), num_beams=5, max_new_tokens=32)
    ours5 = ASRPipeline(params, tiny_arch(), our_tokenizer(vocab_dir),
                        specials=TINY_SPECIALS, gen_opts=gen_opts,
                        pipe_opts=PipelineOptions(chunk_length_s=CHUNK_S,
                                                  batch_size=2,
                                                  return_timestamps="word"),
                        feat_cfg=FeatureConfig(feature_size=80,
                                               chunk_length=CHUNK_S))
    audio = _audio(8.0, seed=4)
    golden = pipe5(audio.copy(), return_timestamps="word")
    got = ours5({"raw": audio, "sampling_rate": 16000},
                return_timestamps="word")
    _compare_outputs(golden, got)


def test_pipeline_adjust_pauses_end_to_end(our_pipe):
    audio = _audio(6.0, seed=3)
    plain = our_pipe({"raw": audio, "sampling_rate": 16000},
                     return_timestamps="word")
    adjusted = our_pipe({"raw": audio, "sampling_rate": 16000},
                        return_timestamps="word",
                        adjust_pauses_threshold=0.12)
    assert len(plain["chunks"]) == len(adjusted["chunks"])
    # pause redistribution never re-orders or renames words
    assert [c["text"] for c in plain["chunks"]] == \
        [c["text"] for c in adjusted["chunks"]]


def test_pipeline_single_group_pow2_padding(hf_pipe, vocab_dir):
    """A single short group (len(chunks) <= batch_size: short files, the
    serving batcher at low load) pads to the next POWER-OF-2 batch so
    the compiled-program set stays bounded (and the small-batch decode
    kernel sees its 2/4/8 shapes). Dummy rows must not change output:
    batch_size=8 (single padded group) == batch_size=2 (exact groups)."""
    tm, _ = hf_pipe
    params = params_from_state_dict(state_dict_numpy(tm), tiny_arch(),
                                    dtype=jnp.float32)
    tok = our_tokenizer(vocab_dir)
    gen_opts = GenerationOptions(
        alignment_heads=ALIGN_HEADS, median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        temperatures=(0.0,), max_new_tokens=32)
    feat_cfg = FeatureConfig(feature_size=80, chunk_length=CHUNK_S)

    def make(bs):
        return ASRPipeline(
            params, tiny_arch(), tok, specials=TINY_SPECIALS,
            gen_opts=gen_opts, feat_cfg=feat_cfg,
            pipe_opts=PipelineOptions(chunk_length_s=CHUNK_S,
                                      batch_size=bs,
                                      return_timestamps="word"))

    audio = {"raw": _audio(12.3, seed=3), "sampling_rate": 16000}
    ref = make(2)(audio, return_timestamps="word")     # multi-group path
    got = make(8)(audio, return_timestamps="word")     # padded single group
    _compare_outputs(ref, got)
