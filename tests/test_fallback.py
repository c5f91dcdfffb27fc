"""Fallback/skip gates: deterministic end-to-end parity cases.

The full temperature ladder is stochastic at T>0 (different RNGs across
frameworks), so parity pins the deterministic branches: the
skip-on-silence path (no_speech & logprob gates) and the single-
temperature needs-fallback-but-last path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import generate
from crisperwhisper_tpu.decoding.fallback import (compression_ratio,
                                                  need_fallback)
from crisperwhisper_tpu.models import params_from_state_dict
from helpers import TINY_SPECIALS, rand_mel, state_dict_numpy, tiny_arch, torch_tiny_model


def test_compression_ratio_matches_hf():
    import torch
    from transformers.models.whisper.generation_whisper import \
        WhisperGenerationMixin
    rng = np.random.default_rng(0)
    for n in (1, 5, 80):
        toks = rng.integers(0, 1000, size=n)
        golden = WhisperGenerationMixin._retrieve_compression_ratio(
            torch.tensor(toks), 1000)
        assert abs(compression_ratio(toks, 1000) - golden) < 1e-9
    # repetitive sequences compress well -> high ratio triggers fallback
    rep = np.tile([5, 6, 7], 60)
    assert compression_ratio(rep, 1000) > 2.4


def test_need_fallback_gates():
    opts = GenerationOptions()            # default thresholds
    seq = np.arange(50) % 97
    # fine logprob, unique tokens -> no fallback
    nf, skip = need_fallback(seq, -0.2, 0.1, 1000, opts)
    assert not nf and not skip
    # bad logprob -> fallback
    nf, skip = need_fallback(seq, -2.0, 0.1, 1000, opts)
    assert nf and not skip
    # bad logprob + silence -> skip instead
    nf, skip = need_fallback(seq, -2.0, 0.9, 1000, opts)
    assert not nf and skip
    # repetitive -> compression fallback even with fine logprob
    rep = np.tile([5, 6, 7], 60)
    nf, skip = need_fallback(rep, -0.2, 0.1, 1000, opts)
    assert nf and not skip


def test_skip_all_segments_matches_hf():
    """Thresholds forcing should_skip on every window: both frameworks
    emit empty transcripts and the seek loop still terminates."""
    import torch
    tm = torch_tiny_model(seed=0)
    gc = tm.generation_config
    gc.no_timestamps_token_id = TINY_SPECIALS.no_timestamps
    gc.eos_token_id = TINY_SPECIALS.eot
    gc.pad_token_id = TINY_SPECIALS.eot
    gc.decoder_start_token_id = TINY_SPECIALS.sot
    gc.max_initial_timestamp_index = 50
    gc.alignment_heads = [[0, 1]]
    gc.suppress_tokens = None
    gc.begin_suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.median_filter_width = 7
    # always-skip: logprob gate always true, no-speech gate always true
    gc.logprob_threshold = 1e9
    gc.no_speech_threshold = -1.0
    gc.compression_ratio_threshold = None
    gc.temperature = 0.0

    params = params_from_state_dict(state_dict_numpy(tm), tiny_arch(),
                                    dtype=jnp.float32)
    opts = GenerationOptions(
        alignment_heads=((0, 1),), median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=1e9, no_speech_threshold=-1.0,
        temperatures=(0.0,), max_new_tokens=24)
    frames = 1250
    mel = rand_mel(batch=1, seed=51, frames=frames)
    with torch.no_grad():
        golden = tm.generate(
            input_features=torch.from_numpy(mel),
            attention_mask=torch.ones((1, frames), dtype=torch.long),
            max_new_tokens=24, num_beams=1, do_sample=False,
            temperature=0.0, return_timestamps=True,
            return_token_timestamps=True, return_segments=True)
    ours = generate(params, tiny_arch(), TINY_SPECIALS, opts,
                    jnp.asarray(mel), num_frames=np.array([frames]),
                    max_frames=np.array([frames]))
    assert [len(s) for s in golden["segments"]] == \
        [len(s) for s in ours.segments] == [0]
    assert ours.sequences.shape[1] == golden["sequences"].shape[1] == 0
