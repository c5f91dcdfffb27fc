"""condition_on_prev_tokens: prompt assembly parity + integration.

Our conditioned prompt is a STATIC (max_target//2)-slot left-padded window
— the reference's padding='max_length' static-cache mode
(hf _prepare_decoder_input_ids :1913-1921). The dynamic 'longest' mode
shifts real tokens to different positions (learned positional embeddings),
so parity is against HF's static semantics. Decoder-level output parity
(token streams, masked pads) is pinned in
tests/test_beam_fallback_e2e.py::test_condition_on_prev_decoder_stream_parity,
which also documents why HF's END-TO-END static output is not a valid
golden (its kwargs filtering drops the decoder pad mask).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import generate
from crisperwhisper_tpu.decoding.segments import pad_segments_to_max_length
from crisperwhisper_tpu.models import params_from_state_dict
from helpers import TINY_SPECIALS, rand_mel, state_dict_numpy, tiny_arch, torch_tiny_model


def test_prev_prompt_assembly_matches_hf():
    import torch
    from transformers.models.whisper.generation_whisper import \
        _pad_to_max_length
    tsb = TINY_SPECIALS.timestamp_begin
    segs = [
        [{"tokens": np.array([tsb + 1, 5, 6, tsb + 10, tsb + 10, 7,
                              tsb + 20])}],
        [{"tokens": np.array([tsb + 2, 8])},
         {"tokens": np.array([tsb + 30, 9, 10, tsb + 40])}],
        [],
    ]
    cut_off = 47
    golden = _pad_to_max_length(
        [[{"tokens": torch.tensor(d["tokens"])} for d in s] if s else None
         for s in segs],
        TINY_SPECIALS.eot, device="cpu", padding_side="left",
        padding="max_length",
        bos_token_tensor=torch.tensor([TINY_SPECIALS.sot_prev]),
        cut_off_length=cut_off, skip_ending_double_timestamps=True,
        timestamp_begin=tsb).numpy()
    ours = pad_segments_to_max_length(
        segs, TINY_SPECIALS.eot, padding_side="left",
        cut_off_length=cut_off,
        bos_token=np.asarray([TINY_SPECIALS.sot_prev], np.int64),
        skip_ending_double_timestamps=True, timestamp_begin=tsb,
        fixed_total_length=cut_off + 1)
    np.testing.assert_array_equal(ours, golden)


def test_condition_on_prev_integration():
    """Long-form decode with conditioning runs and produces valid
    segment structure; prompt region is masked (pads never attended)."""
    arch = tiny_arch()
    tm = torch_tiny_model(seed=0)
    params = params_from_state_dict(state_dict_numpy(tm), arch,
                                    dtype=jnp.float32)
    opts = GenerationOptions(
        alignment_heads=((0, 1), (1, 3)), median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        temperatures=(0.0,), max_new_tokens=30,
        condition_on_prev_tokens=True)
    frames = 1250
    mel = rand_mel(batch=2, seed=41, frames=frames)
    out = generate(params, arch, TINY_SPECIALS, opts, jnp.asarray(mel),
                   num_frames=np.array([frames, frames]),
                   max_frames=np.array([frames, frames]))
    assert out.sequences.shape[0] == 2
    for segs in out.segments:
        assert len(segs) >= 1
        for s in segs:
            toks = np.asarray(s["tokens"])
            # no pad/prev tokens may leak into emitted segments
            assert (toks != TINY_SPECIALS.sot_prev).all()
            assert (toks != TINY_SPECIALS.sot).all()


def test_condition_on_prev_changes_output():
    """Conditioning must actually alter the decode after window 1 (the
    prompt feeds through; with random weights outputs diverge)."""
    arch = tiny_arch()
    tm = torch_tiny_model(seed=0)
    params = params_from_state_dict(state_dict_numpy(tm), arch,
                                    dtype=jnp.float32)
    base = dict(alignment_heads=(), median_filter_width=7,
                max_initial_timestamp_index=50,
                compression_ratio_threshold=None, logprob_threshold=None,
                no_speech_threshold=None, temperatures=(0.0,),
                max_new_tokens=30, return_token_timestamps=False)
    frames = 1250
    mel = rand_mel(batch=1, seed=42, frames=frames)
    off = generate(params, arch, TINY_SPECIALS,
                   GenerationOptions(**base), jnp.asarray(mel),
                   max_frames=np.array([frames]))
    on = generate(params, arch, TINY_SPECIALS,
                  GenerationOptions(**base, condition_on_prev_tokens=True),
                  jnp.asarray(mel), max_frames=np.array([frames]))
    # first window identical (nothing to condition on yet)
    first_off = off.segments[0][0]["tokens"]
    first_on = on.segments[0][0]["tokens"]
    np.testing.assert_array_equal(first_off, first_on)
    # full outputs differ once conditioning kicks in
    assert (off.sequences.shape != on.sequences.shape
            or (off.sequences != on.sequences).any())
