"""condition_on_prev_tokens: prompt assembly parity + integration.

Our conditioned prompt is always a STATIC (max_target//2)-slot
left-padded window; `GenerationOptions.condition_mode` selects the
positional semantics inside it:

  * "static" (default) — pads consume learned positions: the reference's
    padding='max_length' static-cache mode (hf _prepare_decoder_input_ids
    :1913-1921). Decoder-level output parity (token streams, masked pads)
    is pinned in tests/test_beam_fallback_e2e.py::
    test_condition_on_prev_decoder_stream_parity, which also documents
    why HF's END-TO-END static output is not a valid golden (its kwargs
    filtering drops the decoder pad mask).
  * "dynamic" — mask-aware positions (real tokens at 0..len-1): the
    reference's DEFAULT padding='longest' mode, where HF computes
    decoder_position_ids = cumsum(mask)-1 on the fly (hf generation/
    utils.py prepare_inputs_for_generation). We realize it with a per-row
    pos_offset on the pos_emb gather — shapes stay static. Stream parity
    vs HF's default path is pinned below
    (test_condition_dynamic_decoder_stream_parity).
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


def _hf_fed_stream_spy(tm):
    """Wrap tm.forward to record the token streams the decoder actually
    consumes, window by window (same capture used by the static-mode
    parity test in test_beam_fallback_e2e.py)."""
    fed_windows: list[list[list[int]]] = []
    orig_fwd = tm.forward

    def spy_fwd(*args, **kw):
        ids = kw.get("decoder_input_ids")
        if ids is not None:
            if ids.shape[-1] > 1 or fed_windows == []:
                fed_windows.append([[] for _ in range(ids.shape[0])])
            elif ids.shape[-1] == 1:
                for i in range(ids.shape[0]):
                    fed_windows[-1][i].append(int(ids[i, -1]))
        return orig_fwd(*args, **kw)

    tm.forward = spy_fwd
    return fed_windows


def test_condition_dynamic_decoder_stream_parity():
    """condition_mode='dynamic' must reproduce the token stream HF's
    DEFAULT conditioned long-form path samples (padding='longest' +
    mask-aware decoder_position_ids = cumsum(mask)-1, hf
    generation_whisper.py:1917 + generation/utils.py "Create missing
    position_ids on the fly") — window by window, per item."""
    import torch
    from test_beam_fallback_e2e import _configured_tm, _our_params, ALIGN

    tm = _configured_tm(prev_sot_token_id=TINY_SPECIALS.sot_prev)
    params = _our_params(tm)
    frames = 1250
    mel = rand_mel(batch=2, seed=41, frames=frames)

    fed_windows = _hf_fed_stream_spy(tm)
    with torch.no_grad():
        tm.generate(
            input_features=torch.from_numpy(mel),
            attention_mask=torch.ones((2, frames), dtype=torch.long),
            max_new_tokens=30, num_beams=1, do_sample=False,
            temperature=0.0, condition_on_prev_tokens=True,
            return_timestamps=True, return_segments=True)

    import crisperwhisper_tpu.decoding.longform as lf
    from helpers import tiny_arch as _tiny_arch

    opts = GenerationOptions(
        alignment_heads=((0, 1), (1, 3)), median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        temperatures=(0.0,), max_new_tokens=30,
        condition_on_prev_tokens=True, condition_mode="dynamic")
    our_windows: list = []
    orig_dw = lf._decode_window

    def spy_dw(params_, arch_, specials_, opts_, seg, prompt, *a, **kw):
        out = orig_dw(params_, arch_, specials_, opts_, seg, prompt,
                      *a, **kw)
        our_windows.append((np.asarray(prompt).shape[1], out[0]))
        return out

    lf._decode_window = spy_dw
    try:
        generate(params, _tiny_arch(), TINY_SPECIALS, opts,
                 jnp.asarray(mel), num_frames=np.array([frames, frames]),
                 max_frames=np.array([frames, frames]))
    finally:
        lf._decode_window = orig_dw

    n_cmp = min(3, len(fed_windows) - 1, len(our_windows) - 1)
    assert n_cmp >= 1, "no conditioned window was produced"
    for w in range(1, 1 + n_cmp):
        plen, seqs = our_windows[w]
        for i in range(2):
            hf_stream = fed_windows[w][i]
            our_stream = list(seqs[i, plen:plen + len(hf_stream)])
            assert our_stream == hf_stream, (w, i, hf_stream[:8],
                                             our_stream[:8])


def test_condition_dynamic_e2e_segment_parity():
    """End-to-end conditioned long-form vs HF's DEFAULT (dynamic) path:
    unlike the static mode (where HF's kwargs filtering breaks its own
    mask flow — see test_beam_fallback_e2e.py), the dynamic path is HF's
    well-trodden default, so full segment parity should hold without any
    instrumentation shim."""
    import torch
    from test_beam_fallback_e2e import (_compare_segments, _configured_tm,
                                        _our_params)

    tm = _configured_tm(prev_sot_token_id=TINY_SPECIALS.sot_prev)
    params = _our_params(tm)
    frames = 1250
    mel = rand_mel(batch=2, seed=43, frames=frames)
    with torch.no_grad():
        golden = tm.generate(
            input_features=torch.from_numpy(mel),
            attention_mask=torch.ones((2, frames), dtype=torch.long),
            max_new_tokens=30, num_beams=1, do_sample=False,
            temperature=0.0, condition_on_prev_tokens=True,
            return_timestamps=True, return_segments=True)

    from helpers import tiny_arch as _tiny_arch
    opts = GenerationOptions(
        alignment_heads=((0, 1), (1, 3)), median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        temperatures=(0.0,), max_new_tokens=30,
        condition_on_prev_tokens=True, condition_mode="dynamic")
    ours = generate(params, _tiny_arch(), TINY_SPECIALS, opts,
                    jnp.asarray(mel), num_frames=np.array([frames, frames]),
                    max_frames=np.array([frames, frames]))
    _compare_segments(golden, ours, batch=2)


def test_condition_dynamic_differs_from_static():
    """The mode flag must actually change the decode once a conditioned
    window runs (positions of real prompt tokens shift)."""
    arch = tiny_arch()
    tm = torch_tiny_model(seed=0)
    params = params_from_state_dict(state_dict_numpy(tm), arch,
                                    dtype=jnp.float32)
    base = dict(alignment_heads=(), median_filter_width=7,
                max_initial_timestamp_index=50,
                compression_ratio_threshold=None, logprob_threshold=None,
                no_speech_threshold=None, temperatures=(0.0,),
                max_new_tokens=30, return_token_timestamps=False,
                condition_on_prev_tokens=True)
    frames = 1250
    mel = rand_mel(batch=1, seed=42, frames=frames)
    st = generate(params, arch, TINY_SPECIALS,
                  GenerationOptions(**base), jnp.asarray(mel),
                  max_frames=np.array([frames]))
    dy = generate(params, arch, TINY_SPECIALS,
                  GenerationOptions(**base, condition_mode="dynamic"),
                  jnp.asarray(mel), max_frames=np.array([frames]))
    # first window identical (no prev context yet -> no pads, offset 0)
    np.testing.assert_array_equal(st.segments[0][0]["tokens"],
                                  dy.segments[0][0]["tokens"])
    assert (st.sequences.shape != dy.sequences.shape
            or (st.sequences != dy.sequences).any())
