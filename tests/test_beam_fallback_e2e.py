"""Round-2 e2e parity suites (VERDICT r1 item 8):

  * beam search + failing-threshold fallback ladder vs HF generate
    (deterministic branches: T=0 retries and last-temperature keep)
  * condition_on_prev_tokens long-form vs HF's static-cache mode
    (condition_mode="static"; the dynamic 'longest' mode has its own
    parity suite in test_condition_prev.py —
    test_condition_dynamic_decoder_stream_parity and the e2e segment
    parity test)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import generate
from crisperwhisper_tpu.models import params_from_state_dict
from helpers import (TINY_SPECIALS, rand_mel, state_dict_numpy, tiny_arch,
                     torch_tiny_model)

ALIGN = ((0, 1), (1, 3))


def _configured_tm(**gc_over):
    tm = torch_tiny_model(seed=0)
    gc = tm.generation_config
    gc.no_timestamps_token_id = TINY_SPECIALS.no_timestamps
    gc.eos_token_id = TINY_SPECIALS.eot
    gc.pad_token_id = TINY_SPECIALS.eot
    gc.decoder_start_token_id = TINY_SPECIALS.sot
    gc.max_initial_timestamp_index = 50
    gc.alignment_heads = [list(h) for h in ALIGN]
    gc.suppress_tokens = None
    gc.begin_suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.no_speech_threshold = None
    gc.logprob_threshold = None
    gc.compression_ratio_threshold = None
    gc.median_filter_width = 7
    for k, v in gc_over.items():
        setattr(gc, k, v)
    return tm


def _our_params(tm):
    return params_from_state_dict(state_dict_numpy(tm), tiny_arch(),
                                  dtype=jnp.float32)


def _compare_segments(golden, ours, batch):
    for i in range(batch):
        g_segs = golden["segments"][i]
        o_segs = ours.segments[i]
        assert len(g_segs) == len(o_segs), (i, len(g_segs), len(o_segs))
        for gseg, oseg in zip(g_segs, o_segs):
            np.testing.assert_array_equal(np.asarray(gseg["tokens"]),
                                          oseg["tokens"])


def test_beam_fallback_last_temperature_parity():
    """num_beams=4 long-form where the logprob gate FAILS every window and
    the ladder is exhausted: both frameworks must keep the failing beam
    result and advance the seek loop identically (hf
    generation_whisper.py:981-1127 'every temperature tried' branch)."""
    import torch
    tm = _configured_tm(logprob_threshold=1e9, temperature=(0.0,))
    params = _our_params(tm)
    opts = GenerationOptions(
        alignment_heads=ALIGN, median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=1e9, no_speech_threshold=None,
        temperatures=(0.0,), num_beams=4, max_new_tokens=24)
    frames = 1250
    mel = rand_mel(batch=2, seed=61, frames=frames)
    with torch.no_grad():
        golden = tm.generate(
            input_features=torch.from_numpy(mel),
            attention_mask=torch.ones((2, frames), dtype=torch.long),
            max_new_tokens=24, num_beams=4, do_sample=False,
            temperature=(0.0,), logprob_threshold=1e9,
            return_timestamps=True, return_segments=True)
    ours = generate(params, tiny_arch(), TINY_SPECIALS, opts,
                    jnp.asarray(mel), num_frames=np.array([frames, frames]),
                    max_frames=np.array([frames, frames]))
    np.testing.assert_array_equal(ours.sequences,
                                  golden["sequences"].numpy())
    _compare_segments(golden, ours, 2)


def test_beam_deterministic_retry_ladder_parity():
    """Two zero temperatures: window fails at T[0], retries at T[1]
    deterministically (identical beam result), is kept as the last try —
    exercises the retry/batch-re-entry machinery end to end without RNG
    divergence."""
    import torch
    tm = _configured_tm(logprob_threshold=1e9, temperature=(0.0, 0.0))
    params = _our_params(tm)
    opts = GenerationOptions(
        alignment_heads=ALIGN, median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=1e9, no_speech_threshold=None,
        temperatures=(0.0, 0.0), num_beams=4, max_new_tokens=24)
    frames = 1250
    mel = rand_mel(batch=2, seed=62, frames=frames)
    with torch.no_grad():
        golden = tm.generate(
            input_features=torch.from_numpy(mel),
            attention_mask=torch.ones((2, frames), dtype=torch.long),
            max_new_tokens=24, num_beams=4, do_sample=False,
            temperature=(0.0, 0.0), logprob_threshold=1e9,
            return_timestamps=True, return_segments=True)
    ours = generate(params, tiny_arch(), TINY_SPECIALS, opts,
                    jnp.asarray(mel), num_frames=np.array([frames, frames]),
                    max_frames=np.array([frames, frames]))
    np.testing.assert_array_equal(ours.sequences,
                                  golden["sequences"].numpy())
    _compare_segments(golden, ours, 2)


def test_beam_skip_on_silence_parity():
    """Beams + both gates tripping -> every window skipped, empty output
    on both sides (hf _need_fallback :1255-1299 skip branch with
    num_beams>1)."""
    import torch
    tm = _configured_tm(logprob_threshold=1e9, no_speech_threshold=-1.0)
    params = _our_params(tm)
    opts = GenerationOptions(
        alignment_heads=ALIGN, median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=1e9, no_speech_threshold=-1.0,
        temperatures=(0.0,), num_beams=4, max_new_tokens=24)
    frames = 1250
    mel = rand_mel(batch=1, seed=63, frames=frames)
    with torch.no_grad():
        golden = tm.generate(
            input_features=torch.from_numpy(mel),
            attention_mask=torch.ones((1, frames), dtype=torch.long),
            max_new_tokens=24, num_beams=4, do_sample=False,
            temperature=0.0, logprob_threshold=1e9,
            no_speech_threshold=-1.0,
            return_timestamps=True, return_segments=True)
    ours = generate(params, tiny_arch(), TINY_SPECIALS, opts,
                    jnp.asarray(mel), num_frames=np.array([frames]),
                    max_frames=np.array([frames]))
    assert [len(s) for s in golden["segments"]] == \
        [len(s) for s in ours.segments] == [0]
    assert ours.sequences.shape[1] == golden["sequences"].shape[1] == 0


def test_condition_on_prev_decoder_stream_parity():
    """Conditioned long-form: our decode must match the token stream HF's
    DECODER actually samples when it receives the conditioned prompt +
    pad mask (the padding='max_length' static semantics of hf
    _prepare_decoder_input_ids :1913-1921).

    Pinned decision (VERDICT r1 item 8 / missing #5): we do NOT chase
    end-to-end parity with HF's cache_implementation='static' OUTPUT.
    Root-caused in round 2: in HF's un-instrumented static path the
    `decoder_attention_mask` built at :1931 never reaches the decoder
    (generate's signature-based kwargs filtering drops it — the runtime
    even warns "attention mask is not set and cannot be inferred"), so
    prompt PAD tokens are attended and HF's output diverges from its own
    masked forwards. Wrapping `tm.forward` with a (*args, **kw) shim
    restores the mask flow; under that faithful execution HF samples
    exactly our stream — which this test asserts window by window."""
    import torch
    tm = _configured_tm(cache_implementation="static",
                        prev_sot_token_id=TINY_SPECIALS.sot_prev)
    params = _our_params(tm)
    frames = 1250
    mel = rand_mel(batch=2, seed=41, frames=frames)

    # capture every token fed to the decoder; the (*args, **kw) signature
    # also fixes HF's kwargs filtering so decoder_attention_mask arrives
    fed_windows: list[list[list[int]]] = []   # [window][item] token stream
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
    with torch.no_grad():
        tm.generate(
            input_features=torch.from_numpy(mel),
            attention_mask=torch.ones((2, frames), dtype=torch.long),
            max_new_tokens=30, num_beams=1, do_sample=False,
            temperature=0.0, condition_on_prev_tokens=True,
            return_timestamps=True, return_segments=True)

    opts = GenerationOptions(
        alignment_heads=ALIGN, median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        temperatures=(0.0,), max_new_tokens=30,
        condition_on_prev_tokens=True)
    our_windows: list[np.ndarray] = []
    import crisperwhisper_tpu.decoding.longform as lf
    orig_dw = lf._decode_window

    def spy_dw(params, arch, specials, opts_, seg, prompt, *a, **kw):
        out = orig_dw(params, arch, specials, opts_, seg, prompt, *a, **kw)
        our_windows.append((np.asarray(prompt).shape[1], out[0]))
        return out

    lf._decode_window = spy_dw
    try:
        generate(params, tiny_arch(), TINY_SPECIALS, opts, jnp.asarray(mel),
                 num_frames=np.array([frames, frames]),
                 max_frames=np.array([frames, frames]))
    finally:
        lf._decode_window = orig_dw

    # compare the first few CONDITIONED windows token by token: HF's fed
    # stream (tokens 1..n actually entering the decoder) vs ours
    n_cmp = min(3, len(fed_windows) - 1, len(our_windows) - 1)
    assert n_cmp >= 1, "no conditioned window was produced"
    for w in range(1, 1 + n_cmp):
        plen, seqs = our_windows[w]
        for i in range(2):
            hf_stream = fed_windows[w][i]
            our_stream = list(seqs[i, plen:plen + len(hf_stream)])
            assert our_stream == hf_stream, (w, i, hf_stream[:8],
                                             our_stream[:8])
