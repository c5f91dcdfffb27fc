"""User prompt injection (`prompt_ids`) + legacy `forced_decoder_ids`
parity vs HF generate (hf generation_whisper.py:1467-1620 init tokens,
:1875-1943 _prepare_decoder_input_ids, :1130-1139 _prepare_segments).

Prompting is the standard way to bias a verbatim model toward domain
vocabulary; these tests pin the whole surface: tokenizer get_prompt_ids,
init-token assembly, first-segment seeding + output strip, all-segments
conditioning, and the generation-config legacy attribute.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import generate
from crisperwhisper_tpu.decoding.generate import build_prompt
from crisperwhisper_tpu.hub import load_generation_options
from crisperwhisper_tpu.models import params_from_state_dict
from helpers import (TINY_SPECIALS, rand_mel, state_dict_numpy, tiny_arch,
                     torch_tiny_model)

ALIGN_HEADS = ((0, 1), (1, 3))
MAX_NEW = 24
# plain-vocab prompt ids (< eot=900), led by <|startofprev|>=904 — the
# shape tokenizer.get_prompt_ids produces
PROMPT = np.asarray([TINY_SPECIALS.sot_prev, 17, 42, 203, 5], np.int32)


@pytest.fixture(scope="module")
def setup():
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
    gc.prev_sot_token_id = TINY_SPECIALS.sot_prev
    params = params_from_state_dict(state_dict_numpy(tm), tiny_arch(),
                                    dtype=jnp.float32)
    opts = GenerationOptions(alignment_heads=ALIGN_HEADS,
                             median_filter_width=7,
                             max_initial_timestamp_index=50,
                             compression_ratio_threshold=None,
                             logprob_threshold=None,
                             no_speech_threshold=None,
                             temperatures=(0.0,),
                             max_new_tokens=MAX_NEW)
    return tm, params, opts


def _hf_generate(tm, mel, **kw):
    import torch
    with torch.no_grad():
        return tm.generate(
            input_features=torch.from_numpy(mel),
            max_new_tokens=MAX_NEW, num_beams=1, do_sample=False,
            temperature=0.0,
            return_timestamps=True, return_token_timestamps=True,
            return_segments=True, **kw)


def _compare_segments(golden, ours, batch):
    gs = golden["sequences"].numpy()
    assert ours.sequences.shape[1] == gs.shape[1], (ours.sequences.shape,
                                                    gs.shape)
    np.testing.assert_array_equal(ours.sequences, gs)
    for i in range(batch):
        g_segs = golden["segments"][i]
        o_segs = ours.segments[i]
        assert len(g_segs) == len(o_segs)
        for gseg, oseg in zip(g_segs, o_segs):
            np.testing.assert_array_equal(np.asarray(gseg["tokens"]),
                                          oseg["tokens"])


def _opts(base, **kw):
    return GenerationOptions(**{**base.__dict__, **kw})


def test_prompt_ids_short_form_parity(setup):
    import torch
    tm, params, opts = setup
    mel = rand_mel(batch=2, seed=31)
    golden = _hf_generate(tm, mel, prompt_ids=torch.from_numpy(
        PROMPT.astype(np.int64)))
    ours = generate(params, tiny_arch(), TINY_SPECIALS,
                    _opts(opts, prompt_ids=tuple(int(t) for t in PROMPT)),
                    jnp.asarray(mel))
    # the prompt region must NOT leak into the output
    for i in range(2):
        for seg in ours.segments[i]:
            assert TINY_SPECIALS.sot_prev not in np.asarray(seg["tokens"])
    _compare_segments(golden, ours, 2)


def test_prompt_ids_long_form_first_segment_conditioned(setup):
    """first-segment mode + condition_on_prev_tokens: the prompt seeds
    the previous-context buffer of window 1 and is trimmed from the
    returned segments (hf _prepare_segments :1130 + final_segments :920).
    HF's comparable end-to-end path is padding='longest' (dynamic
    positions) -> condition_mode='dynamic' (see test_condition_prev)."""
    import torch
    tm, params, opts = setup
    frames = 1250
    mel = rand_mel(batch=2, seed=33, frames=frames)
    mask = torch.ones((2, frames), dtype=torch.long)
    golden = _hf_generate(
        tm, mel, attention_mask=mask,
        prompt_ids=torch.from_numpy(PROMPT.astype(np.int64)),
        condition_on_prev_tokens=True)
    ours = generate(
        params, tiny_arch(), TINY_SPECIALS,
        _opts(opts, prompt_ids=tuple(int(t) for t in PROMPT),
              condition_on_prev_tokens=True, condition_mode="dynamic"),
        jnp.asarray(mel), num_frames=np.array([frames, frames]),
        max_frames=np.array([frames, frames]))
    _compare_segments(golden, ours, 2)


def test_prompt_ids_all_segments_parity(setup):
    import torch
    tm, params, opts = setup
    frames = 1250
    mel = rand_mel(batch=2, seed=35, frames=frames)
    mask = torch.ones((2, frames), dtype=torch.long)
    golden = _hf_generate(
        tm, mel, attention_mask=mask,
        prompt_ids=torch.from_numpy(PROMPT.astype(np.int64)),
        prompt_condition_type="all-segments",
        condition_on_prev_tokens=True)
    ours = generate(
        params, tiny_arch(), TINY_SPECIALS,
        _opts(opts, prompt_ids=tuple(int(t) for t in PROMPT),
              prompt_condition_type="all-segments",
              condition_on_prev_tokens=True, condition_mode="dynamic"),
        jnp.asarray(mel), num_frames=np.array([frames, frames]),
        max_frames=np.array([frames, frames]))
    _compare_segments(golden, ours, 2)


def test_all_segments_requires_conditioning(setup):
    _, params, opts = setup
    mel = rand_mel(batch=1, seed=1)
    with pytest.raises(ValueError, match="condition_on_prev_tokens"):
        generate(params, tiny_arch(), TINY_SPECIALS,
                 _opts(opts, prompt_ids=tuple(int(t) for t in PROMPT),
                       prompt_condition_type="all-segments"),
                 jnp.asarray(mel))


def test_forced_decoder_ids_generate_parity(setup):
    """Legacy forced_decoder_ids on the generation config drive the init
    tokens when language/task are unset (hf :1503-1541)."""
    tm, params, opts = setup
    fdi = [(1, 903), (2, TINY_SPECIALS.no_timestamps)]
    gc = tm.generation_config
    old = gc.forced_decoder_ids
    gc.forced_decoder_ids = fdi
    try:
        mel = rand_mel(batch=2, seed=37)
        golden = _hf_generate(tm, mel)
    finally:
        gc.forced_decoder_ids = old
    loaded = load_generation_options({"forced_decoder_ids": fdi},
                                     base=opts)
    assert loaded.forced_tokens == (903, TINY_SPECIALS.no_timestamps)
    ours = generate(params, tiny_arch(), TINY_SPECIALS, loaded,
                    jnp.asarray(mel))
    _compare_segments(golden, ours, 2)


def test_forced_decoder_ids_malformed_raises():
    with pytest.raises(ValueError, match="forced_decoder_ids"):
        load_generation_options({"forced_decoder_ids": [[1, 5], [3, 6]]})


def test_build_prompt_language_overrides_forced():
    """A pinned language token replaces the forced slot-1 value; a pinned
    task is appended; <|notimestamps|> is dropped when timestamps are on
    (hf :1578-1611)."""
    sp = TINY_SPECIALS
    # forced ignored entirely when language is pinned (hf :1503-1506
    # consumes forced only when task and language are both unset)
    row = build_prompt(sp, 1, language_token=950,
                       forced_tokens=(940, sp.translate))[0]
    assert row.tolist() == [sp.sot, 950, sp.transcribe]
    # forced consumed when nothing is pinned
    row = build_prompt(sp, 1, forced_tokens=(940, sp.translate))[0]
    assert row.tolist() == [sp.sot, 940, sp.translate]
    # trailing <|notimestamps|> stripped when timestamps requested
    row = build_prompt(sp, 1,
                       forced_tokens=(940, sp.transcribe,
                                      sp.no_timestamps))[0]
    assert row.tolist() == [sp.sot, 940, sp.transcribe]
    # ... and kept when they are off
    row = build_prompt(sp, 1, return_timestamps=False,
                       forced_tokens=(940, sp.transcribe,
                                      sp.no_timestamps))[0]
    assert row.tolist() == [sp.sot, 940, sp.transcribe, sp.no_timestamps]
    # a None slot (undefined language) is filtered like hf :1617
    row = build_prompt(sp, 1, forced_tokens=(None,))[0]
    assert row.tolist() == [sp.sot]


def test_get_prompt_ids_matches_hf(tmp_path):
    """Differential vs the installed HF tokenizer's get_prompt_ids."""
    from vocab_fixture import build_vocab_dir, hf_tokenizer, our_tokenizer
    path = str(tmp_path / "vocab")
    build_vocab_dir(path)
    hf = hf_tokenizer(path)
    ours = our_tokenizer(path)
    for text in ("hello world", "  the dog ", "cat dog cat"):
        np.testing.assert_array_equal(
            ours.get_prompt_ids(text),
            hf.get_prompt_ids(text, return_tensors="np"))
    with pytest.raises(ValueError, match="disallowed special token"):
        ours.get_prompt_ids("hello <|startoftranscript|>")


def test_per_row_language_list_parity(setup):
    """generate(language=[...]) list form: each row gets its own language
    token in slot 1 (hf _retrieve_init_tokens :1544-1560)."""
    import torch

    tm, params, opts = setup
    gc = tm.generation_config
    # synthetic lang tokens for the tiny layout (ids just above sot_prev)
    gc.lang_to_id = {"<|en|>": 940, "<|de|>": 941}
    gc.task_to_id = {"transcribe": TINY_SPECIALS.transcribe,
                     "translate": TINY_SPECIALS.translate}
    gc.is_multilingual = True
    try:
        mel = rand_mel(batch=2, seed=39)
        golden = _hf_generate(tm, mel, language=["<|en|>", "<|de|>"],
                              task="transcribe")
    finally:
        del gc.lang_to_id, gc.task_to_id
        gc.is_multilingual = None
    ours = generate(params, tiny_arch(), TINY_SPECIALS, opts,
                    jnp.asarray(rand_mel(batch=2, seed=39)),
                    language_token=np.array([940, 941]),
                    task_token=TINY_SPECIALS.transcribe)
    _compare_segments(golden, ours, 2)


def test_language_list_wrong_length_raises():
    with pytest.raises(ValueError, match="match the batch size"):
        build_prompt(TINY_SPECIALS, 3, language_token=[940, 941])
