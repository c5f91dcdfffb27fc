"""Language detection parity vs HF detect_language on the tiny model."""

import numpy as np
import pytest

import jax.numpy as jnp

from crisperwhisper_tpu.decoding.language import detect_language
from crisperwhisper_tpu.models import encode, params_from_state_dict
from helpers import TINY_SPECIALS, rand_mel, state_dict_numpy, tiny_arch, torch_tiny_model


def test_detect_language_matches_hf():
    import torch
    tm = torch_tiny_model(seed=0)
    gc = tm.generation_config
    gc.decoder_start_token_id = TINY_SPECIALS.sot
    n_lang = 4
    gc.lang_to_id = {f"<|l{i}|>": TINY_SPECIALS.language_begin + i
                     for i in range(n_lang)}
    mel = rand_mel(batch=3, seed=17)
    with torch.no_grad():
        golden = tm.detect_language(
            input_features=torch.from_numpy(mel)).numpy()
    arch = tiny_arch()
    params = params_from_state_dict(state_dict_numpy(tm), arch,
                                    dtype=jnp.float32)
    enc = encode(params, arch, jnp.asarray(mel))
    ours = np.asarray(detect_language(params, arch, TINY_SPECIALS, enc,
                                      num_languages=n_lang))
    np.testing.assert_array_equal(ours, golden)


def test_beam_with_fallback_ladder_structural():
    """BASELINE config 4: beam-5 decode + temperature fallback +
    hallucination gates runs end to end (structure-only: T>0 sampling is
    RNG-dependent, so no cross-framework parity here)."""
    from crisperwhisper_tpu.config import GenerationOptions
    from crisperwhisper_tpu.decoding import generate
    from crisperwhisper_tpu.models import init_params
    import jax
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(3))
    opts = GenerationOptions(
        alignment_heads=((0, 1),), median_filter_width=7,
        max_initial_timestamp_index=50,
        num_beams=4, max_new_tokens=20,
        temperatures=(0.0, 0.4),
        compression_ratio_threshold=2.4,
        logprob_threshold=-10.0,       # permissive: beam usually passes
        no_speech_threshold=0.6)
    mel = rand_mel(batch=2, seed=19)
    out = generate(params, arch, TINY_SPECIALS, opts, jnp.asarray(mel))
    assert out.sequences.shape[0] == 2
    for segs in out.segments:
        for s in segs:
            assert len(np.asarray(s["tokens"])) > 0
