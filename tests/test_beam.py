"""Beam-search parity vs HF generate(num_beams=5) on the tiny model."""

import numpy as np
import pytest

import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import generate
from crisperwhisper_tpu.models import params_from_state_dict
from helpers import TINY_SPECIALS, rand_mel, state_dict_numpy, tiny_arch, torch_tiny_model

ALIGN_HEADS = ((0, 1), (1, 3), (0, 2))
MAX_NEW = 24
NUM_BEAMS = 4


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
    params = params_from_state_dict(state_dict_numpy(tm), tiny_arch(),
                                    dtype=jnp.float32)
    opts = GenerationOptions(alignment_heads=ALIGN_HEADS,
                             median_filter_width=7,
                             max_initial_timestamp_index=50,
                             compression_ratio_threshold=None,
                             logprob_threshold=None,
                             no_speech_threshold=None,
                             temperatures=(0.0,),
                             num_beams=NUM_BEAMS,
                             max_new_tokens=MAX_NEW)
    return tm, params, opts


def test_beam_search_parity(setup):
    import torch
    tm, params, opts = setup
    mel = rand_mel(batch=2, seed=31)
    with torch.no_grad():
        golden = tm.generate(
            input_features=torch.from_numpy(mel),
            max_new_tokens=MAX_NEW, num_beams=NUM_BEAMS, do_sample=False,
            temperature=0.0,
            return_timestamps=True, return_token_timestamps=True,
            return_segments=True)
    ours = generate(params, tiny_arch(), TINY_SPECIALS, opts,
                    jnp.asarray(mel))
    gs = golden["sequences"].numpy()
    np.testing.assert_array_equal(ours.sequences, gs)
    np.testing.assert_allclose(ours.token_timestamps,
                               golden["token_timestamps"].numpy(),
                               atol=0.021)
    for i in range(2):
        g_segs = golden["segments"][i]
        assert len(g_segs) == len(ours.segments[i])
        for gseg, oseg in zip(g_segs, ours.segments[i]):
            np.testing.assert_array_equal(np.asarray(gseg["tokens"]),
                                          oseg["tokens"])
