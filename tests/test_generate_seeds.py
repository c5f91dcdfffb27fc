"""Parity robustness: full generate vs HF across additional model seeds
(different random weights exercise different grammar/DTW paths)."""

import numpy as np
import pytest

import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import generate
from crisperwhisper_tpu.models import params_from_state_dict
from helpers import TINY_SPECIALS, rand_mel, state_dict_numpy, tiny_arch, torch_tiny_model

ALIGN_HEADS = ((0, 0), (1, 2))


@pytest.mark.parametrize("model_seed,audio_seed", [(1, 7), (2, 8)])
def test_generate_parity_other_seeds(model_seed, audio_seed):
    import torch
    tm = torch_tiny_model(seed=model_seed)
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
                             temperatures=(0.0,), max_new_tokens=28)
    mel = rand_mel(batch=2, seed=audio_seed)
    with torch.no_grad():
        golden = tm.generate(
            input_features=torch.from_numpy(mel), max_new_tokens=28,
            num_beams=1, do_sample=False, temperature=0.0,
            return_timestamps=True, return_token_timestamps=True,
            return_segments=True)
    ours = generate(params, tiny_arch(), TINY_SPECIALS, opts,
                    jnp.asarray(mel))
    np.testing.assert_array_equal(ours.sequences,
                                  golden["sequences"].numpy())
    np.testing.assert_allclose(ours.token_timestamps,
                               golden["token_timestamps"].numpy(),
                               atol=0.021)
