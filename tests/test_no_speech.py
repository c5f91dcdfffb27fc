"""No-speech probability capture parity: must be read at the SOT position
(hf logits_process.py:2099-2105), which differs from the last prompt
position whenever the prompt has language/task tokens."""

import numpy as np

import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import greedy_decode_jit
from crisperwhisper_tpu.models import encode, params_from_state_dict
from helpers import TINY_SPECIALS, rand_mel, state_dict_numpy, tiny_arch, torch_tiny_model


def test_no_speech_prob_at_sot_position_multi_token_prompt():
    import torch
    tm = torch_tiny_model(seed=0)
    arch = tiny_arch()
    params = params_from_state_dict(state_dict_numpy(tm), arch,
                                    dtype=jnp.float32)
    mel = rand_mel(batch=2, seed=23)
    sp = TINY_SPECIALS
    prompt = np.array([[sp.sot, 908, sp.transcribe]] * 2, np.int32)

    with torch.no_grad():
        logits = tm(input_features=torch.from_numpy(mel),
                    decoder_input_ids=torch.from_numpy(
                        prompt.astype(np.int64))).logits
    golden = torch.softmax(logits[:, 0].float(), dim=-1)[
        :, sp.no_speech].numpy()          # SOT position = index 0

    enc = encode(params, arch, jnp.asarray(mel))
    opts = GenerationOptions(max_initial_timestamp_index=50)
    res = greedy_decode_jit(params, arch, sp, opts, enc,
                            jnp.asarray(prompt), 8, sot_position=0)
    np.testing.assert_allclose(np.asarray(res.no_speech_probs), golden,
                               atol=1e-4)
    # sanity: the last-prompt-position value differs (the old bug)
    wrong = torch.softmax(logits[:, -1].float(), dim=-1)[
        :, sp.no_speech].numpy()
    assert np.abs(wrong - golden).max() > 1e-6
