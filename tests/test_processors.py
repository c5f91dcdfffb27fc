"""Unit parity: our vectorized timestamp grammar vs HF's
WhisperTimeStampLogitsProcessor on random logits + random valid histories."""

import numpy as np
import pytest

import jax.numpy as jnp

from crisperwhisper_tpu.config import SpecialTokens
from crisperwhisper_tpu.decoding import TimestampState, apply_timestamp_rules
from helpers import TINY_SPECIALS


def _hf_processor(max_initial):
    import torch
    from transformers import GenerationConfig
    from transformers.generation.logits_process import \
        WhisperTimeStampLogitsProcessor
    gc = GenerationConfig(
        no_timestamps_token_id=TINY_SPECIALS.no_timestamps,
        eos_token_id=TINY_SPECIALS.eot,
        max_initial_timestamp_index=max_initial,
    )
    return WhisperTimeStampLogitsProcessor(gc, begin_index=1)


def _state_from_history(history: list[int], sp: SpecialTokens
                        ) -> TimestampState:
    state = TimestampState.init(1)
    for tok in history:
        state = state.update(jnp.asarray([tok], jnp.int32),
                             sp.timestamp_begin)
    return state


HISTORIES = [
    [],                          # begin: must force initial timestamp
    [910],                       # open timestamp -> force text
    [910, 5],                    # inside pair -> anything monotonic
    [910, 5, 7, 930],            # closing ts -> only eos/timestamps >= 930
    [910, 5, 930, 930],          # pair boundary -> force text
    [910, 5, 930, 930, 8],       # text after pair
    [957],                       # initial at max boundary
    [910, 5, 930, 930, 8, 940, 940, 9],
]


@pytest.mark.parametrize("hist_idx", range(len(HISTORIES)))
@pytest.mark.parametrize("seed", [0, 1])
def test_timestamp_rules_parity(hist_idx, seed):
    import torch
    sp = TINY_SPECIALS
    history = HISTORIES[hist_idx]
    rng = np.random.default_rng(seed * 100 + hist_idx)
    scores = rng.standard_normal((1, 1000)).astype(np.float32) * 3

    proc = _hf_processor(max_initial=50)
    input_ids = torch.tensor([[sp.sot] + history])
    golden = proc(input_ids, torch.from_numpy(scores.copy())).numpy()

    state = _state_from_history(history, sp)
    ours = np.asarray(apply_timestamp_rules(
        jnp.asarray(scores), state, sp, max_initial_timestamp_index=50))

    # compare suppression masks and passthrough values
    np.testing.assert_array_equal(np.isneginf(ours), np.isneginf(golden),
                                  err_msg=f"history={history}")
    both = ~np.isneginf(golden)
    np.testing.assert_allclose(ours[both], golden[both], atol=1e-6)
