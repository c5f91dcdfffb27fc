"""End-to-end short-form generation parity vs HF model.generate with
timestamps + token timestamps (greedy) on the seed-pinned tiny model."""

import numpy as np
import pytest

import jax.numpy as jnp

from crisperwhisper_tpu.config import GenerationOptions
from crisperwhisper_tpu.decoding import generate_short_form
from crisperwhisper_tpu.models import params_from_state_dict
from helpers import TINY_SPECIALS, rand_mel, state_dict_numpy, tiny_arch, torch_tiny_model

ALIGN_HEADS = ((0, 1), (1, 3), (0, 2))


@pytest.fixture(scope="module")
def setup():
    import torch
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
    gc.median_filter_width = 7
    params = params_from_state_dict(state_dict_numpy(tm), tiny_arch(),
                                    dtype=jnp.float32)
    opts = GenerationOptions(alignment_heads=ALIGN_HEADS,
                             median_filter_width=7,
                             max_initial_timestamp_index=50)
    return tm, params, opts


def test_short_form_generate_parity(setup):
    import torch
    tm, params, opts = setup
    arch = tiny_arch()
    mel = rand_mel(batch=2, seed=11)
    max_new = 24

    with torch.no_grad():
        out = tm.generate(
            input_features=torch.from_numpy(mel),
            max_new_tokens=max_new,
            num_beams=1, do_sample=False,
            return_timestamps=True,
            return_token_timestamps=True,
            return_dict_in_generate=True,
        )
    golden_seq = out["sequences"].numpy()
    golden_ts = out["token_timestamps"].numpy()

    ours = generate_short_form(params, arch, TINY_SPECIALS, opts,
                               jnp.asarray(mel), max_new_tokens=max_new)

    for i in range(2):
        g_len = golden_seq.shape[1]
        # golden is right-padded with pad_token across batch; compare the
        # real region: our sequences are [P + max_new] eot-padded too.
        np.testing.assert_array_equal(
            ours.sequences[i, :g_len], golden_seq[i],
            err_msg=f"row {i} token mismatch")
        np.testing.assert_allclose(
            ours.token_timestamps[i, :g_len], golden_ts[i], atol=1e-6,
            err_msg=f"row {i} timestamp mismatch")


def test_timestamp_grammar_structure(setup):
    """Property: generated sequences obey the timestamp grammar — start
    with a timestamp <= max_initial, timestamps non-decreasing."""
    _, params, opts = setup
    arch = tiny_arch()
    mel = rand_mel(batch=4, seed=13)
    ours = generate_short_form(params, arch, TINY_SPECIALS, opts,
                               jnp.asarray(mel), max_new_tokens=20)
    tsb = TINY_SPECIALS.timestamp_begin
    for i in range(4):
        g = int(ours.num_generated[i])
        seq = ours.sequences[i, 1:1 + g]
        assert seq[0] >= tsb
        assert seq[0] <= tsb + opts.max_initial_timestamp_index
        ts = [t for t in seq if t >= tsb]
        assert ts == sorted(ts)
