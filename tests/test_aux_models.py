"""Aux model heads: causal LM and audio classification parity/shape."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.models.whisper import (
    audio_classification_forward, causal_lm_forward,
    init_classification_head, init_params)
from helpers import TINY_SPECIALS, rand_mel, state_dict_numpy, tiny_arch, torch_tiny_model
from crisperwhisper_tpu.models import params_from_state_dict


def test_causal_lm_with_encoder_matches_full_decoder():
    import torch
    tm = torch_tiny_model(seed=0)
    arch = tiny_arch()
    params = params_from_state_dict(state_dict_numpy(tm), arch,
                                    dtype=jnp.float32)
    mel = rand_mel(batch=1, seed=5)
    ids = np.array([[TINY_SPECIALS.sot, 3, 7, 11]], np.int64)
    with torch.no_grad():
        enc = tm.model.encoder(torch.from_numpy(mel)).last_hidden_state
        golden = tm(input_features=torch.from_numpy(mel),
                    decoder_input_ids=torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(causal_lm_forward(
        params, arch, jnp.asarray(ids.astype(np.int32)),
        encoder_out=jnp.asarray(enc.numpy())))
    np.testing.assert_allclose(ours, golden, atol=5e-3, rtol=1e-3)


def test_causal_lm_decoder_only_runs():
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    ids = jnp.asarray(np.array([[TINY_SPECIALS.sot, 3, 7]], np.int32))
    logits = np.asarray(causal_lm_forward(params, arch, ids))
    assert logits.shape == (1, 3, arch.vocab_size)
    assert np.isfinite(logits).all()


def test_audio_classification_head():
    arch = tiny_arch()
    params = init_params(arch, jax.random.PRNGKey(0))
    head = init_classification_head(arch, num_labels=7,
                                    key=jax.random.PRNGKey(1))
    mel = rand_mel(batch=3, seed=6)
    logits = np.asarray(audio_classification_forward(
        params, arch, jnp.asarray(mel), head))
    assert logits.shape == (3, 7)
    assert np.isfinite(logits).all()


def test_audio_classification_hf_parity():
    """Full parity vs transformers WhisperForAudioClassification
    (modeling_whisper.py:1500): encoder -> projector -> mean-pool ->
    classifier, with weights converted from the torch checkpoint."""
    import torch
    from transformers import WhisperConfig, WhisperForAudioClassification
    from helpers import TINY
    from crisperwhisper_tpu.models import classification_head_from_state_dict

    cfg = WhisperConfig(**TINY, num_labels=5)
    torch.manual_seed(3)
    tm = WhisperForAudioClassification(cfg)
    tm.eval()
    mel = rand_mel(batch=2, seed=11)
    with torch.no_grad():
        golden = tm(input_features=torch.from_numpy(mel)).logits.numpy()

    sd = state_dict_numpy(tm)
    arch = tiny_arch()
    params = params_from_state_dict(
        {k: v for k, v in sd.items() if k.startswith("encoder.")}, arch,
        dtype=jnp.float32)
    head = classification_head_from_state_dict(sd)
    ours = np.asarray(audio_classification_forward(
        params, arch, jnp.asarray(mel), head))
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-4)


def test_zero_mean_unit_var_norm():
    from crisperwhisper_tpu.audio.mel import zero_mean_unit_var_norm
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 100)).astype(np.float32) * 3 + 1
    x[:, 80:] = 0.0
    out = zero_mean_unit_var_norm(x.copy(), length=80)
    np.testing.assert_allclose(out[:, :80].mean(-1), 0.0, atol=1e-5)
    np.testing.assert_allclose(out[:, :80].std(-1), 1.0, atol=1e-3)
    assert (out[:, 80:] == 0.0).all()
