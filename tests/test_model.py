"""Golden parity: JAX encoder/decoder vs HF torch WhisperForConditionalGeneration
with identical (random, seed-pinned) weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from crisperwhisper_tpu.models import (alignment_selector, decode_step,
                                       decoder_forward, encode, forward,
                                       init_cache, params_from_state_dict)
from helpers import TINY_SPECIALS, rand_mel, state_dict_numpy, tiny_arch, torch_tiny_model


@pytest.fixture(scope="module")
def torch_model():
    return torch_tiny_model(seed=0)


@pytest.fixture(scope="module")
def jax_params(torch_model):
    return params_from_state_dict(state_dict_numpy(torch_model), tiny_arch(),
                                  dtype=jnp.float32)


def test_encoder_parity(torch_model, jax_params):
    import torch
    arch = tiny_arch()
    mel = rand_mel(batch=2, seed=1)
    with torch.no_grad():
        golden = torch_model.model.encoder(
            torch.from_numpy(mel)).last_hidden_state.numpy()
    ours = np.asarray(encode(jax_params, arch, jnp.asarray(mel)))
    assert ours.shape == golden.shape
    np.testing.assert_allclose(ours, golden, atol=2e-4, rtol=1e-4)


def test_full_forward_parity(torch_model, jax_params):
    import torch
    arch = tiny_arch()
    mel = rand_mel(batch=2, seed=2)
    ids = np.array([[TINY_SPECIALS.sot, 5, 9, 200, 17],
                    [TINY_SPECIALS.sot, 42, 7, 3, 908]], np.int64)
    with torch.no_grad():
        golden = torch_model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(ids)).logits.numpy()
    ours = np.asarray(forward(jax_params, arch, jnp.asarray(mel),
                              jnp.asarray(ids.astype(np.int32))))
    np.testing.assert_allclose(ours, golden, atol=5e-3, rtol=1e-3)
    # argmax decisions must agree exactly
    np.testing.assert_array_equal(ours.argmax(-1), golden.argmax(-1))


def test_incremental_decode_matches_full_forward(jax_params):
    """The KV-cached single-token step must reproduce the teacher-forced
    full forward logits position by position."""
    arch = tiny_arch()
    mel = rand_mel(batch=2, seed=3)
    enc = encode(jax_params, arch, jnp.asarray(mel))
    ids = np.array([[TINY_SPECIALS.sot, 11, 22, 33, 44, 55],
                    [TINY_SPECIALS.sot, 66, 77, 88, 99, 111]], np.int32)
    full = np.asarray(decoder_forward(jax_params, arch, jnp.asarray(ids), enc))

    cache = init_cache(jax_params, arch, enc)
    step = jax.jit(lambda p, t, pos, c: decode_step(p, arch, t, pos, c))
    for t in range(ids.shape[1]):
        logits, cache, _ = step(jax_params, jnp.asarray(ids[:, t]),
                                jnp.int32(t), cache)
        np.testing.assert_allclose(np.asarray(logits), full[:, t],
                                   atol=2e-4, rtol=1e-4)


def test_alignment_head_capture_matches_torch_cross_attn(torch_model,
                                                         jax_params):
    """In-graph alignment-head capture == HF output_attentions selection."""
    import torch
    arch = tiny_arch()
    mel = rand_mel(batch=1, seed=4)
    ids = np.array([[TINY_SPECIALS.sot, 5, 9]], np.int64)
    with torch.no_grad():
        out = torch_model(input_features=torch.from_numpy(mel),
                          decoder_input_ids=torch.from_numpy(ids),
                          output_attentions=True)
    # cross_attentions: tuple per layer of [B, H, T, 1500]
    heads = ((0, 1), (1, 3))
    golden = np.stack([out.cross_attentions[l][0, h].numpy()
                       for l, h in heads], axis=0)  # [A, T, 1500]

    enc = encode(jax_params, arch, jnp.asarray(mel))
    cache = init_cache(jax_params, arch, enc)
    sel = alignment_selector(arch, heads)
    captured = []
    for t in range(ids.shape[1]):
        _, cache, probs = decode_step(jax_params, arch,
                                      jnp.asarray(ids[:, t].astype(np.int32)),
                                      jnp.int32(t), cache, align_sel=sel)
        captured.append(np.asarray(probs)[0])       # [A, 1500]
    ours = np.stack(captured, axis=1)               # [A, T, 1500]
    np.testing.assert_allclose(ours, golden, atol=2e-5, rtol=1e-4)
