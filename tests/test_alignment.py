"""Golden parity of alignment ops vs the reference implementations
(hf generation_whisper.py: _median_filter, _dynamic_time_warping,
_extract_token_timestamps postprocessing)."""

import numpy as np
import pytest

import jax.numpy as jnp

from crisperwhisper_tpu.ops import (attention_to_jump_times, dtw_jump_times,
                                    median_filter, znorm_tokens)


def _hf_dtw(matrix_np):
    from transformers.models.whisper.generation_whisper import \
        _dynamic_time_warping
    return _dynamic_time_warping(matrix_np)


def _hf_median(x_np, width):
    import torch
    from transformers.models.whisper.generation_whisper import _median_filter
    return _median_filter(torch.from_numpy(x_np), width).numpy()


@pytest.mark.parametrize("width", [3, 7])
def test_median_filter_parity(width):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 17, 40)).astype(np.float32)
    ours = np.asarray(median_filter(jnp.asarray(x), width))
    golden = _hf_median(x, width)
    np.testing.assert_allclose(ours, golden, atol=1e-7)


def test_median_filter_dynamic_boundary():
    """Reflection at a dynamic true length == reference filtering of the
    cropped array."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 50)).astype(np.float32)
    n = 33
    golden = _hf_median(x[None, :, :n], 7)[0]
    ours = np.asarray(median_filter(jnp.asarray(x), 7, length=n))
    np.testing.assert_allclose(ours[:, :n], golden, atol=1e-7)
    np.testing.assert_allclose(ours[:, n:], x[:, n:])  # passthrough


@pytest.mark.parametrize("seed", range(6))
def test_dtw_jump_times_parity(seed):
    rng = np.random.default_rng(seed)
    n_tok, n_frames = 37, 150
    matrix = rng.standard_normal((n_tok, n_frames)).astype(np.float32)
    text_idx, time_idx = _hf_dtw(matrix.astype(np.float64))
    jumps = np.pad(np.diff(text_idx), (1, 0), constant_values=1).astype(bool)
    golden = time_idx[jumps]
    ours = np.asarray(dtw_jump_times(jnp.asarray(matrix)))
    np.testing.assert_array_equal(ours, golden)


def test_dtw_with_padding_masks():
    """Padded rows/cols must not change the result for the true region."""
    rng = np.random.default_rng(7)
    nt, nf = 21, 90
    matrix = rng.standard_normal((nt, nf)).astype(np.float32)
    padded = np.full((40, 128), 1e9, np.float32)
    padded[:nt, :nf] = matrix
    ours = np.asarray(dtw_jump_times(jnp.asarray(padded),
                                     n_tokens=nt, n_frames=nf))
    text_idx, time_idx = _hf_dtw(matrix.astype(np.float64))
    jumps = np.pad(np.diff(text_idx), (1, 0), constant_values=1).astype(bool)
    golden = time_idx[jumps]
    np.testing.assert_array_equal(ours[:nt], golden)
    assert (ours[nt:] == golden[-1]).all()


def test_full_alignment_postprocess_parity():
    """z-norm + median filter + head mean + DTW chain vs a numpy replica of
    generation_whisper.py:344-383."""
    import torch
    rng = np.random.default_rng(3)
    b, a, t, m = 2, 3, 25, 100
    # softmax-like attention rows
    raw = rng.standard_normal((b, a, t, m)).astype(np.float32)
    w = np.exp(raw) / np.exp(raw).sum(-1, keepdims=True)

    width = 7
    golden_all = []
    for i in range(b):
        wt = torch.from_numpy(w[i])
        std = torch.std(wt, dim=-2, keepdim=True, unbiased=False)
        mean = torch.mean(wt, dim=-2, keepdim=True)
        wt = (wt - mean) / std
        from transformers.models.whisper.generation_whisper import \
            _median_filter
        wt = _median_filter(wt, width)
        mat = wt.mean(dim=0)
        text_idx, time_idx = _hf_dtw(-mat.double().numpy())
        jumps = np.pad(np.diff(text_idx), (1, 0), constant_values=1
                       ).astype(bool)
        golden_all.append(time_idx[jumps])

    ours = np.asarray(attention_to_jump_times(
        jnp.asarray(w), width,
        n_tokens=jnp.full((b,), t, jnp.int32),
        n_frames=jnp.full((b,), m, jnp.int32)))
    for i in range(b):
        np.testing.assert_array_equal(ours[i], golden_all[i])


def test_znorm_masked_matches_unmasked_on_true_region():
    rng = np.random.default_rng(5)
    w = rng.standard_normal((3, 10, 20)).astype(np.float32)
    mask = np.zeros((3, 10), bool)
    mask[:, :7] = True
    ours = np.asarray(znorm_tokens(jnp.asarray(w), jnp.asarray(mask)))
    ref = np.asarray(znorm_tokens(jnp.asarray(w[:, :7])))
    np.testing.assert_allclose(ours[:, :7], ref, atol=1e-5)


def test_device_window_matches_host_slicing():
    """The on-device window slicer (longform._device_window via a
    generate call with staggered seeks) must reproduce the old host
    slice+pad exactly. Exercised through its public effect: windows
    sliced from a multi-window input at random per-row max_frames give
    the same segments as the same audio rows decoded one-by-one (which
    take different seek/bucket paths through the windower)."""
    import jax.numpy as jnp
    import numpy as np

    from crisperwhisper_tpu.config import GenerationOptions
    from crisperwhisper_tpu.decoding import generate
    from crisperwhisper_tpu.models import params_from_state_dict
    from helpers import (TINY_SPECIALS, rand_mel, state_dict_numpy,
                        tiny_arch, torch_tiny_model)

    arch = tiny_arch()
    tm = torch_tiny_model(seed=0)
    params = params_from_state_dict(state_dict_numpy(tm), arch,
                                    dtype=jnp.float32)
    opts = GenerationOptions(
        alignment_heads=((0, 1), (1, 3)), median_filter_width=7,
        max_initial_timestamp_index=50, compression_ratio_threshold=None,
        logprob_threshold=None, no_speech_threshold=None,
        temperatures=(0.0,), max_new_tokens=24)
    frames = 1400                      # 2.8 windows of the tiny geometry
    mel = rand_mel(batch=3, seed=77, frames=frames)
    # staggered per-row bounds: rows hit different seek offsets, bucket
    # compactions, and cropped tails inside the device windower
    max_frames = np.array([1400, 900, 600])
    batched = generate(params, arch, TINY_SPECIALS, opts, jnp.asarray(mel),
                       num_frames=max_frames.copy(),
                       max_frames=max_frames.copy())
    for i in range(3):
        solo = generate(params, arch, TINY_SPECIALS, opts,
                        jnp.asarray(mel[i:i + 1]),
                        num_frames=max_frames[i:i + 1].copy(),
                        max_frames=max_frames[i:i + 1].copy())
        assert len(solo.segments[0]) == len(batched.segments[i])
        for sa, sb in zip(solo.segments[0], batched.segments[i]):
            np.testing.assert_array_equal(np.asarray(sa["tokens"]),
                                          np.asarray(sb["tokens"]))
