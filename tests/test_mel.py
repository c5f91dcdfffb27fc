"""Golden parity: our JAX log-mel frontend vs the HF WhisperFeatureExtractor.

Tolerance band per the reference's own torch/numpy parity claim
(hf feature_extraction_whisper.py:110-112,141): ~1e-5.
"""

import numpy as np
import pytest

from crisperwhisper_tpu.audio import (FeatureConfig, extract_features,
                                      mel_filter_bank, pad_or_trim)


@pytest.fixture(scope="module")
def hf_extractor():
    from transformers import WhisperFeatureExtractor
    return WhisperFeatureExtractor(feature_size=80)


def _rand_audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    n = int(seconds * 16000)
    # mix of tones + noise so the spectrogram has structure
    t = np.arange(n) / 16000.0
    sig = (0.3 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1333 * t)
           + 0.05 * rng.standard_normal(n))
    return sig.astype(np.float32)


def test_mel_filter_bank_matches_hf():
    from transformers.audio_utils import mel_filter_bank as hf_bank
    ours = mel_filter_bank(201, 80, 0.0, 8000.0, 16000)
    theirs = hf_bank(num_frequency_bins=201, num_mel_filters=80,
                     min_frequency=0.0, max_frequency=8000.0,
                     sampling_rate=16000, norm="slaney", mel_scale="slaney")
    np.testing.assert_allclose(ours, theirs.astype(np.float32), atol=1e-7)


@pytest.mark.parametrize("seconds", [30.0, 7.3])
def test_log_mel_matches_hf(hf_extractor, seconds):
    audio = _rand_audio(seconds)
    golden = hf_extractor(audio, sampling_rate=16000,
                          return_tensors="np").input_features[0]
    cfg = FeatureConfig()
    padded = pad_or_trim(audio[None, :], cfg.n_samples)
    ours = np.asarray(extract_features(padded, cfg))[0]
    assert ours.shape == golden.shape == (80, 3000)
    np.testing.assert_allclose(ours, golden, atol=5e-5, rtol=1e-5)


def test_log_mel_128_bins_large_v3_geometry(hf_extractor):
    from transformers import WhisperFeatureExtractor
    hf = WhisperFeatureExtractor(feature_size=128)
    audio = _rand_audio(12.0, seed=3)
    golden = hf(audio, sampling_rate=16000, return_tensors="np").input_features[0]
    cfg = FeatureConfig(feature_size=128)
    ours = np.asarray(extract_features(pad_or_trim(audio[None], cfg.n_samples),
                                       cfg))[0]
    np.testing.assert_allclose(ours, golden, atol=5e-5, rtol=1e-5)


def test_batched_frontend_shape():
    cfg = FeatureConfig()
    batch = np.stack([_rand_audio(30.0, s) for s in range(3)])
    feats = np.asarray(extract_features(batch, cfg))
    assert feats.shape == (3, 80, 3000)
    assert np.isfinite(feats).all()
