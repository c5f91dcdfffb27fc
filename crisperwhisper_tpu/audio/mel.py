"""Whisper log-mel spectrogram frontend, TPU-native.

Parity contract (golden-tested in tests/test_mel.py):
  hf transformers models/whisper/feature_extraction_whisper.py:138-167
  (_torch_extract_fbank_features): hann(400) window, hop 160, centered
  reflect-padded STFT, drop the final frame, power spectrum, slaney mel
  filterbank (audio_utils.py:440 with params from
  feature_extraction_whisper.py:98-106), log10 with 1e-10 clamp, dynamic
  range clip at (max - 8.0), affine (x + 4) / 4.

Design: centered frame gather -> hann window -> `jnp.fft.rfft` (XLA FFT;
O(log n) rounding error keeps quiet-bin parity with the reference's
torch.stft, unlike an f32 matmul-DFT whose O(n) accumulation error blows up
under log10) -> mel projection as one [201, n_mels] matmul on the MXU.
Shapes are fully static: every input is a 30 s window (480000 samples ->
3000 frames). The fused Pallas kernel variant lives in audio/pallas_mel.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import FeatureConfig

# ---------------------------------------------------------------------------
# Filterbank / DFT constants (host-side numpy, computed once per geometry)
# ---------------------------------------------------------------------------


def hertz_to_mel_slaney(freq):
    """Slaney-style mel scale (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    # the 0 Hz bin takes the linear branch; keep log() off it so no
    # divide-by-zero RuntimeWarning leaks into driver/bench logs
    safe = np.where(freq >= min_log_hertz, freq, min_log_hertz)
    return np.where(freq >= min_log_hertz,
                    min_log_mel + np.log(safe / min_log_hertz) * logstep,
                    mels)


def mel_to_hertz_slaney(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(mels >= min_log_mel,
                    1000.0 * np.exp(logstep * (mels - min_log_mel)),
                    freq)


@functools.lru_cache(maxsize=8)
def mel_filter_bank(num_frequency_bins: int = 201, num_mel_filters: int = 80,
                    min_frequency: float = 0.0, max_frequency: float = 8000.0,
                    sampling_rate: int = 16000) -> np.ndarray:
    """Triangular slaney-normalized slaney-scale mel bank, [n_freq, n_mels].

    Matches hf audio_utils.py:440 `mel_filter_bank(..., norm="slaney",
    mel_scale="slaney")` as pinned by feature_extraction_whisper.py:98-106.
    """
    mel_min = hertz_to_mel_slaney(min_frequency)
    mel_max = hertz_to_mel_slaney(max_frequency)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = mel_to_hertz_slaney(mel_freqs)

    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)

    filter_diff = np.diff(filter_freqs)
    slopes = np.expand_dims(filter_freqs, 0) - np.expand_dims(fft_freqs, 1)
    down_slopes = -slopes[:, :-2] / filter_diff[:-1]
    up_slopes = slopes[:, 2:] / filter_diff[1:]
    fb = np.maximum(0.0, np.minimum(down_slopes, up_slopes))

    # slaney area normalization
    enorm = 2.0 / (filter_freqs[2: num_mel_filters + 2] -
                   filter_freqs[:num_mel_filters])
    fb = fb * np.expand_dims(enorm, 0)
    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# JAX log-mel
# ---------------------------------------------------------------------------


def _frame_signal(waveform: jax.Array, n_fft: int, hop: int,
                  num_frames: int) -> jax.Array:
    """Centered framing with reflect padding: [..., T] -> [..., F, n_fft]."""
    pad = n_fft // 2
    padded = jnp.pad(waveform, [(0, 0)] * (waveform.ndim - 1) + [(pad, pad)],
                     mode="reflect")
    # Static gather of frame windows. XLA lowers this to an efficient
    # strided gather; frame starts are compile-time constants.
    starts = np.arange(num_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return padded[..., idx]


def log_mel_spectrogram(waveform: jax.Array,
                        cfg: FeatureConfig = FeatureConfig(),
                        dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Compute Whisper log-mel features for fixed 30 s windows.

    Args:
      waveform: f32 [..., n_samples] (480000 at 16 kHz). Callers pad/trim
        to exactly 30 s first (static shapes).
    Returns:
      [..., n_mels, nb_max_frames] (e.g. [..., 80, 3000]) in ``dtype``.
    """
    if waveform.shape[-1] != cfg.n_samples:
        raise ValueError(
            f"expected {cfg.n_samples} samples (30 s), got {waveform.shape[-1]};"
            " pad/trim upstream — the frontend is static-shape")
    n_bins = cfg.n_fft // 2 + 1
    # torch.stft returns 1 + n_samples//hop frames; whisper drops the last
    # (stft[..., :-1], feature_extraction_whisper.py:153) => exactly 3000.
    num_frames = cfg.n_samples // cfg.hop_length

    frames = _frame_signal(waveform.astype(jnp.float32), cfg.n_fft,
                           cfg.hop_length, num_frames)
    window = jnp.asarray(
        (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(cfg.n_fft) / cfg.n_fft))
         ).astype(np.float32))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2

    fb = jnp.asarray(mel_filter_bank(n_bins, cfg.feature_size, 0.0, 8000.0,
                                     cfg.sampling_rate))
    # full-f32 MXU passes: the mel projection feeds log10, so the default
    # bf16-input matmul precision would put ~1e-2 noise into quiet bins.
    mel = jnp.einsum("...fk,km->...fm", power, fb,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)

    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    # dynamic-range clip over the (frame, mel) axes of each item
    max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    # [..., F, M] -> [..., M, F] to match the reference layout [B, mel, 3000]
    return jnp.swapaxes(log_spec, -2, -1).astype(dtype)


def pad_or_trim(waveform: np.ndarray, n_samples: int) -> np.ndarray:
    """Host-side pad/trim of raw audio to the static window length."""
    t = waveform.shape[-1]
    if t >= n_samples:
        return waveform[..., :n_samples]
    pad = [(0, 0)] * (waveform.ndim - 1) + [(0, n_samples - t)]
    return np.pad(waveform, pad)


@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
@functools.partial(jax.jit, static_argnames=("cfg", "dtype"))
def extract_features(waveform: jax.Array, cfg: FeatureConfig = FeatureConfig(),
                     dtype: jnp.dtype = jnp.float32) -> jax.Array:
    """Jitted batched frontend entry point: [B, 480000] -> [B, M, 3000]."""
    return log_mel_spectrogram(waveform, cfg, dtype)


def zero_mean_unit_var_norm(waveform: np.ndarray,
                            length: int | None = None,
                            padding_value: float = 0.0) -> np.ndarray:
    """Optional per-utterance normalization over the true (unpadded)
    region (hf feature_extraction_whisper.py:169-190 `do_normalize`)."""
    n = length if length is not None else waveform.shape[-1]
    true = waveform[..., :n]
    mean = true.mean(axis=-1, keepdims=True)
    var = true.var(axis=-1, keepdims=True)
    out = (waveform - mean) / np.sqrt(var + 1e-7)
    if length is not None and length < waveform.shape[-1]:
        out[..., length:] = padding_value
    return out
