"""Fused Pallas log-mel kernel.

Fuses windowed-DFT (as one MXU matmul against a precomputed cos|sin
basis), power spectrum, mel projection, and log10 into a single VMEM-
resident pass per frame block — the intermediate spectrogram and power
tensors never touch HBM (the XLA path materializes both). Frame gathering
stays on the XLA side (a cheap strided gather); all kernel shapes are
padded to MXU/VPU tiles: basis [512, 512] with cos rows in lanes 0..200
and sin rows in lanes 256..456, mel bank [256, n_mels_pad].

Numerics: the DFT matmul runs at Precision.HIGHEST (full-f32 MXU passes) —
measured parity vs the rfft path is ~8e-5 worst-case / <1e-6 p99 on TPU.
Throughput matches the rfft path (the frontend is gather-bound), so the
rfft path stays the default; select this kernel with CW_PALLAS_MEL=1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import FeatureConfig
from .mel import _frame_signal, mel_filter_bank

_N_BINS = 201       # 400-point real DFT
_PAD_K = 512        # padded basis width: cos at [0,201), sin at [256,457)
_SIN_OFF = 256


@functools.lru_cache(maxsize=4)
def _padded_basis(n_fft: int = 400) -> np.ndarray:
    """[512, 512] windowed DFT basis (rows = taps, cols = cos|sin bins)."""
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    t = np.arange(n_fft, dtype=np.float64)
    k = np.arange(_N_BINS, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(t, k) / n_fft
    basis = np.zeros((_PAD_K, _PAD_K), np.float32)
    basis[:n_fft, :_N_BINS] = (np.cos(ang) * window[:, None])
    basis[:n_fft, _SIN_OFF:_SIN_OFF + _N_BINS] = (-np.sin(ang)
                                                  * window[:, None])
    return basis


@functools.lru_cache(maxsize=4)
def _padded_melbank(n_mels: int, sampling_rate: int = 16000) -> np.ndarray:
    """[256, n_mels_pad] mel bank (rows = freq bins, zero-padded)."""
    fb = mel_filter_bank(_N_BINS, n_mels, 0.0, 8000.0, sampling_rate)
    n_pad = max(128, ((n_mels + 127) // 128) * 128)
    out = np.zeros((_SIN_OFF, n_pad), np.float32)
    out[:_N_BINS, :n_mels] = fb
    return out


def _mel_kernel(frames_ref, basis_ref, fb_ref, out_ref):
    frames = frames_ref[0]                               # [FB, 512]
    # HIGHEST: full-f32 MXU passes — the spectrogram feeds log10, so the
    # default bf16-input truncation would corrupt quiet bins
    spec = jnp.dot(frames, basis_ref[:],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)  # [FB, 512]
    power = (spec[:, :_SIN_OFF] ** 2
             + spec[:, _SIN_OFF:] ** 2)                  # [FB, 256]
    mel = jnp.dot(power, fb_ref[:],
                  preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)   # [FB, n_pad]
    out_ref[0] = jnp.log10(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("cfg", "dtype", "block_frames",
                                             "interpret"))
def pallas_log_mel(waveform: jax.Array, cfg: FeatureConfig = FeatureConfig(),
                   dtype: jnp.dtype = jnp.float32, block_frames: int = 600,
                   interpret: bool = False) -> jax.Array:
    """[B, 480000] -> [B, n_mels, 3000] log-mel, fused kernel path."""
    if waveform.shape[-1] != cfg.n_samples:
        raise ValueError("pad/trim to the static 30 s window first")
    b = waveform.shape[0]
    num_frames = cfg.n_samples // cfg.hop_length
    frames = _frame_signal(waveform.astype(jnp.float32), cfg.n_fft,
                           cfg.hop_length, num_frames)    # [B, F, 400]
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, _PAD_K - cfg.n_fft)))
    basis = jnp.asarray(_padded_basis(cfg.n_fft))
    fb = jnp.asarray(_padded_melbank(cfg.feature_size, cfg.sampling_rate))
    n_pad = fb.shape[1]

    log_mel = pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct((b, num_frames, n_pad), jnp.float32),
        grid=(b, num_frames // block_frames),
        in_specs=[
            pl.BlockSpec((1, block_frames, _PAD_K),
                         lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_PAD_K, _PAD_K), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_SIN_OFF, n_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_frames, n_pad),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * num_frames * (_PAD_K * _PAD_K
                                        + _SIN_OFF * n_pad),
            bytes_accessed=frames.size * 4,
            transcendentals=b * num_frames * n_pad,
        ),
        interpret=interpret,
    )(frames, basis, fb)

    log_spec = log_mel[:, :, :cfg.feature_size]           # drop pad mels
    # dynamic-range clip + affine (feature_extraction_whisper.py:155-157)
    max_val = jnp.max(log_spec, axis=(1, 2), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, 1, 2).astype(dtype)


def use_pallas_mel() -> bool:
    import os
    return os.environ.get("CW_PALLAS_MEL") == "1"
