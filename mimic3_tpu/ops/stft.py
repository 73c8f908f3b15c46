"""Spectrogram / mel ops for VITS training, as XLA-friendly JAX.

Conventions match the reference training stack's audio processing (the
voice configs document them: filter_length 1024, hop 256, win 1024,
mel 80, reference: mimic3_tts/config.py:34-38):

- STFT with a Hann window, reflect-padded by (n_fft - hop)/2, center=False
  framing (torch.stft-compatible for these settings),
- linear magnitude spectrogram (the posterior encoder input),
- slaney-scaled, slaney-normalized mel filterbank (librosa-compatible),
- dynamic-range compression ``log(clamp(x, 1e-5))``.

Framing is a reshape + matmul against the windowed DFT basis, so the FFT
lands on the MXU instead of scalar FFT codepaths.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT basis: [n_fft, 2*(n_fft//2+1)] (re, im stacked)."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[None, :]
    k = np.arange(n_bins)[:, None]
    angles = -2.0 * np.pi * k * t / n_fft
    window = np.hanning(win_length + 1)[:-1]  # periodic hann
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    basis = np.concatenate(
        [np.cos(angles), np.sin(angles)], axis=0
    )  # [2*n_bins, n_fft]
    return (basis * window[None, :]).T.astype(np.float32)  # [n_fft, 2nb]


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: typing.Optional[float] = None,
) -> np.ndarray:
    """Slaney-style mel filterbank [n_bins, n_mels] (librosa-compatible)."""
    if fmax is None:
        fmax = sample_rate / 2.0

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        # slaney: linear below 1 kHz, log above
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(
            log_region,
            15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
            mel,
        )
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        f = np.where(
            log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f
        )
        return f

    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_points = np.linspace(
        hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2
    )
    hz_points = mel_to_hz(mel_points)

    fb = np.zeros((n_bins, n_mels), dtype=np.float64)
    for m in range(n_mels):
        left, center, right = hz_points[m : m + 3]
        up = (fft_freqs - left) / max(center - left, 1e-10)
        down = (right - fft_freqs) / max(right - center, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
        # slaney normalization: constant energy per channel
        enorm = 2.0 / (right - left)
        fb[:, m] *= enorm
    return fb.astype(np.float32)


def spectrogram(
    audio: jnp.ndarray,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
) -> jnp.ndarray:
    """Linear magnitude spectrogram.

    audio: [B, samples] -> [B, frames, n_fft//2+1], where
    frames = samples // hop_length (torch.stft center=False after the
    reflect padding VITS applies).
    """
    pad = (n_fft - hop_length) // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    b, n = x.shape
    num_frames = 1 + (n - n_fft) // hop_length

    # frame via strided gather: [B, frames, n_fft]
    starts = jnp.arange(num_frames) * hop_length
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = x[:, idx]  # [B, frames, n_fft]

    basis = jnp.asarray(_dft_basis(n_fft, win_length))  # [n_fft, 2nb]
    # HIGHEST: preferred_element_type only sets the ACCUMULATOR dtype;
    # without it the TPU MXU truncates inputs to bf16 (measured ~1e-2
    # spectrogram error vs an rfft oracle)
    proj = jnp.einsum(
        "bfn,nk->bfk", frames, basis,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    n_bins = n_fft // 2 + 1
    re, im = proj[..., :n_bins], proj[..., n_bins:]
    return jnp.sqrt(re * re + im * im + 1e-6)


def mel_spectrogram(
    audio: jnp.ndarray,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    hop_length: int = 256,
    win_length: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: typing.Optional[float] = None,
) -> jnp.ndarray:
    """Log-mel spectrogram [B, frames, n_mels]."""
    spec = spectrogram(audio, n_fft, hop_length, win_length)
    return spec_to_mel(spec, sample_rate, n_fft, n_mels, fmin, fmax)


def spec_to_mel(
    spec: jnp.ndarray,
    sample_rate: int = 22050,
    n_fft: int = 1024,
    n_mels: int = 80,
    fmin: float = 0.0,
    fmax: typing.Optional[float] = None,
) -> jnp.ndarray:
    """Linear spectrogram -> compressed log-mel."""
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum(
        "bfk,km->bfm", spec, fb,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.log(jnp.maximum(mel, 1e-5))
