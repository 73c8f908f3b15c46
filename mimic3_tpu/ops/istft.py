"""Inverse STFT and pseudo-QMF filterbanks (MB-iSTFT decoder support).

The multi-band iSTFT VITS variant (arXiv 2210.15975, PAPERS.md) replaces
most of HiFi-GAN's upsampling stack: the network predicts a small
magnitude/phase STFT per sub-band, each sub-band is inverted with an
iSTFT, and a fixed pseudo-QMF synthesis filterbank upsamples/combines
the bands.  FLOPs drop ~4-10x versus transposed-conv upsampling to the
full sample rate.

Everything here is XLA-friendly: iSTFT is a matmul against the inverse
DFT basis plus an overlap-add expressed as a strided reshape-sum; PQMF
synthesis is one grouped transposed conv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _inverse_basis(n_fft: int) -> np.ndarray:
    """Real inverse-DFT basis: [2*(n_fft//2+1), n_fft]."""
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft)[None, :]
    k = np.arange(n_bins)[:, None]
    angles = 2.0 * np.pi * k * t / n_fft
    # irfft weighting: DC and nyquist count once, others twice
    weights = np.full((n_bins, 1), 2.0)
    weights[0] = 1.0
    if n_fft % 2 == 0:
        weights[-1] = 1.0
    cos = np.cos(angles) * weights / n_fft
    sin = -np.sin(angles) * weights / n_fft
    return np.concatenate([cos, sin], axis=0).astype(np.float32)


def istft(
    real: jnp.ndarray,
    imag: jnp.ndarray,
    n_fft: int,
    hop_length: int,
    win_length: int | None = None,
) -> jnp.ndarray:
    """Inverse STFT with a Hann window and overlap-add.

    real/imag: [B, frames, n_fft//2+1] -> audio [B, frames*hop].
    center=False framing (matches ops.stft.spectrogram's convention);
    the window-sum normalization assumes hop <= win/2 (true for all
    configs here), with edge frames normalized by the actual overlap.
    """
    if win_length is None:
        win_length = n_fft
    b, frames, _ = real.shape

    window = np.hanning(win_length + 1)[:-1].astype(np.float32)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))

    basis = jnp.asarray(_inverse_basis(n_fft))  # [2nb, n_fft]
    spec = jnp.concatenate([real, imag], axis=-1)  # [B, F, 2nb]
    frames_t = jnp.einsum(
        "bfk,kn->bfn", spec, basis, preferred_element_type=jnp.float32
    )  # [B, F, n_fft]
    frames_t = frames_t * window[None, None, :]

    out_len = frames * hop_length + (n_fft - hop_length)
    # overlap-add: scatter each frame at f*hop.  n_fft/hop is an integer
    # ratio R: split each frame into R hop-sized pieces and add shifted
    # reshapes — pure static-shape ops.
    ratio = n_fft // hop_length
    audio = jnp.zeros((b, out_len), jnp.float32)
    for r in range(ratio):
        piece = frames_t[:, :, r * hop_length : (r + 1) * hop_length]
        flat = piece.reshape(b, frames * hop_length)
        audio = audio.at[
            :, r * hop_length : r * hop_length + frames * hop_length
        ].add(flat)

    # window-sum normalization (static numpy precompute)
    w2 = (window * window).astype(np.float32)
    wsum = np.zeros(out_len, np.float32)
    for f in range(frames):
        wsum[f * hop_length : f * hop_length + n_fft] += w2
    wsum = np.maximum(wsum, 1e-8)
    audio = audio / jnp.asarray(wsum)[None, :]

    # trim the centering padding: keep frames*hop samples starting at
    # (n_fft - hop)/2 (the same reflect-pad offset the forward uses)
    start = (n_fft - hop_length) // 2
    return audio[:, start : start + frames * hop_length]


# ---------------------------------------------------------------------------
# Pseudo-QMF filterbank
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=4)
def pqmf_filters(
    subbands: int = 4,
    taps: int = 62,
    cutoff: float = 0.142,
    beta: float = 9.0,
):
    """Cosine-modulated pseudo-QMF bank.

    Returns (analysis, synthesis), each [subbands, taps+1].  Prototype:
    Kaiser-windowed lowpass with ``cutoff`` relative to Nyquist (the
    near-perfect-reconstruction optimum for 4 bands / 62 taps).
    Analysis/synthesis differ by the sign of the (-1)^k * pi/4 phase —
    the pair property that cancels aliasing between adjacent bands.
    """
    n = np.arange(taps + 1) - taps / 2.0
    h = cutoff * np.sinc(cutoff * n)  # lowpass, cutoff rel. to Nyquist
    h *= np.kaiser(taps + 1, beta)

    k = np.arange(subbands)[:, None]
    t = np.arange(taps + 1)[None, :]
    theta = (2 * k + 1) * np.pi / (2 * subbands) * (t - taps / 2.0)
    shift = ((-1.0) ** k) * np.pi / 4
    analysis = 2 * h[None, :] * np.cos(theta + shift)
    synthesis = 2 * h[None, :] * np.cos(theta - shift)
    return (
        analysis.astype(np.float32),
        synthesis.astype(np.float32),
    )


PQMF_TAPS = 62


def pqmf_analysis(
    audio: jnp.ndarray, subbands: int = 4, taps: int = PQMF_TAPS
) -> jnp.ndarray:
    """Split audio [B, T] into critically-sampled sub-bands
    [B, T//subbands, subbands] (training-side targets)."""
    analysis, _ = pqmf_filters(subbands, taps)
    # conv weight [K, 1, S]; cross-correlation == conv with flip
    w = jnp.asarray(np.flip(analysis, axis=1).T[:, None, :].copy())
    k = taps + 1
    pad = (k - 1) // 2
    out = jax.lax.conv_general_dilated(
        audio[..., None],
        w,
        window_strides=(subbands,),
        padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out


def pqmf_synthesis(
    bands: jnp.ndarray, subbands: int = 4, taps: int = PQMF_TAPS
) -> jnp.ndarray:
    """Combine sub-bands [B, T, subbands] -> waveform [B, T*subbands].

    Zero-stuff each band by ``subbands``, filter with its synthesis
    filter, sum bands, and scale by ``subbands`` (zero-stuffing energy).
    End-to-end analysis->synthesis has a ``taps``-sample group delay.
    """
    _, synthesis = pqmf_filters(subbands, taps)
    w = jnp.asarray(np.flip(synthesis, axis=1).T[:, :, None].copy())
    k = taps + 1
    pad = (k - 1) // 2
    # asymmetric right pad makes the output exactly T*subbands samples
    out = jax.lax.conv_general_dilated(
        bands,
        w,
        window_strides=(1,),
        padding=[(pad, pad + subbands - 1)],
        lhs_dilation=(subbands,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out[..., 0] * subbands
