"""Multi-band iSTFT decoder (MB-iSTFT-VITS, arXiv 2210.15975).

A second decoder family alongside HiFi-GAN: two transposed-conv
upsampling stages (x16) with MRF resblocks, then a head that predicts a
tiny magnitude/phase STFT for each of 4 sub-bands; each band is
inverted with an iSTFT (x4) and a fixed pseudo-QMF synthesis filterbank
combines the bands (x4) — 16*4*4 = 256 = hop_length, like HiFi-GAN's
8*8*2*2, but with ~4-10x fewer FLOPs because the conv stack stops at
1/16th of the sample rate.

Voices choose it with ``model.decoder_type: "mb-istft"`` in config.json
(training from scratch / distillation; existing HiFi-GAN voices keep
their decoder).
"""

from __future__ import annotations

import math
import typing

import jax
import jax.numpy as jnp

from ...ops.istft import istft, pqmf_synthesis
from .layers import (
    LRELU_SLOPE,
    Params,
    conv1d,
    conv_transpose1d,
    init_conv1d,
    init_conv_transpose1d,
    leaky_relu,
)
from .hifigan import resblock1


def mb_istft_generator(
    params: Params,
    x: jax.Array,
    g: typing.Optional[jax.Array] = None,
    *,
    subbands: int = 4,
    istft_n_fft: int = 16,
    istft_hop: int = 4,
    resblock_kernel_sizes: typing.Sequence[int] = (3, 7, 11),
    resblock_dilation_sizes: typing.Sequence[typing.Sequence[int]] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    ),
    upsample_rates: typing.Sequence[int] = (4, 4),
    upsample_kernel_sizes: typing.Sequence[int] = (16, 16),
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    """Latent frames [B, T, inter] -> waveform [B, T*hop].

    hop = prod(upsample_rates) * istft_hop * subbands.
    """
    x = x.astype(compute_dtype)
    x = conv1d(x, params["conv_pre"], padding=3)
    if g is not None and "cond" in params:
        x = x + conv1d(g.astype(compute_dtype), params["cond"])

    num_kernels = len(resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernel_sizes)):
        x = leaky_relu(x, LRELU_SLOPE)
        x = conv_transpose1d(
            x, params["ups"][str(i)], stride=u, padding=(k - u) // 2
        )
        xs = None
        for j, (rk, rd) in enumerate(
            zip(resblock_kernel_sizes, resblock_dilation_sizes)
        ):
            idx = str(i * num_kernels + j)
            out = resblock1(params["resblocks"][idx], x, rk, rd)
            xs = out if xs is None else xs + out
        x = xs / num_kernels

    x = leaky_relu(x.astype(jnp.float32), LRELU_SLOPE)
    n_bins = istft_n_fft // 2 + 1
    head = conv1d(
        x, params["conv_post"], padding=3, dtype=jnp.float32
    )  # [B, T16, subbands * 2 * n_bins]

    b, t16, _ = head.shape
    head = head.reshape(b, t16, subbands, 2, n_bins)
    log_mag = jnp.clip(head[:, :, :, 0], -12.0, 6.0)
    phase = head[:, :, :, 1]
    mag = jnp.exp(log_mag)
    real = mag * jnp.cos(phase)
    imag = mag * jnp.sin(phase)

    # iSTFT each band: fold bands into batch
    real = real.transpose(0, 2, 1, 3).reshape(b * subbands, t16, n_bins)
    imag = imag.transpose(0, 2, 1, 3).reshape(b * subbands, t16, n_bins)
    band_audio = istft(real, imag, istft_n_fft, istft_hop)
    band_audio = band_audio.reshape(b, subbands, -1).transpose(0, 2, 1)

    return pqmf_synthesis(band_audio, subbands)


def init_mb_istft(
    key: jax.Array,
    inter_channels: int,
    *,
    initial_channel: int = 512,
    subbands: int = 4,
    istft_n_fft: int = 16,
    upsample_rates: typing.Sequence[int] = (4, 4),
    upsample_kernel_sizes: typing.Sequence[int] = (16, 16),
    resblock_kernel_sizes: typing.Sequence[int] = (3, 7, 11),
    resblock_dilation_sizes: typing.Sequence[typing.Sequence[int]] = (
        (1, 3, 5),
    ) * 3,
    gin_channels: int = 0,
) -> Params:
    keys = jax.random.split(key, 64)
    ki = 0

    def next_key() -> jax.Array:
        nonlocal ki
        k = keys[ki]
        ki += 1
        return k

    p: Params = {
        "conv_pre": init_conv1d(
            next_key(), inter_channels, initial_channel, 7
        ),
        "ups": {},
        "resblocks": {},
    }
    num_kernels = len(resblock_kernel_sizes)
    ch = initial_channel
    for i, (u, k) in enumerate(
        zip(upsample_rates, upsample_kernel_sizes)
    ):
        out_ch = ch // 2
        p["ups"][str(i)] = init_conv_transpose1d(
            next_key(), ch, out_ch, k, weight_norm=True
        )
        for j, (rk, rd) in enumerate(
            zip(resblock_kernel_sizes, resblock_dilation_sizes)
        ):
            idx = str(i * num_kernels + j)
            p["resblocks"][idx] = {
                "convs1": {
                    str(jj): init_conv1d(
                        next_key(), out_ch, out_ch, rk,
                        weight_norm=True, init="normal",
                    )
                    for jj in range(len(rd))
                },
                "convs2": {
                    str(jj): init_conv1d(
                        next_key(), out_ch, out_ch, rk,
                        weight_norm=True, init="normal",
                    )
                    for jj in range(len(rd))
                },
            }
        ch = out_ch

    n_bins = istft_n_fft // 2 + 1
    p["conv_post"] = init_conv1d(
        next_key(), ch, subbands * 2 * n_bins, 7
    )
    # start with tiny magnitudes so early training doesn't clip
    p["conv_post"]["weight"] = p["conv_post"]["weight"] * 0.01
    p["conv_post"]["bias"] = p["conv_post"]["bias"] * 0.0 - 2.0

    if gin_channels > 0:
        p["cond"] = init_conv1d(
            next_key(), gin_channels, initial_channel, 1
        )
    return p


def mb_istft_hop(
    upsample_rates: typing.Sequence[int],
    istft_hop: int,
    subbands: int,
) -> int:
    return int(math.prod(upsample_rates)) * istft_hop * subbands
