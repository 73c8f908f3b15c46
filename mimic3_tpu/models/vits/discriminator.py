"""GAN discriminators for VITS training (HiFi-GAN style).

- Multi-period discriminator (MPD): reshapes the waveform into 2-D
  [frames/p, p] grids for p in (2, 3, 5, 7, 11) and runs strided 2-D
  convs — catches periodic artifacts.
- Multi-scale-ish discriminator (DiscriminatorS): strided/grouped 1-D
  convs on the raw waveform (VITS uses one scale, not HiFi-GAN's three).

Waveforms are [B, samples]; internally channels-last [B, T, C] /
[B, H, W, C] so the channel axis stays on TPU lanes.
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp

from .layers import (
    LRELU_SLOPE,
    Params,
    conv1d,
    init_conv1d,
    leaky_relu,
)

PERIODS = (2, 3, 5, 7, 11)


# ---------------------------------------------------------------------------
# conv2d helper (channels-last)
# ---------------------------------------------------------------------------


def _conv2d_weight(p: Params) -> jax.Array:
    """Resolve a 2-D conv weight, folding weight norm when present
    (HWIO layout: norm over all axes but the output channel)."""
    if "weight" in p:
        return p["weight"]
    v = p["weight_v"]
    norm = jnp.sqrt(
        jnp.sum(jnp.square(v), axis=(0, 1, 2), keepdims=True)
    )
    return p["weight_g"] * v / norm


def _conv2d(
    x: jax.Array,
    p: Params,
    stride: typing.Tuple[int, int] = (1, 1),
    padding: typing.Tuple[int, int] = (0, 0),
) -> jax.Array:
    """x: [B, H, W, C]; weight: [kh, kw, Cin, Cout]."""
    w = _conv2d_weight(p).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        out = out + p["bias"].astype(out.dtype)
    return out


def _conv1d_strided(
    x: jax.Array,
    p: Params,
    stride: int = 1,
    padding: int = 0,
    groups: int = 1,
) -> jax.Array:
    # layers.conv1d handles stride/padding/groups AND weight-norm
    # resolution (conv_weight) — no second conv path to maintain
    return conv1d(x, p, stride=stride, padding=padding, groups=groups)


def _init_conv2d(
    key: jax.Array, cin: int, cout: int, kh: int, kw: int
) -> Params:
    import math

    k1, k2 = jax.random.split(key)
    fan_in = cin * kh * kw
    bound = 1.0 / math.sqrt(fan_in)
    weight = jax.random.uniform(
        k1, (kh, kw, cin, cout), jnp.float32, -bound, bound
    )
    # weight-normalized like upstream's norm_f(Conv2d) — the GAN
    # optimization geometry differs without it
    norm = jnp.sqrt(
        jnp.sum(jnp.square(weight), axis=(0, 1, 2), keepdims=True)
    )
    return {
        "weight_v": weight,
        "weight_g": norm,
        "bias": jax.random.uniform(
            k2, (cout,), jnp.float32, -bound, bound
        ),
    }


# ---------------------------------------------------------------------------
# Period discriminator
# ---------------------------------------------------------------------------

_P_CHANNELS = (32, 128, 512, 1024)


def init_period_discriminator(key: jax.Array, kernel: int = 5) -> Params:
    keys = jax.random.split(key, 6)
    chans = [1, *_P_CHANNELS]
    convs = {
        str(i): _init_conv2d(keys[i], chans[i], chans[i + 1], kernel, 1)
        for i in range(len(chans) - 1)
    }
    convs[str(len(chans) - 1)] = _init_conv2d(
        keys[4], _P_CHANNELS[-1], 1024, kernel, 1
    )
    return {
        "convs": convs,
        "conv_post": _init_conv2d(keys[5], 1024, 1, 3, 1),
    }


def period_discriminator(
    params: Params, audio: jax.Array, period: int, kernel: int = 5
) -> typing.Tuple[jax.Array, typing.List[jax.Array]]:
    """audio: [B, samples] -> (logits [B, N], feature maps)."""
    b, n = audio.shape
    pad = (period - n % period) % period
    x = jnp.pad(audio, ((0, 0), (0, pad)), mode="reflect")
    x = x.reshape(b, -1, period, 1)  # [B, frames, period, 1]

    fmaps: typing.List[jax.Array] = []
    n_convs = len(params["convs"])
    for i in range(n_convs):
        stride = (3, 1) if i < n_convs - 1 else (1, 1)
        x = _conv2d(
            x,
            params["convs"][str(i)],
            stride=stride,
            padding=((kernel - 1) // 2, 0),
        )
        x = leaky_relu(x, LRELU_SLOPE)
        fmaps.append(x)
    x = _conv2d(x, params["conv_post"], stride=(1, 1), padding=(1, 0))
    fmaps.append(x)
    return x.reshape(b, -1), fmaps


# ---------------------------------------------------------------------------
# Scale discriminator
# ---------------------------------------------------------------------------

_S_SPECS = (
    # (cout, kernel, stride, groups, padding)
    (16, 15, 1, 1, 7),
    (64, 41, 4, 4, 20),
    (256, 41, 4, 16, 20),
    (1024, 41, 4, 64, 20),
    (1024, 41, 4, 256, 20),
    (1024, 5, 1, 1, 2),
)


def init_scale_discriminator(key: jax.Array) -> Params:
    keys = jax.random.split(key, len(_S_SPECS) + 1)
    convs = {}
    cin = 1
    for i, (cout, k, _s, groups, _p) in enumerate(_S_SPECS):
        convs[str(i)] = init_conv1d(
            keys[i], cin, cout, k, groups=groups, weight_norm=True
        )
        cin = cout
    return {
        "convs": convs,
        "conv_post": init_conv1d(
            keys[-1], 1024, 1, 3, weight_norm=True
        ),
    }


def scale_discriminator(
    params: Params, audio: jax.Array
) -> typing.Tuple[jax.Array, typing.List[jax.Array]]:
    b = audio.shape[0]
    x = audio[..., None]  # [B, samples, 1]
    fmaps: typing.List[jax.Array] = []
    for i, (_c, _k, stride, groups, padding) in enumerate(_S_SPECS):
        x = _conv1d_strided(
            x, params["convs"][str(i)], stride=stride,
            padding=padding, groups=groups,
        )
        x = leaky_relu(x, LRELU_SLOPE)
        fmaps.append(x)
    x = _conv1d_strided(x, params["conv_post"], padding=1)
    fmaps.append(x)
    return x.reshape(b, -1), fmaps


# ---------------------------------------------------------------------------
# Combined
# ---------------------------------------------------------------------------


def init_discriminators(key: jax.Array) -> Params:
    keys = jax.random.split(key, len(PERIODS) + 1)
    return {
        "msd": init_scale_discriminator(keys[0]),
        "mpd": {
            str(p): init_period_discriminator(keys[i + 1])
            for i, p in enumerate(PERIODS)
        },
    }


def discriminate(
    params: Params, audio: jax.Array
) -> typing.Tuple[
    typing.List[jax.Array], typing.List[typing.List[jax.Array]]
]:
    """All discriminator heads: returns (logits list, feature-map lists)."""
    logits: typing.List[jax.Array] = []
    fmaps: typing.List[typing.List[jax.Array]] = []
    out, fm = scale_discriminator(params["msd"], audio)
    logits.append(out)
    fmaps.append(fm)
    for p in PERIODS:
        out, fm = period_discriminator(params["mpd"][str(p)], audio, p)
        logits.append(out)
        fmaps.append(fm)
    return logits, fmaps
