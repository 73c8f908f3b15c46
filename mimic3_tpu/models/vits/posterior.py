"""Posterior encoder (training only): linear spectrogram -> latent z.

VITS's ``enc_q``: 1x1 pre-projection, a 16-layer WaveNet stack, and a
projection to (m_q, logs_q); z ~ N(m_q, exp(logs_q)).  Exists only at
training time — inference samples the prior instead.  Hyperparameters
from the voice config (n_layers_q, reference: mimic3_tts/config.py:136).
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp

from .flow import wavenet
from .layers import Params, conv1d, init_conv1d

POSTERIOR_WN_LAYERS = 16
POSTERIOR_WN_KERNEL = 5


def init_posterior_encoder(
    key: jax.Array,
    spec_channels: int,
    inter_channels: int,
    hidden_channels: int,
    gin_channels: int = 0,
    n_layers: int = POSTERIOR_WN_LAYERS,
) -> Params:
    from .model import _init_wavenet

    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "pre": init_conv1d(k1, spec_channels, hidden_channels, 1),
        "enc": _init_wavenet(
            k2, hidden_channels, POSTERIOR_WN_KERNEL, n_layers, gin_channels
        ),
        "proj": init_conv1d(k3, hidden_channels, inter_channels * 2, 1),
    }


def posterior_encoder(
    params: Params,
    spec: jax.Array,
    y_mask: jax.Array,
    rng: jax.Array,
    g: typing.Optional[jax.Array] = None,
    n_layers: int = POSTERIOR_WN_LAYERS,
) -> typing.Tuple[jax.Array, jax.Array, jax.Array]:
    """spec: [B, T_spec, n_bins] -> (z, m_q, logs_q), all [B, T_spec, C]."""
    h = conv1d(spec, params["pre"]) * y_mask
    h = wavenet(
        params["enc"],
        h,
        y_mask,
        g=g,
        kernel_size=POSTERIOR_WN_KERNEL,
        n_layers=n_layers,
    )
    stats = conv1d(h, params["proj"]) * y_mask
    inter = stats.shape[-1] // 2
    m_q, logs_q = stats[..., :inter], stats[..., inter:]
    z = (
        m_q
        + jax.random.normal(rng, m_q.shape, m_q.dtype)
        * jnp.exp(logs_q)
    ) * y_mask
    return z, m_q, logs_q
