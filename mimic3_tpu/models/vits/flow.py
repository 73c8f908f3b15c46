"""Residual-coupling normalizing flow and its WaveNet inner network.

The flow maps the prior sample ``z_p`` to the decoder latent ``z`` (run in
reverse at synthesis; forward at training to score the posterior sample
against the prior).  Four mean-only coupling layers with channel flips in
between; each inner net is a non-causal WaveNet stack (hidden 192,
kernel 5, 4 layers) with optional global (speaker) conditioning.

Activations [B, T, C]; masks [B, T, 1].
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp

from .layers import (
    Params,
    conv1d,
    fused_add_tanh_sigmoid_multiply,
)

WN_KERNEL = 5
WN_LAYERS = 4
N_COUPLING = 4


def wavenet(
    params: Params,
    x: jax.Array,
    x_mask: jax.Array,
    g: typing.Optional[jax.Array] = None,
    *,
    kernel_size: int = WN_KERNEL,
    n_layers: int = WN_LAYERS,
    dilation_rate: int = 1,
) -> jax.Array:
    """Gated WaveNet stack with residual/skip connections (VITS ``WN``).

    x: [B, T, hidden].  g: [B, 1 or T, gin] global conditioning.
    """
    hidden = x.shape[-1]
    output = jnp.zeros_like(x)

    g_all = None
    if g is not None and "cond_layer" in params:
        g_all = conv1d(g, params["cond_layer"])  # [B, ., 2*hidden*n_layers]

    for i in range(n_layers):
        si = str(i)
        dilation = dilation_rate**i
        padding = (kernel_size * dilation - dilation) // 2
        x_in = conv1d(
            x, params["in_layers"][si], padding=padding, dilation=dilation
        )
        if g_all is not None:
            g_l = g_all[..., i * 2 * hidden : (i + 1) * 2 * hidden]
        else:
            g_l = jnp.zeros_like(x_in)
        acts = fused_add_tanh_sigmoid_multiply(x_in, g_l, hidden)
        res_skip = conv1d(acts, params["res_skip_layers"][si])
        if i < n_layers - 1:
            x = (x + res_skip[..., :hidden]) * x_mask
            output = output + res_skip[..., hidden:]
        else:
            output = output + res_skip
    return output * x_mask


def residual_coupling_layer(
    params: Params,
    x: jax.Array,
    x_mask: jax.Array,
    g: typing.Optional[jax.Array] = None,
    reverse: bool = False,
) -> jax.Array:
    """Mean-only affine coupling: x1 <- x1 +/- m(x0)."""
    half = x.shape[-1] // 2
    x0, x1 = x[..., :half], x[..., half:]

    h = conv1d(x0, params["pre"]) * x_mask
    h = wavenet(params["enc"], h, x_mask, g=g)
    m = conv1d(h, params["post"]) * x_mask  # mean_only: logs == 0

    if not reverse:
        x1 = (m + x1) * x_mask
    else:
        x1 = (x1 - m) * x_mask
    return jnp.concatenate([x0, x1], axis=-1)


def residual_coupling_block(
    params: Params,
    x: jax.Array,
    x_mask: jax.Array,
    g: typing.Optional[jax.Array] = None,
    reverse: bool = False,
    *,
    n_flows: int = N_COUPLING,
) -> jax.Array:
    """The full flow: [coupling, flip] x n_flows.

    Param layout mirrors torch: couplings live at ``flows.{0,2,4,6}``
    (flips are parameterless and occupy the odd indices).
    """
    if not reverse:
        for i in range(n_flows):
            x = residual_coupling_layer(
                params["flows"][str(2 * i)], x, x_mask, g=g, reverse=False
            )
            x = jnp.flip(x, axis=-1)
    else:
        for i in reversed(range(n_flows)):
            x = jnp.flip(x, axis=-1)
            x = residual_coupling_layer(
                params["flows"][str(2 * i)], x, x_mask, g=g, reverse=True
            )
    return x
