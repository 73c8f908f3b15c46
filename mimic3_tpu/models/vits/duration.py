"""Duration predictors.

- :func:`stochastic_duration_predictor` — VITS's flow-based model
  (``use_sdp=True``, reference: mimic3_tts/config.py:139): dilated
  depth-separable convs conditioning a stack of ConvFlow neural-spline
  flows.  Run in reverse at inference with noise scaled by ``noise_w``
  to sample log-durations; run forward at training time to get the
  duration NLL.
- :func:`duration_predictor` — the deterministic conv predictor for
  ``use_sdp=False`` voices.

Activations [B, T, C]; masks [B, T, 1].
"""

from __future__ import annotations

import math
import typing

import jax
import jax.numpy as jnp

from .layers import Params, conv1d, layer_norm
from .transforms import piecewise_rational_quadratic_transform

SDP_NUM_BINS = 10
SDP_TAIL_BOUND = 5.0
SDP_N_FLOWS = 4
SDP_KERNEL = 3
SDP_DDS_LAYERS = 3


# ---------------------------------------------------------------------------
# Dilated depth-separable conv stack
# ---------------------------------------------------------------------------


def dds_conv(
    params: Params,
    x: jax.Array,
    x_mask: jax.Array,
    g: typing.Optional[jax.Array] = None,
    *,
    kernel_size: int = SDP_KERNEL,
    n_layers: int = SDP_DDS_LAYERS,
) -> jax.Array:
    """Dilated depth-separable convs with residuals (VITS ``DDSConv``)."""
    channels = x.shape[-1]
    if g is not None:
        x = x + g
    for i in range(n_layers):
        si = str(i)
        dilation = kernel_size**i
        padding = (kernel_size * dilation - dilation) // 2
        y = conv1d(
            x * x_mask,
            params["convs_sep"][si],
            padding=padding,
            dilation=dilation,
            groups=channels,
        )
        y = layer_norm(y, params["norms_1"][si])
        y = jax.nn.gelu(y, approximate=False)
        y = conv1d(y, params["convs_1x1"][si])
        y = layer_norm(y, params["norms_2"][si])
        y = jax.nn.gelu(y, approximate=False)
        x = x + y
    return x * x_mask


# ---------------------------------------------------------------------------
# Elementary flows over [B, T, 2] duration channels
# ---------------------------------------------------------------------------


def log_flow(
    x: jax.Array, x_mask: jax.Array, reverse: bool = False
) -> typing.Tuple[jax.Array, jax.Array]:
    if not reverse:
        y = jnp.log(jnp.maximum(x, 1e-5)) * x_mask
        logdet = jnp.sum(-y, axis=(1, 2))
        return y, logdet
    return jnp.exp(x) * x_mask, jnp.zeros(x.shape[0], x.dtype)


def elementwise_affine(
    p: Params, x: jax.Array, x_mask: jax.Array, reverse: bool = False
) -> typing.Tuple[jax.Array, jax.Array]:
    """y = m + exp(logs) * x  (params m/logs: [C])."""
    m = p["m"]
    logs = p["logs"]
    if not reverse:
        y = (m + jnp.exp(logs) * x) * x_mask
        logdet = jnp.sum(logs * x_mask, axis=(1, 2))
        return y, logdet
    x = (x - m) * jnp.exp(-logs) * x_mask
    return x, jnp.zeros(x.shape[0], x.dtype)


def flip_flow(x: jax.Array) -> jax.Array:
    return jnp.flip(x, axis=-1)


def conv_flow(
    p: Params,
    x: jax.Array,
    x_mask: jax.Array,
    g: typing.Optional[jax.Array] = None,
    reverse: bool = False,
    *,
    num_bins: int = SDP_NUM_BINS,
    tail_bound: float = SDP_TAIL_BOUND,
) -> typing.Tuple[jax.Array, jax.Array]:
    """Coupling layer whose transform is a rational-quadratic spline.

    x: [B, T, 2] — first half conditions the spline applied to the second.
    """
    half = x.shape[-1] // 2
    x0, x1 = x[..., :half], x[..., half:]

    h = conv1d(x0, p["pre"])
    h = dds_conv(p["convs"], h, x_mask, g=g)
    h = conv1d(h, p["proj"]) * x_mask

    b, t, _ = x0.shape
    # proj output [B, T, half*(3*bins-1)] splits channel-major like torch
    h = h.reshape(b, t, half, num_bins * 3 - 1)

    denom = math.sqrt(p["pre"]["weight"].shape[-1])  # sqrt(filter_channels)
    unnorm_widths = h[..., :num_bins] / denom
    unnorm_heights = h[..., num_bins : 2 * num_bins] / denom
    unnorm_derivs = h[..., 2 * num_bins :]

    x1_new, logabsdet = piecewise_rational_quadratic_transform(
        x1,
        unnorm_widths,
        unnorm_heights,
        unnorm_derivs,
        inverse=reverse,
        tails="linear",
        tail_bound=tail_bound,
    )

    x_out = jnp.concatenate([x0, x1_new], axis=-1) * x_mask
    logdet = jnp.sum(logabsdet * x_mask[..., 0][..., None], axis=(1, 2))
    if not reverse:
        return x_out, logdet
    return x_out, jnp.zeros(x.shape[0], x.dtype)


# ---------------------------------------------------------------------------
# Stochastic duration predictor
# ---------------------------------------------------------------------------


def _sdp_condition(
    params: Params,
    x: jax.Array,
    x_mask: jax.Array,
    g: typing.Optional[jax.Array],
) -> jax.Array:
    """Shared preprocessing: encoder text -> flow conditioning."""
    x = jax.lax.stop_gradient(x)
    x = conv1d(x, params["pre"])
    if g is not None and "cond" in params:
        g = jax.lax.stop_gradient(g)
        x = x + conv1d(g, params["cond"])
    x = dds_conv(params["convs"], x, x_mask)
    return conv1d(x, params["proj"]) * x_mask


def stochastic_duration_predictor_infer(
    params: Params,
    x: jax.Array,
    x_mask: jax.Array,
    rng: jax.Array,
    noise_scale: jax.Array,
    g: typing.Optional[jax.Array] = None,
    *,
    n_flows: int = SDP_N_FLOWS,
    noise: typing.Optional[jax.Array] = None,
) -> jax.Array:
    """Sample log-durations (reverse pass).  Returns [B, T, 1].

    With ``noise_scale == 0`` the path is fully deterministic (the spline
    inverse is still exercised on the zero vector), matching the
    reference's deterministic test mode
    (reference: tests/get_sample_hashes.py:106-114).
    """
    cond = _sdp_condition(params, x, x_mask, g)

    b, t, _ = x.shape
    if noise is None:
        # POSITION-INDEXED noise: the value at phoneme position p
        # depends only on (rng, p, channel) — never on the batch slot
        # or the text bucket the utterance was padded to.  Together
        # with frame-indexed prior noise (model.py) this makes
        # sampling batch-invariant: for a fixed seed an utterance's
        # durations (hence audio) are identical whether synthesized
        # alone or packed into any scheduler batch.
        base = jax.random.fold_in(rng, 2)
        keys = jax.vmap(lambda p: jax.random.fold_in(base, p))(
            jnp.arange(t)
        )
        noise = jnp.broadcast_to(
            jax.vmap(
                lambda k: jax.random.normal(k, (2,), jnp.float32)
            )(keys)[None],
            (b, t, 2),
        )
    z = noise * noise_scale * x_mask

    # Param keys use torch flow indices: flows.0 = ElementwiseAffine,
    # flows.{1,3,5,7} = ConvFlows (flips at even indices are parameterless).
    # Reverse flow order; VITS drops the first ConvFlow (flows.1) at
    # inference (flows = list(reversed(flows))[:-2] + [last]):
    # applied here: flip, cf_3, flip, cf_2, flip, cf_1, flip, affine.
    for i in reversed(range(1, n_flows)):  # conv flows 3, 2, 1 (skip 0)
        z = flip_flow(z)
        z, _ = conv_flow(
            params["flows"][str(2 * i + 1)], z, x_mask, g=cond, reverse=True
        )
    z = flip_flow(z)
    z, _ = elementwise_affine(params["flows"]["0"], z, x_mask, reverse=True)

    logw = z[..., 0:1]
    return logw


def stochastic_duration_predictor_nll(
    params: Params,
    x: jax.Array,
    x_mask: jax.Array,
    w: jax.Array,
    rng: jax.Array,
    g: typing.Optional[jax.Array] = None,
    *,
    n_flows: int = SDP_N_FLOWS,
) -> jax.Array:
    """Training negative log-likelihood of durations ``w`` [B, T, 1].

    Implements the variational bound from the VITS paper: a posterior flow
    proposes (u, v) that dequantize the integer durations, then the main
    flow scores (w - u, v).
    Returns per-example NLL summed over time: [B].
    """
    cond = _sdp_condition(params, x, x_mask, g)
    b, t, _ = x.shape

    # posterior over (u, noise)
    h_w = conv1d(w, params["post_pre"])
    h_w = dds_conv(params["post_convs"], h_w, x_mask)
    h_w = conv1d(h_w, params["post_proj"]) * x_mask

    rng_q, _ = jax.random.split(rng)
    e_q = jax.random.normal(rng_q, (b, t, 2), dtype=jnp.float32) * x_mask
    z_q = e_q
    logdet_tot_q = jnp.zeros(b, jnp.float32)

    z_q, ld = elementwise_affine(params["post_flows"]["0"], z_q, x_mask)
    logdet_tot_q += ld
    for i in range(n_flows):
        z_q, ld = conv_flow(
            params["post_flows"][str(2 * i + 1)], z_q, x_mask, g=cond + h_w
        )
        logdet_tot_q += ld
        z_q = flip_flow(z_q)

    z_u, z1 = z_q[..., 0:1], z_q[..., 1:2]
    u = jax.nn.sigmoid(z_u) * x_mask
    z0 = (w - u) * x_mask
    logdet_tot_q += jnp.sum(
        (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask,
        axis=(1, 2),
    )
    logq = (
        jnp.sum(
            -0.5 * (math.log(2 * math.pi) + jnp.square(e_q)) * x_mask,
            axis=(1, 2),
        )
        - logdet_tot_q
    )

    # main flow forward
    logdet_tot = jnp.zeros(b, jnp.float32)
    z0, ld = log_flow(z0, x_mask)
    logdet_tot += ld
    z = jnp.concatenate([z0, z1], axis=-1)

    z, ld = elementwise_affine(params["flows"]["0"], z, x_mask)
    logdet_tot += ld
    for i in range(n_flows):
        z, ld = conv_flow(
            params["flows"][str(2 * i + 1)], z, x_mask, g=cond
        )
        logdet_tot += ld
        z = flip_flow(z)

    nll = (
        jnp.sum(
            0.5 * (math.log(2 * math.pi) + jnp.square(z)) * x_mask,
            axis=(1, 2),
        )
        - logdet_tot
    )
    return nll + logq


# ---------------------------------------------------------------------------
# Deterministic duration predictor (use_sdp=False voices)
# ---------------------------------------------------------------------------


def duration_predictor(
    params: Params,
    x: jax.Array,
    x_mask: jax.Array,
    g: typing.Optional[jax.Array] = None,
    *,
    kernel_size: int = SDP_KERNEL,
) -> jax.Array:
    """Two-conv duration predictor; returns log-durations [B, T, 1]."""
    x = jax.lax.stop_gradient(x)
    if g is not None and "cond" in params:
        x = x + conv1d(jax.lax.stop_gradient(g), params["cond"])
    pad = kernel_size // 2
    x = conv1d(x * x_mask, params["conv_1"], padding=pad)
    x = jax.nn.relu(x)
    x = layer_norm(x, params["norm_1"])
    x = conv1d(x * x_mask, params["conv_2"], padding=pad)
    x = jax.nn.relu(x)
    x = layer_norm(x, params["norm_2"])
    x = conv1d(x * x_mask, params["proj"])
    return x * x_mask
