"""Primitive layers for the VITS stack (channels-last, functional).

Conventions:
- activations: ``[B, T, C]`` (channel axis = TPU lane axis),
- masks: ``[B, T, 1]`` float (1.0 = valid),
- conv weights: ``[K, Cin/groups, Cout]`` (XLA "WIO"),
- transposed-conv weights: ``[K, Cin, Cout]`` (flipped at apply time),
- parameters live in nested dicts keyed by torch-style module names so
  weights exported from torch/ONNX convert one-to-one.

Weight-normalized convs may carry either a folded ``weight`` (inference
checkpoints — the ONNX export folds weight norm) or a ``weight_g``/
``weight_v`` pair (training); :func:`conv_weight` resolves both.
"""

from __future__ import annotations

import math
import typing

import jax
import jax.numpy as jnp

Params = typing.Dict[str, typing.Any]

LRELU_SLOPE = 0.1


# ---------------------------------------------------------------------------
# Weight handling
# ---------------------------------------------------------------------------


def conv_weight(p: Params) -> jax.Array:
    """Resolve a conv's weight, folding weight norm when present.

    weight-norm: ``w = g * v / ||v||`` with the norm over all axes except
    the output-channel axis (last axis in our ``[K, Cin, Cout]`` layout).
    """
    if "weight" in p:
        return p["weight"]
    v = p["weight_v"]
    g = p["weight_g"]
    norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1), keepdims=True))
    return g * v / norm


def fold_weight_norm(p: Params) -> Params:
    """Return a copy of a conv param dict with weight norm folded."""
    if "weight" in p:
        return p
    out = {k: v for k, v in p.items() if k not in ("weight_g", "weight_v")}
    out["weight"] = conv_weight(p)
    return out


# ---------------------------------------------------------------------------
# Core ops
# ---------------------------------------------------------------------------


def conv1d(
    x: jax.Array,
    p: Params,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    dtype: typing.Optional[jnp.dtype] = None,
) -> jax.Array:
    """1-D convolution, torch ``Conv1d`` semantics (cross-correlation)."""
    w = conv_weight(p)
    if dtype is not None:
        x = x.astype(dtype)
    w = w.astype(x.dtype)  # params live in f32; compute in x's dtype
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    bias = p.get("bias")
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def conv_transpose1d(
    x: jax.Array,
    p: Params,
    *,
    stride: int,
    padding: int = 0,
    dtype: typing.Optional[jnp.dtype] = None,
) -> jax.Array:
    """1-D transposed convolution, torch ``ConvTranspose1d`` semantics.

    Implemented as a fractionally-strided conv: dilate the input by
    ``stride``, flip the kernel, swap in/out roles, pad ``K-1-padding``.
    Output length: ``(T-1)*stride - 2*padding + K``.
    """
    w = conv_weight(p)  # [K, Cin, Cout]
    if dtype is not None:
        x = x.astype(dtype)
    w = w.astype(x.dtype)
    k = w.shape[0]
    w = jnp.flip(w, axis=0)
    pad = k - 1 - padding
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32 if x.dtype == jnp.float32 else None,
    )
    bias = p.get("bias")
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def layer_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the channel (last) axis."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    normed = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = normed * p["gamma"] + p["beta"]
    return out.astype(x.dtype)


def embedding(ids: jax.Array, p: Params) -> jax.Array:
    """Token embedding lookup; ``p['weight']``: [num_symbols, C]."""
    return jnp.take(p["weight"], ids, axis=0)


def leaky_relu(x: jax.Array, slope: float = LRELU_SLOPE) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)


def fused_add_tanh_sigmoid_multiply(
    x: jax.Array, g: jax.Array, channels: int
) -> jax.Array:
    """WaveNet gate: ``tanh(a) * sigmoid(b)`` over the summed halves."""
    summed = x + g
    t_act = jnp.tanh(summed[..., :channels])
    s_act = jax.nn.sigmoid(summed[..., channels:])
    return t_act * s_act


def sequence_mask(lengths: jax.Array, max_length: int) -> jax.Array:
    """``[B, T, 1]`` float mask from lengths."""
    pos = jnp.arange(max_length)[None, :]
    mask = (pos < lengths[:, None]).astype(jnp.float32)
    return mask[..., None]


# ---------------------------------------------------------------------------
# Initializers (used for new/training voices and test fixtures)
# ---------------------------------------------------------------------------


def init_conv1d(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    kernel_size: int,
    *,
    groups: int = 1,
    bias: bool = True,
    weight_norm: bool = False,
    init: str = "torch",
    gain: float = 0.01,
) -> Params:
    """Initialize a conv param dict.

    ``init='torch'`` reproduces torch Conv1d defaults (kaiming-uniform,
    a=sqrt(5)); ``init='normal'`` is HiFi-GAN's N(0, gain) init;
    ``init='zeros'`` for the zero-initialized projection layers VITS uses
    in its flows.
    """
    k_w, k_b = jax.random.split(key)
    fan_in = (in_channels // groups) * kernel_size
    shape = (kernel_size, in_channels // groups, out_channels)
    if init == "zeros":
        weight = jnp.zeros(shape, jnp.float32)
    elif init == "normal":
        weight = gain * jax.random.normal(k_w, shape, jnp.float32)
    else:
        bound = 1.0 / math.sqrt(fan_in)
        weight = jax.random.uniform(
            k_w, shape, jnp.float32, -bound, bound
        )
    p: Params = {}
    if weight_norm:
        norm = jnp.sqrt(
            jnp.sum(jnp.square(weight), axis=(0, 1), keepdims=True)
        )
        p["weight_v"] = weight
        p["weight_g"] = norm
    else:
        p["weight"] = weight
    if bias:
        bound = 1.0 / math.sqrt(fan_in)
        if init == "zeros":
            p["bias"] = jnp.zeros((out_channels,), jnp.float32)
        else:
            p["bias"] = jax.random.uniform(
                k_b, (out_channels,), jnp.float32, -bound, bound
            )
    return p


def init_conv_transpose1d(
    key: jax.Array,
    in_channels: int,
    out_channels: int,
    kernel_size: int,
    *,
    weight_norm: bool = True,
    gain: float = 0.01,
) -> Params:
    """HiFi-GAN upsampler init: N(0, gain), stored ``[K, Cin, Cout]``."""
    k_w, k_b = jax.random.split(key)
    shape = (kernel_size, in_channels, out_channels)
    weight = gain * jax.random.normal(k_w, shape, jnp.float32)
    p: Params = {}
    if weight_norm:
        norm = jnp.sqrt(
            jnp.sum(jnp.square(weight), axis=(0, 1), keepdims=True)
        )
        p["weight_v"] = weight
        p["weight_g"] = norm
    else:
        p["weight"] = weight
    fan_in = in_channels * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    p["bias"] = jax.random.uniform(
        k_b, (out_channels,), jnp.float32, -bound, bound
    )
    return p


def init_layer_norm(channels: int) -> Params:
    return {
        "gamma": jnp.ones((channels,), jnp.float32),
        "beta": jnp.zeros((channels,), jnp.float32),
    }


def init_embedding(
    key: jax.Array, num_symbols: int, channels: int
) -> Params:
    """VITS embedding init: N(0, channels^-0.5)."""
    return {
        "weight": jax.random.normal(
            key, (num_symbols, channels), jnp.float32
        )
        * (channels**-0.5)
    }
