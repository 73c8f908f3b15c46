"""VITS text encoder: transformer with windowed relative-position attention.

Produces prior statistics ``(m_p, logs_p)`` over the latent channels from
phoneme ids.  Hyperparameters come from the voice config
(reference: mimic3_tts/config.py:119-124 — n_layers=6, n_heads=2,
hidden=192, filter=768, kernel=3, relative window=4).

The relative-attention math follows "Self-Attention with Relative Position
Representations" (Shaw et al.) as used by VITS: learned relative key/value
embeddings over a clipped ±window, shared across heads, added to the
content logits/outputs via the pad-reshape skew trick.
"""

from __future__ import annotations

import math
import typing

import jax
import jax.numpy as jnp  # noqa: F401  (used by helpers below)

from .layers import Params, conv1d, embedding, layer_norm, sequence_mask

WINDOW_SIZE = 4  # VITS default relative-attention window


# ---------------------------------------------------------------------------
# Relative-position helpers
# ---------------------------------------------------------------------------


def _get_relative_embeddings(
    rel_emb: jax.Array, length: int, window: int
) -> jax.Array:
    """Pad/slice the learned [1, 2*window+1, D] table to [1, 2*length-1, D]."""
    pad_length = max(length - (window + 1), 0)
    slice_start = max((window + 1) - length, 0)
    slice_end = slice_start + 2 * length - 1
    if pad_length > 0:
        padded = jnp.pad(
            rel_emb, ((0, 0), (pad_length, pad_length), (0, 0))
        )
    else:
        padded = rel_emb
    return padded[:, slice_start:slice_end]


def _relative_to_absolute(x: jax.Array) -> jax.Array:
    """[B, H, L, 2L-1] relative logits -> [B, H, L, L] absolute logits."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, l * 2 * l)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, l - 1)))
    x_final = x_flat.reshape(b, h, l + 1, 2 * l - 1)
    return x_final[:, :, :l, l - 1 :]


def _absolute_to_relative(x: jax.Array) -> jax.Array:
    """[B, H, L, L] attention weights -> [B, H, L, 2L-1] relative weights."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x_flat = x.reshape(b, h, l * (2 * l - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (l, 0)))
    x_final = x_flat.reshape(b, h, l, 2 * l)
    return x_final[:, :, :, 1:]


# ---------------------------------------------------------------------------
# Multi-head attention with relative positions
# ---------------------------------------------------------------------------


def relative_attention(
    x: jax.Array,
    p: Params,
    attn_mask: jax.Array,
    n_heads: int,
    window: int = WINDOW_SIZE,
) -> jax.Array:
    """Self-attention block.

    x: [B, T, C]; attn_mask: [B, 1, T, T] (1 = attend).
    Param keys: conv_q/conv_k/conv_v/conv_o (1x1 convs), emb_rel_k/emb_rel_v
    ([1, 2*window+1, head_dim], heads shared).

    (A fused Pallas attention kernel was tried and removed: Mosaic
    rejects its sub-128-lane mask block specs on real TPU, and the
    encoder is ~5% of pipeline time — docs/STATUS.md round-3
    "Pallas attention: negative".)
    """
    b, t, c = x.shape
    head_dim = c // n_heads

    q = conv1d(x, p["conv_q"])
    k = conv1d(x, p["conv_k"])
    v = conv1d(x, p["conv_v"])

    # [B, H, T, D]
    def split_heads(y: jax.Array) -> jax.Array:
        return y.reshape(b, t, n_heads, head_dim).transpose(0, 2, 1, 3)

    q = split_heads(q) / math.sqrt(head_dim)
    k = split_heads(k)
    v = split_heads(v)

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    )

    if window is not None:
        rel_k = _get_relative_embeddings(p["emb_rel_k"], t, window)
        # [B,H,T,D] x [1, 2T-1, D] -> [B,H,T,2T-1]
        rel_logits = jnp.einsum(
            "bhqd,mrd->bhqr", q, rel_k, preferred_element_type=jnp.float32
        )
        scores = scores + _relative_to_absolute(rel_logits)

    scores = jnp.where(attn_mask > 0, scores, -1e4)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
        v.dtype
    )

    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32
    ).astype(v.dtype)

    if window is not None:
        rel_weights = _absolute_to_relative(weights)
        rel_v = _get_relative_embeddings(p["emb_rel_v"], t, window)
        out = out + jnp.einsum(
            "bhqr,mrd->bhqd",
            rel_weights,
            rel_v.astype(rel_weights.dtype),
            preferred_element_type=jnp.float32,
        ).astype(out.dtype)

    out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
    return conv1d(out, p["conv_o"])


def ffn(
    x: jax.Array,
    p: Params,
    x_mask: jax.Array,
    kernel_size: int,
) -> jax.Array:
    """Conv feed-forward: conv(k) -> relu -> conv(k), masked."""
    pad = (kernel_size - 1) // 2
    y = conv1d(x * x_mask, p["conv_1"], padding=pad)
    y = jax.nn.relu(y)
    y = conv1d(y * x_mask, p["conv_2"], padding=pad)
    return y * x_mask


# ---------------------------------------------------------------------------
# Encoder stack
# ---------------------------------------------------------------------------


def text_encoder(
    params: Params,
    ids: jax.Array,
    x_mask: jax.Array,
    *,
    n_layers: int,
    n_heads: int,
    kernel_size: int,
    window: int = WINDOW_SIZE,
) -> typing.Tuple[jax.Array, jax.Array, jax.Array]:
    """Run the text encoder.

    Returns ``(x, m_p, logs_p)``: hidden states and prior stats, all
    [B, T, C]-shaped and masked.
    """
    hidden = params["emb"]["weight"].shape[1]
    x = embedding(ids, params["emb"]) * math.sqrt(hidden)
    x = x * x_mask

    attn_mask = (
        x_mask[:, None, :, 0:1] * x_mask[:, None, None, :, 0]
    )  # [B,1,T,1]*[B,1,1,T] -> [B,1,T,T]

    for i in range(n_layers):
        si = str(i)
        y = relative_attention(
            x,
            params["attn_layers"][si],
            attn_mask,
            n_heads,
            window,
        )
        x = layer_norm(x + y, params["norm_layers_1"][si])
        y = ffn(x, params["ffn_layers"][si], x_mask, kernel_size)
        x = layer_norm(x + y, params["norm_layers_2"][si])

    x = x * x_mask
    stats = conv1d(x, params["proj"]) * x_mask
    inter = stats.shape[-1] // 2
    m_p = stats[..., :inter]
    logs_p = stats[..., inter:]
    return x, m_p, logs_p


__all__ = [
    "text_encoder",
    "relative_attention",
    "ffn",
    "sequence_mask",
    "WINDOW_SIZE",
]
