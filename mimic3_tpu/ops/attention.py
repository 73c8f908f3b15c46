"""Pallas TPU kernel: fused relative-position attention.

The VITS text encoder's attention adds learned relative-position logits
(clipped window) to the content logits and relative values to the output
(see models/vits/encoder.py for the XLA reference).  Under plain XLA the
rel->abs/abs->rel pad-reshape skews materialize [B, H, T, 2T-1] tensors
in HBM; this kernel computes one (batch, head) attention entirely in
VMEM: content scores, skewed relative logits, masked softmax, output,
and the relative-value correction — one HBM read per operand, one write.

Text buckets are <= 512, so a whole [T, T] score tile lives comfortably
in VMEM (512^2 * 4B = 1 MB).  Grid: (batch, heads).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rel_attention_kernel(
    q_ref,  # [1, 1, T, D]
    k_ref,  # [1, 1, T, D]
    v_ref,  # [1, 1, T, D]
    rel_k_ref,  # [D, 2T-1] (window-expanded rel-key table, transposed)
    rel_v_ref,  # [2T-1, D]
    mask_ref,  # [1, T]  (1 = valid key)
    out_ref,  # [1, 1, T, D]
    *,
    t: int,
    scale: float,
):
    q = q_ref[0, 0] * scale  # [T, D]
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    scores = jnp.dot(
        q, k.T, preferred_element_type=jnp.float32
    )  # [T, T]

    # relative logits: q @ rel_k.T gives [T, 2T-1]; entry (i, r)
    # corresponds to key j = i + (r - (T-1)).  Select the diagonal band
    # with an index comparison instead of the pad-reshape skew.
    rel_logits = jnp.dot(
        q, rel_k_ref[:], preferred_element_type=jnp.float32
    )  # [T, 2T-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    r_idx = cols - rows + (t - 1)  # in [0, 2T-2]
    # gather along axis 1: rel_logits[i, r_idx[i, j]]
    rel_abs = jnp.take_along_axis(rel_logits, r_idx, axis=1)
    scores = scores + rel_abs

    valid = mask_ref[0][None, :] > 0  # [1, T] keys
    scores = jnp.where(valid, scores, -1e4)
    weights = jax.nn.softmax(scores, axis=-1)  # [T, T] f32

    out = jnp.dot(
        weights.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    # relative-value correction: sum_j w[i,j] * rel_v[j - i + T - 1].
    # Shift each row into relative coordinates with one banded gather
    # (the mirror of the rel_abs gather above): rel_w[i, r] = w[i, r+i-(T-1)]
    w_padded = jnp.pad(weights, ((0, 0), (t - 1, t - 1)))
    r_cols = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * t - 1), 1)
    r_rows = jax.lax.broadcasted_iota(jnp.int32, (t, 2 * t - 1), 0)
    rel_weights = jnp.take_along_axis(
        w_padded, r_rows + r_cols, axis=1
    )  # [T, 2T-1]
    out = out + jnp.dot(
        rel_weights.astype(jnp.float32),
        rel_v_ref[:].astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )

    out_ref[0, 0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_relative_attention(
    q: jax.Array,  # [B, H, T, D]
    k: jax.Array,
    v: jax.Array,
    rel_k: jax.Array,  # [2T-1, D] (already window-expanded)
    rel_v: jax.Array,  # [2T-1, D]
    mask: jax.Array,  # [B, T] float (1 = valid)
    interpret: bool = False,
) -> jax.Array:
    """Attention with relative positions, one (batch, head) per program."""
    b, h, t, d = q.shape
    scale = 1.0 / (d**0.5)

    kernel = functools.partial(
        _rel_attention_kernel, t=t, scale=scale
    )

    def qkv_spec():
        return pl.BlockSpec(
            (1, 1, t, d),
            lambda bi, hi: (bi, hi, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kernel,
        grid=(b, h),
        in_specs=[
            qkv_spec(),
            qkv_spec(),
            qkv_spec(),
            pl.BlockSpec(
                (d, 2 * t - 1),
                lambda bi, hi: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (2 * t - 1, d),
                lambda bi, hi: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, t), lambda bi, hi: (bi, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=qkv_spec(),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), q.dtype),
        interpret=interpret,
    )(q, k, v, rel_k.T, rel_v, mask)
