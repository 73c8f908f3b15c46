"""Time-folded convolutions for small-channel stages.

On TPU, bf16 tensors tile as (16, 128): a [B, T, 32] activation wastes
3/4 of every lane-tile, so HiFi-GAN's late stages (ch 64/32/16) are
bandwidth-bound through padded traffic (measured: 4-15 TF/s vs 60 at
ch=128).  Folding R consecutive time steps into channels —
``[B, T, C] -> [B, T/R, R*C]``, a free row-major reshape — packs lanes
fully.  A time conv becomes a folded conv with block-structured weights
built here at trace time:

    y[t*R + ro, co] = sum_j x[t*R + ro + j*d - pad, ci] W[j, ci, co]
    => y_f = conv(x_f, W_f),  W_f[dt, ri*C+ci, ro*C+co] = W[j, ci, co]
       where ro + j*d - pad = dt*R + ri

The folded conv spends up to ~K_f*R/K times the FLOPs (the block matrix
is mostly zeros) but runs at full-lane MXU rates; it wins whenever the
original conv is bandwidth-bound, which :func:`fold_gain` predicts from
(K, dilation, fold) so only profitable convs are folded.

Zero-padding semantics are exact: folded zero rows are R zero time
steps, so edges match the unfolded conv bit-for-bit up to float
summation order.
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp


def folded_kernel_span(
    kernel_size: int, dilation: int, fold: int
) -> typing.Tuple[int, int]:
    """(dt_min, dt_max) of the folded kernel."""
    pad = dilation * (kernel_size - 1) // 2
    dts = [
        (ro + j * dilation - pad) // fold
        for ro in range(fold)
        for j in range(kernel_size)
    ]
    return min(dts), max(dts)


def fold_gain(kernel_size: int, dilation: int, fold: int) -> float:
    """FLOPs multiplier of folding (lower is better; <~2.5 usually wins
    for bandwidth-bound small-channel convs)."""
    dt_min, dt_max = folded_kernel_span(kernel_size, dilation, fold)
    k_f = dt_max - dt_min + 1
    return k_f * fold / kernel_size


def folded_conv1d(
    x_f: jax.Array,  # [B, T/fold, fold*C]
    weight: jax.Array,  # original [K, C, C]
    bias: typing.Optional[jax.Array],  # [C]
    *,
    kernel_size: int,
    dilation: int,
    fold: int,
) -> jax.Array:
    """Apply the original conv in folded space.

    The folded weight is assembled with jnp ops (weights may be traced
    values under jit); shapes are static and tiny so the update chain
    folds away at compile time.
    """
    k, c, c_out = weight.shape
    pad = dilation * (kernel_size - 1) // 2
    dt_min, dt_max = folded_kernel_span(kernel_size, dilation, fold)
    k_f = dt_max - dt_min + 1
    w_f = jnp.zeros((k_f, fold * c, fold * c_out), weight.dtype)
    for ro in range(fold):
        for j in range(kernel_size):
            o = ro + j * dilation - pad
            dt = o // fold
            ri = o - dt * fold
            w_f = w_f.at[
                dt - dt_min,
                ri * c : (ri + 1) * c,
                ro * c_out : (ro + 1) * c_out,
            ].add(weight[j])

    out = jax.lax.conv_general_dilated(
        x_f,
        w_f.astype(x_f.dtype),
        window_strides=(1,),
        padding=[(-dt_min, dt_max)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if bias is not None:
        out = out + jnp.tile(bias, fold).astype(out.dtype)
    return out


def pick_fold(channels: int, t: int, max_fold: int = 4) -> int:
    """Fold factor packing channels toward 128 lanes (1 = don't fold)."""
    fold = 1
    while (
        fold * 2 <= max_fold
        and channels * fold * 2 <= 128
        and t % (fold * 2) == 0
    ):
        fold *= 2
    return fold


def resblock1_folded(
    params: typing.Mapping,
    x: jax.Array,  # [B, T, C]
    kernel_size: int,
    dilations: typing.Sequence[int],
    fold: int,
    max_flops_ratio: float = 4.5,
) -> jax.Array:
    """HiFi-GAN ResBlock1 with per-conv folding where profitable.

    Residuals and leaky-relu run in folded space (layout-agnostic);
    convs whose folded FLOPs multiplier exceeds ``max_flops_ratio``
    (e.g. k=11, d=5) run unfolded on a temporarily unfolded view.
    """
    from ..models.vits.hifigan import LRELU_SLOPE
    from ..models.vits.layers import conv1d, fold_weight_norm, leaky_relu

    b, t, c = x.shape
    x_f = x.reshape(b, t // fold, fold * c)

    def maybe_folded(x_f, p, k, d):
        p = fold_weight_norm(p)
        if fold_gain(k, d, fold) <= max_flops_ratio:
            return folded_conv1d(
                x_f, p["weight"], p.get("bias"),
                kernel_size=k, dilation=d, fold=fold,
            )
        # unfold -> plain conv -> refold (rare: large k*d products)
        xt = x_f.reshape(b, t, c)
        pad = d * (k - 1) // 2
        out = conv1d(xt, p, padding=pad, dilation=d)
        return out.reshape(b, t // fold, fold * c)

    for j, d in enumerate(dilations):
        sj = str(j)
        xt = leaky_relu(x_f, LRELU_SLOPE)
        xt = maybe_folded(xt, params["convs1"][sj], kernel_size, d)
        xt = leaky_relu(xt, LRELU_SLOPE)
        xt = maybe_folded(xt, params["convs2"][sj], kernel_size, 1)
        x_f = x_f + xt
    return x_f.reshape(b, t, c)
