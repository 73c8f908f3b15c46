"""HiFi-GAN decoder (vocoder): latent frames -> waveform.

Transposed-conv upsampling (rates 8·8·2·2 = 256x = hop_length) with
multi-receptive-field fusion resblocks (kernels 3/7/11, dilations 1/3/5)
per the voice config (reference: mimic3_tts/config.py:127-135).

This stack is ~95% of synthesis FLOPs; it runs in the configured decoder
dtype (bf16 by default) and its conv stacks are the target of the Pallas
fusion work in mimic3_tpu/ops.
"""

from __future__ import annotations

import typing

import jax
import jax.numpy as jnp

from .layers import (
    LRELU_SLOPE,
    Params,
    conv1d,
    conv_transpose1d,
    leaky_relu,
)


def resblock1(
    params: Params,
    x: jax.Array,
    kernel_size: int,
    dilations: typing.Sequence[int],
) -> jax.Array:
    """HiFi-GAN ResBlock1: (lrelu -> dilated conv -> lrelu -> conv) x3."""
    for j, d in enumerate(dilations):
        sj = str(j)
        pad1 = (kernel_size * d - d) // 2
        xt = leaky_relu(x, LRELU_SLOPE)
        xt = conv1d(
            xt, params["convs1"][sj], padding=pad1, dilation=d
        )
        xt = leaky_relu(xt, LRELU_SLOPE)
        pad2 = (kernel_size - 1) // 2
        xt = conv1d(xt, params["convs2"][sj], padding=pad2)
        x = x + xt
    return x


def resblock2(
    params: Params,
    x: jax.Array,
    kernel_size: int,
    dilations: typing.Sequence[int],
) -> jax.Array:
    """HiFi-GAN ResBlock2: (lrelu -> dilated conv) per dilation."""
    for j, d in enumerate(dilations):
        sj = str(j)
        pad = (kernel_size * d - d) // 2
        xt = leaky_relu(x, LRELU_SLOPE)
        xt = conv1d(xt, params["convs"][sj], padding=pad, dilation=d)
        x = x + xt
    return x


def hifigan_generator(
    params: Params,
    x: jax.Array,
    g: typing.Optional[jax.Array] = None,
    *,
    resblock_type: str = "1",
    resblock_kernel_sizes: typing.Sequence[int] = (3, 7, 11),
    resblock_dilation_sizes: typing.Sequence[typing.Sequence[int]] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    ),
    upsample_rates: typing.Sequence[int] = (8, 8, 2, 2),
    upsample_kernel_sizes: typing.Sequence[int] = (16, 16, 4, 4),
    compute_dtype: jnp.dtype = jnp.float32,
    pallas_stage_max_channels: int = 0,
) -> jax.Array:
    """Decode latent frames [B, T, inter] to a waveform [B, T*prod(rates)].

    The final conv + tanh run in float32 regardless of ``compute_dtype``
    (the waveform is peak-normalized afterwards, so mantissa precision at
    the output matters more than inside the stack).
    """
    x = x.astype(compute_dtype)
    x = conv1d(x, params["conv_pre"], padding=3)
    if g is not None and "cond" in params:
        x = x + conv1d(g.astype(compute_dtype), params["cond"])

    num_kernels = len(resblock_kernel_sizes)
    res_fn = resblock1 if resblock_type == "1" else resblock2

    for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernel_sizes)):
        stage_params = [
            params["resblocks"][str(i * num_kernels + j)]
            for j in range(num_kernels)
        ]
        last_stage = i == len(upsample_rates) - 1

        def try_fused_stage(x_in, with_ups):
            """Small-channel stages: one monolithic folded Pallas
            kernel for the whole MRF stage (mimic3_tpu/ops/stage.py),
            optionally with the preceding transposed-conv upsampler
            fused in; on the final stage the lrelu+conv_post+tanh head
            fuses in too and the kernel emits the waveform directly.
            Batch gate: the win is padded-HBM-traffic elimination,
            which scales with batch; measured on v5e the kernel gains
            +18-26% throughput at batch 16 but LOSES ~10ms at batch 1
            (streaming and single-stream stay on the XLA path).
            Returns None when the shape is unsupported (XLA fallback).
            """
            c_out = x_in.shape[-1] // 2 if with_ups else x_in.shape[-1]
            if not (
                resblock_type == "1"
                and 0 < c_out <= pallas_stage_max_channels
                and 128 % c_out == 0
                and x_in.shape[0] >= 4
            ):
                return None
            from ...ops.stage import hifigan_stage_fused

            ups_kwargs = (
                dict(
                    ups_params=params["ups"][str(i)],
                    ups_stride=u,
                    ups_padding=(k - u) // 2,
                )
                if with_ups
                else {}
            )
            try:
                return hifigan_stage_fused(
                    stage_params, x_in,
                    resblock_kernel_sizes, resblock_dilation_sizes,
                    post_params=(
                        params["conv_post"] if last_stage else None
                    ),
                    **ups_kwargs,
                )
            except ValueError:
                return None  # unsupported shape: XLA path

        out = try_fused_stage(x, with_ups=True)
        if out is None:
            x = leaky_relu(x, LRELU_SLOPE)
            x = conv_transpose1d(
                x, params["ups"][str(i)], stride=u, padding=(k - u) // 2
            )
            # ups not fusable (stride/channel mismatch) but the stage
            # itself may still be
            out = try_fused_stage(x, with_ups=False)
        if out is not None:
            if last_stage:
                return out  # [B, samples] float32 waveform
            x = out
            continue
        xs = None
        for j, (rk, rd) in enumerate(
            zip(resblock_kernel_sizes, resblock_dilation_sizes)
        ):
            out = res_fn(stage_params[j], x, rk, rd)
            xs = out if xs is None else xs + out
        x = xs / num_kernels

    x = leaky_relu(x.astype(jnp.float32), LRELU_SLOPE)
    # torch Conv1d(ch, 1, 7, padding=3, bias=False)
    x = conv1d(x, params["conv_post"], padding=3, dtype=jnp.float32)
    x = jnp.tanh(x)
    return x[..., 0]  # [B, samples]
