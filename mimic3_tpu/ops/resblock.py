"""Pallas TPU kernel: fused HiFi-GAN residual sub-block.

One sub-block of ResBlock1 is

    out = x + conv_k(lrelu(conv_k(lrelu(x), dilation=d)))

Under plain XLA this is two conv kernels plus elementwise ops — the
activation tensor (up to ~260k samples x 32..512 channels) makes 3+
round trips through HBM per sub-block, 9 per resblock, 36+ per
upsampling stage.  This kernel computes the whole sub-block per time
tile in VMEM: the input is DMA'd once (with halo), both convs run as
per-tap ``[T, C] @ [C, C]`` MXU matmuls, and one output tile is written
back — ~3x less HBM traffic on the hot 95% of decoder FLOPs.

The input is zero-padded by the halo on the host side so every tile read
is in-bounds; time lengths are bucketed (multiples of 1024), so tiles
divide evenly.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.vits.layers import LRELU_SLOPE


def _leaky(x: jax.Array) -> jax.Array:
    return jnp.where(x >= 0, x, x * LRELU_SLOPE)


def aligned_tile(
    t: int, max_tile: int = 2048
) -> typing.Optional[int]:
    """Largest power-of-two-derived divisor of t that is <= max_tile and
    sublane-aligned; None when t has no usable tile."""
    tile = min(max_tile, t)
    while tile > 8 and t % tile:
        tile //= 2
    if t % tile:
        return None
    return tile


def _round8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _subblock_kernel(
    x_hbm,  # [B, T + 2*halo_p, C] in HBM (pre-padded)
    w1_ref,  # [K, C, C] VMEM
    b1_ref,  # [1, C]
    w2_ref,  # [K, C, C]
    b2_ref,  # [1, C]
    out_ref,  # [1, TILE, C] VMEM block
    x_tile,  # scratch VMEM [TILE + 2*halo_p, C]
    sem,
    *,
    tile: int,
    halo1: int,
    halo2: int,
    kernel_size: int,
    dilation: int,
    seq_len: int,
):
    # Mosaic requires sublane slices aligned to 8: halos are rounded up
    # and tap shifts use pltpu.roll (wraparound rows land beyond the
    # consumed region), so every slice below has an aligned start/shape.
    halo1_p = _round8(halo1)
    halo2_p = _round8(halo2)
    halo_p = halo1_p + halo2_p

    b = pl.program_id(0)
    i = pl.program_id(1)

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile, tile + 2 * halo_p), :],
        x_tile,
        sem,
    )
    copy.start()
    copy.wait()

    # Mosaic's rotate requires 32-bit data: compute in f32 in-kernel
    # (the DMA and output stay in the caller's dtype)
    x = x_tile[:].astype(jnp.float32)
    a = _leaky(x)

    mid = tile + 2 * halo2_p
    skew = halo1_p - halo1  # roll offset correction
    acc = jnp.broadcast_to(
        b1_ref[0][None, :], (mid, x.shape[-1])
    ).astype(jnp.float32)
    for j in range(kernel_size):
        off = (j * dilation + skew) % a.shape[0]
        shifted = pltpu.roll(a, a.shape[0] - off, 0)  # == a[v+off]
        acc = acc + jnp.dot(
            shifted[:mid],
            w1_ref[j].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
    # conv2 must see ZERO padding outside the sequence (torch semantics);
    # at array edges the halo region would otherwise hold lrelu(bias).
    pos = i * tile - halo2_p + jax.lax.broadcasted_iota(
        jnp.int32, (mid, 1), 0
    )
    inside = (pos >= 0) & (pos < seq_len)
    h = jnp.where(inside, _leaky(acc), 0.0)  # stays f32 for roll

    pad2 = halo2_p - halo2
    acc2 = jnp.broadcast_to(
        b2_ref[0][None, :], (tile, x.shape[-1])
    ).astype(jnp.float32)
    for j in range(kernel_size):
        off2 = (j + pad2) % h.shape[0]
        shifted = pltpu.roll(h, h.shape[0] - off2, 0)  # == h[v+off2]
        acc2 = acc2 + jnp.dot(
            shifted[:tile],
            w2_ref[j].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )

    x_center = pltpu.roll(x, x.shape[0] - halo_p, 0)[:tile]
    out_ref[0, :, :] = (x_center + acc2).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("kernel_size", "dilation", "tile", "interpret"),
)
def fused_resblock_subblock(
    x: jax.Array,  # [B, T, C]
    w1: jax.Array,  # [K, C, C]
    b1: jax.Array,  # [C]
    w2: jax.Array,  # [K, C, C]
    b2: jax.Array,  # [C]
    *,
    kernel_size: int,
    dilation: int,
    tile: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """x + conv(lrelu(conv(lrelu(x), dil)), 1), fused in one kernel."""
    batch, t, c = x.shape
    if b1 is None:  # bias-free converted convs
        b1 = jnp.zeros((c,), x.dtype)
    if b2 is None:
        b2 = jnp.zeros((c,), x.dtype)
    halo1 = dilation * (kernel_size - 1) // 2
    halo2 = (kernel_size - 1) // 2
    halo_p = _round8(halo1) + _round8(halo2)  # sublane-aligned halos

    tile = aligned_tile(t, tile)
    if tile is None:
        raise ValueError(f"T={t} has no aligned tile size")

    x_padded = jnp.pad(x, ((0, 0), (halo_p, halo_p), (0, 0)))
    dtype = x.dtype

    kernel = functools.partial(
        _subblock_kernel,
        tile=tile,
        halo1=halo1,
        halo2=halo2,
        kernel_size=kernel_size,
        dilation=dilation,
        seq_len=t,
    )

    grid = (batch, t // tile)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec(
                (kernel_size, c, c),
                lambda b, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (kernel_size, c, c),
                lambda b, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, c),
            lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, t, c), dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * halo_p, c), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        x_padded,
        w1.astype(dtype),
        b1.reshape(1, -1).astype(dtype),
        w2.astype(dtype),
        b2.reshape(1, -1).astype(dtype),
    )
