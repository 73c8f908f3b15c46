"""Pallas TPU kernel: monolithic folded HiFi-GAN stage.

The late HiFi-GAN stages are small-channel (64/32): under XLA every
conv pads the channel axis to 128 lanes, so one stage makes ~36 padded
HBM round trips and runs at ~16 TF/s effective (measured round 1,
docs/STATUS.md).  This kernel computes an ENTIRE multi-receptive-field
stage — all three resblocks (kernels 3/7/11, dilations 1/3/5, conv
pairs and residuals) plus the mean — per time tile in VMEM:

- activations live in a *time-folded* layout ``[T/F, F*C]`` with
  ``F = 128 // C``, a free row-major reshape that packs lanes fully;
- each conv becomes ``K_f`` sublane-rolled ``[rows,128] @ [128,128]``
  MXU matmuls against block-folded weights (same construction as
  ops/folding.py, which measured *negative* under XLA because each
  folded conv still round-tripped HBM — here the whole stage stays
  resident in VMEM);
- rolls run in f32 (Mosaic rotate needs 32-bit data); matmul inputs
  are cast to bf16 so the MXU runs at its bf16 rate with f32
  accumulation;
- the input tile is DMA'd once with halo; one output tile is written.

HBM traffic per stage drops from ~38 GB (batch 16 x 262k samples) to
~0.6 GB.  The FLOPs inflation of folding (dense folded taps vs sparse
blocks) averages ~2.9x for the stage-3 conv set, but at full-lane bf16
MXU rates that still nets out ~3x faster than the padded XLA path.

Zero-padding conv semantics at sequence boundaries are preserved by
masking rows outside ``[0, T)`` before every conv (torch Conv1d
reference contract: mimic3_tts/voice.py:230's graph).
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.vits.layers import LRELU_SLOPE
from .folding import folded_kernel_span


def _leaky(x: jax.Array) -> jax.Array:
    return jnp.where(x >= 0, x, x * LRELU_SLOPE)


@functools.lru_cache(maxsize=None)
def _stage_plan(
    kernel_sizes: typing.Tuple[int, ...],
    dilations: typing.Tuple[typing.Tuple[int, ...], ...],
    fold: int,
) -> typing.Tuple[typing.Tuple[typing.Tuple[int, int, int], ...], int]:
    """Static conv schedule: per conv (w_offset, k_f, dt_min); total K_f.

    Order: for each resblock r, for each dilation step j:
    convs1[r][j] then convs2[r][j].
    """
    plan = []
    offset = 0
    for r, k in enumerate(kernel_sizes):
        for j, d in enumerate(dilations[r]):
            for dil in (d, 1):  # conv1 (dilated) then conv2
                dt_min, dt_max = folded_kernel_span(k, dil, fold)
                k_f = dt_max - dt_min + 1
                plan.append((offset, k_f, dt_min))
                offset += k_f
    return tuple(plan), offset


def transpose_span(
    kernel_size: int, stride: int, padding: int,
    fold_in: int, fold_out: int,
) -> typing.Tuple[int, int]:
    """(dt_min, dt_max) in INPUT folded rows of a transposed conv.

    Output sample t = fold_out*r + jo reads input sample
    m = (t + padding - j) / stride  (taps j where that divides evenly);
    in input-folded rows m = fold_in*(r + dt) + ri.
    """
    dts = []
    for jo in range(fold_out):
        for j in range(kernel_size):
            u = jo + padding - j
            if u % stride:
                continue
            e = u // stride
            dts.append(e // fold_in)
    return min(dts), max(dts)


def fold_transpose_weight(
    weight: jax.Array,  # [K, Cin, Cout]
    stride: int,
    padding: int,
    fold_in: int,
    fold_out: int,
) -> typing.Tuple[jax.Array, int]:
    """Folded block weight for a transposed conv: (w_f [K_f, fold_in*Cin,
    fold_out*Cout], dt_min).  Same trace-time assembly as the regular
    folded conv (fold_stage_weights)."""
    k, c_in, c_out = weight.shape
    dt_min, dt_max = transpose_span(
        k, stride, padding, fold_in, fold_out
    )
    k_f = dt_max - dt_min + 1
    w_f = jnp.zeros(
        (k_f, fold_in * c_in, fold_out * c_out), jnp.float32
    )
    for jo in range(fold_out):
        for j in range(k):
            u = jo + padding - j
            if u % stride:
                continue
            e = u // stride
            dt = e // fold_in
            ri = e - dt * fold_in
            w_f = w_f.at[
                dt - dt_min,
                ri * c_in : (ri + 1) * c_in,
                jo * c_out : (jo + 1) * c_out,
            ].add(weight[j].astype(jnp.float32))
    return w_f, dt_min


def fold_stage_weights(
    resblock_params: typing.Sequence[typing.Mapping],
    kernel_sizes: typing.Sequence[int],
    dilations: typing.Sequence[typing.Sequence[int]],
    fold: int,
    dtype: jnp.dtype = jnp.bfloat16,
) -> typing.Tuple[jax.Array, jax.Array]:
    """Build (w_all [sum K_f, FC, FC] dtype, bias_all [n_convs, FC] f32).

    Weight-norm must already be folded.  The block-weight assembly is
    trace-time jnp (weights may be traced); shapes are static.
    """
    from ..models.vits.layers import fold_weight_norm

    plan, total = _stage_plan(
        tuple(kernel_sizes),
        tuple(tuple(d) for d in dilations),
        fold,
    )
    ws: typing.List[jax.Array] = []
    bs: typing.List[jax.Array] = []
    idx = 0
    for r, k in enumerate(kernel_sizes):
        rp = resblock_params[r]
        for j, d in enumerate(dilations[r]):
            sj = str(j)
            for dil, pkey in ((d, "convs1"), (1, "convs2")):
                p = fold_weight_norm(rp[pkey][sj])
                weight = p["weight"]  # [K, C, C]
                kk, c, c_out = weight.shape
                pad = dil * (kk - 1) // 2
                _, k_f, dt_min = plan[idx]
                idx += 1
                w_f = jnp.zeros(
                    (k_f, fold * c, fold * c_out), jnp.float32
                )
                for ro in range(fold):
                    for tap in range(kk):
                        o = ro + tap * dil - pad
                        dt = o // fold
                        ri = o - dt * fold
                        w_f = w_f.at[
                            dt - dt_min,
                            ri * c : (ri + 1) * c,
                            ro * c_out : (ro + 1) * c_out,
                        ].add(weight[tap].astype(jnp.float32))
                ws.append(w_f)
                bias = p.get("bias")
                if bias is None:
                    bias = jnp.zeros((c_out,), jnp.float32)
                bs.append(jnp.tile(bias.astype(jnp.float32), fold))
    w_all = jnp.concatenate(ws, axis=0).astype(dtype)
    bias_all = jnp.stack(bs, axis=0)
    assert w_all.shape[0] == total
    return w_all, bias_all


def _stage_kernel(
    x_hbm,  # [B, T_f + 2*halo_f, FC] bf16/f32, HBM (pre-padded)
    w_ref,  # [sum K_f, FC, FC] VMEM
    b_ref,  # [n_convs, FC] VMEM f32
    out_ref,  # [1, tile_f, FC] VMEM block
    x_tile,  # scratch VMEM [tile_f + 2*halo_f, FC] (input dtype)
    sem,
    *,
    tile_f: int,
    halo_f: int,
    t_f: int,
    plan: typing.Tuple[typing.Tuple[int, int, int], ...],
    n_res: int,
    inv_n_res: float,
    has_ups: bool = False,
    has_post: bool = False,
):
    b = pl.program_id(0)
    i = pl.program_id(1)
    rows = tile_f + 2 * halo_f

    copy = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(i * tile_f, rows), :],
        x_tile,
        sem,
    )
    copy.start()
    copy.wait()

    # sequence-boundary mask in folded rows (valid global row in [0,t_f))
    pos = i * tile_f - halo_f + jax.lax.broadcasted_iota(
        jnp.int32, (rows, 1), 0
    )
    inside = pos < t_f  # left edge handled by host zero-pad (pos >= 0
    # rows of the first tile start at -halo_f where x is zero; lrelu(0)=0
    # but later convs add bias, so mask both edges)
    inside = (pos >= 0) & inside

    # State and elementwise math stay f32 (Mosaic's rotate needs 32-bit
    # data and v5e has no bf16 vector compare for the leaky-relu).  For
    # bf16-weight kernels the per-TAP shifts run on the activations'
    # packed f32 bitcast view (adjacent-row pairing: an even bf16 row
    # shift == half that shift on the view), halving roll bytes and
    # feeding the MXU bf16 directly; odd shifts reuse one f32-rolled
    # copy per conv.
    packed = w_ref.dtype == jnp.bfloat16
    half_rows = rows // 2
    x0 = x_tile[:].astype(jnp.float32)

    def folded_conv(a, conv_idx):
        """conv of f32 activations a; returns f32 [rows, FC]."""
        w_off, k_f, dt_min = plan[conv_idx]
        a = jnp.where(inside, a, 0.0)  # zero-pad conv semantics
        bias = jnp.broadcast_to(
            b_ref[conv_idx][None, :], (rows, a.shape[-1])
        ).astype(jnp.float32)
        # two independent accumulation chains so tap t+1's roll/matmul
        # can issue while tap t's matmul drains (a single chain
        # serializes VPU rolls against MXU work)
        accs = [bias, jnp.zeros_like(bias)]
        if packed:
            a32 = pltpu.bitcast(a.astype(jnp.bfloat16), jnp.float32)
            a32_odd = pltpu.bitcast(
                pltpu.roll(a, rows - 1, 0).astype(jnp.bfloat16),
                jnp.float32,
            )
            for t in range(k_f):
                delta = dt_min + t
                if delta % 2 == 0:
                    src, half = a32, (delta // 2) % half_rows
                else:
                    src, half = a32_odd, ((delta - 1) // 2) % half_rows
                if half:
                    src = pltpu.roll(src, half_rows - half, 0)
                accs[t % 2] = accs[t % 2] + jnp.dot(
                    pltpu.bitcast(src, jnp.bfloat16),
                    w_ref[w_off + t],
                    preferred_element_type=jnp.float32,
                )
        else:
            for t in range(k_f):
                off = (dt_min + t) % rows
                shifted = pltpu.roll(a, rows - off, 0)  # == a[r+delta]
                accs[t % 2] = accs[t % 2] + jnp.dot(
                    shifted.astype(w_ref.dtype),
                    w_ref[w_off + t],
                    preferred_element_type=jnp.float32,
                )
        return accs[0] + accs[1]

    # optional fused transposed-conv upsampler: one extra folded conv
    # at plan[0] mapping the previous stage's folded layout onto this
    # stage's (input rows and output rows are 1:1 aligned)
    base = 0
    if has_ups:
        x0 = folded_conv(_leaky(x0), 0)
        base = 1

    # per dilation step: x += conv2(lrelu(conv1(lrelu(x), d))).
    # The n_res resblock chains are independent — interleaving their
    # convs gives the scheduler independent VPU/MXU work between the
    # taps of each (dependent) chain.
    n_steps = (len(plan) - base) // (2 * n_res)
    states = [x0] * n_res
    for j in range(n_steps):
        xts = [
            folded_conv(
                _leaky(states[r]), base + r * 2 * n_steps + j * 2
            )
            for r in range(n_res)
        ]
        xts = [
            folded_conv(
                _leaky(xt), base + r * 2 * n_steps + j * 2 + 1
            )
            for r, xt in enumerate(xts)
        ]
        states = [s + xt for s, xt in zip(states, xts)]
    total = sum(states[1:], states[0]) * inv_n_res

    if has_post:
        # final head fused in: audio = tanh(conv_post(lrelu(y))).
        # The stage output itself is never written to HBM — only the
        # waveform (folded: fold samples in the low lanes per row).
        audio = jnp.tanh(folded_conv(_leaky(total), len(plan) - 1))
        out_ref[0, :, :] = pltpu.roll(audio, rows - halo_f, 0)[
            :tile_f, : out_ref.shape[-1]
        ].astype(out_ref.dtype)
    else:
        out_ref[0, :, :] = pltpu.roll(total, rows - halo_f, 0)[
            :tile_f
        ].astype(out_ref.dtype)


def _pick_tile(t_f: int, max_tile: int = 2048) -> typing.Optional[int]:
    tile = min(max_tile, t_f)
    while tile >= 128 and t_f % tile:
        tile //= 2
    return tile if t_f % tile == 0 else None


@functools.partial(
    jax.jit,
    static_argnames=(
        "plan", "n_res", "has_ups", "out_width", "t_f", "tile_f",
        "halo_f", "interpret",
    ),
)
def _stage_call(
    x_pad: jax.Array,  # [B, t_f + 2*halo_f, 128] (folded + padded)
    w_all: jax.Array,
    bias_all: jax.Array,
    *,
    plan: typing.Tuple[typing.Tuple[int, int, int], ...],
    n_res: int,
    has_ups: bool,
    out_width: int,  # 128 for the stage output; fold for fused audio
    t_f: int,
    tile_f: int,
    halo_f: int,
    interpret: bool = False,
) -> jax.Array:
    batch = x_pad.shape[0]
    fc = x_pad.shape[-1]
    has_post = out_width != fc

    kernel = functools.partial(
        _stage_kernel,
        tile_f=tile_f,
        halo_f=halo_f,
        t_f=t_f,
        plan=plan,
        n_res=n_res,
        inv_n_res=1.0 / n_res,
        has_ups=has_ups,
        has_post=has_post,
    )
    grid = (batch, t_f // tile_f)
    out_dtype = jnp.float32 if has_post else x_pad.dtype
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                w_all.shape, lambda b, i: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                bias_all.shape, lambda b, i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_f, out_width), lambda b, i: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, t_f, out_width), out_dtype
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_f + 2 * halo_f, fc), x_pad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            # the 16 MB scoped-vmem default is XLA's conservative cap,
            # not the physical VMEM; the fused ups+stage+post variant
            # needs slightly more at tile 2048 (measured 16.26 MB)
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x_pad, w_all, bias_all)


def hifigan_stage_fused(
    resblock_params: typing.Sequence[typing.Mapping],
    x: jax.Array,  # [B, T, C] — pre-upsample activation if ups_params
    kernel_sizes: typing.Sequence[int],
    dilations: typing.Sequence[typing.Sequence[int]],
    *,
    ups_params: typing.Optional[typing.Mapping] = None,
    ups_stride: int = 2,
    ups_padding: typing.Optional[int] = None,
    post_params: typing.Optional[typing.Mapping] = None,
    max_tile: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """Whole MRF stage (mean of resblock1 outputs) as one Pallas kernel.

    With ``ups_params`` the preceding lrelu + transposed-conv upsampler
    is fused in as one extra folded matmul group: ``x`` is then the
    PRE-upsample activation and the returned stage output is at
    ``T * ups_stride`` samples and the upsampler's output channels.

    With ``post_params`` (the decoder's final 1-channel conv — only
    valid on the LAST stage) the kernel also fuses
    ``tanh(conv_post(lrelu(y)))`` and returns the float32 WAVEFORM
    ``[B, T_out]`` instead of the stage activation; the stage output
    never touches HBM.

    Unsupported shapes raise ValueError so the caller can fall back to
    the XLA path; weight norm must be foldable (inference params).
    """
    from ..models.vits.layers import fold_weight_norm

    batch, t, c = x.shape
    dtype = x.dtype  # folded weights match the activations' dtype

    ups_w = None
    if ups_params is not None:
        p = fold_weight_norm(ups_params)
        ups_w = p["weight"]  # [K, Cin, Cout]
        k_u, c_in, c_out = ups_w.shape
        if c_in != c or 128 % c_in or 128 % c_out:
            raise ValueError(
                f"ups channels {c_in}->{c_out} not foldable"
            )
        fold_in = 128 // c_in
        fold = 128 // c_out  # output folding (stage layout)
        if fold != ups_stride * fold_in:
            raise ValueError(
                f"stride {ups_stride} misaligns foldings "
                f"{fold_in}->{fold}"
            )
        if ups_padding is None:
            ups_padding = (k_u - ups_stride) // 2
        t_out = t * ups_stride
    else:
        if 128 % c:
            raise ValueError(f"C={c} does not divide 128")
        fold = 128 // c
        t_out = t
    if fold < 2:
        raise ValueError("no folding needed at C>=128")
    if t_out % fold:
        raise ValueError(f"T={t_out} not divisible by fold={fold}")
    t_f = t_out // fold
    # fold<4 carries a bigger folded-weight table (more K_f taps):
    # tile 2048 blows the 16 MB VMEM budget there (measured), 1024 fits
    if fold < 4:
        max_tile = min(max_tile, 1024)
    tile_f = _pick_tile(t_f, max_tile)
    if tile_f is None:
        raise ValueError(f"T/fold={t_f} has no aligned tile")

    if not interpret and jax.default_backend() != "tpu":
        interpret = True  # Mosaic lowering is TPU-only

    ks = tuple(kernel_sizes)
    ds = tuple(tuple(d) for d in dilations)
    plan, _ = _stage_plan(ks, ds, fold)
    w_all, bias_all = fold_stage_weights(
        resblock_params, ks, ds, fold, dtype=dtype
    )

    has_ups = ups_params is not None
    if has_ups:
        w_u, dt_min_u = fold_transpose_weight(
            ups_w, ups_stride, ups_padding, fold_in, fold
        )
        k_f_u = w_u.shape[0]
        bias_u = ups_params.get("bias")
        if bias_u is None:
            bias_u = jnp.zeros((c_out,), jnp.float32)
        # prepend the ups conv: plan offsets shift by its tap count
        plan = ((0, k_f_u, dt_min_u),) + tuple(
            (off + k_f_u, k_f, dm) for off, k_f, dm in plan
        )
        w_all = jnp.concatenate(
            [w_u.astype(w_all.dtype), w_all], axis=0
        )
        bias_all = jnp.concatenate(
            [
                jnp.tile(bias_u.astype(jnp.float32), fold)[None, :],
                bias_all,
            ],
            axis=0,
        )

    has_post = post_params is not None
    if has_post:
        p = fold_weight_norm(post_params)
        w_post = p["weight"]  # [K, C, 1]
        k_p, c_p, c_p_out = w_post.shape
        if c_p != 128 // fold or c_p_out != 1:
            raise ValueError(
                f"post conv {c_p}->{c_p_out} does not fit the stage"
            )
        pad_p = (k_p - 1) // 2
        dt_min_p, dt_max_p = folded_kernel_span(k_p, 1, fold)
        k_f_p = dt_max_p - dt_min_p + 1
        # folded post weight, zero-padded to the shared 128-lane width
        w_fp = jnp.zeros((k_f_p, 128, 128), jnp.float32)
        for ro in range(fold):
            for tap in range(k_p):
                o = ro + tap - pad_p
                dt = o // fold
                ri = o - dt * fold
                w_fp = w_fp.at[
                    dt - dt_min_p,
                    ri * c_p : (ri + 1) * c_p,
                    ro,
                ].add(w_post[tap, :, 0].astype(jnp.float32))
        bias_p = p.get("bias")
        post_bias = jnp.zeros((128,), jnp.float32)
        if bias_p is not None:
            post_bias = post_bias.at[:fold].set(
                jnp.tile(bias_p.astype(jnp.float32), fold)
            )
        plan = plan + ((w_all.shape[0], k_f_p, dt_min_p),)
        w_all = jnp.concatenate(
            [w_all, w_fp.astype(w_all.dtype)], axis=0
        )
        bias_all = jnp.concatenate(
            [bias_all, post_bias[None, :]], axis=0
        )

    # halo: stage receptive field in folded rows (+ the ups/post convs'
    # own spans), rounded to a sublane multiple for aligned DMA
    rf = 0
    for r, k in enumerate(ks):
        span = sum((k - 1) // 2 * d + (k - 1) // 2 for d in ds[r])
        rf = max(rf, span)
    halo_rows = -(-rf // fold)  # ceil(rf / fold)
    if has_ups:
        halo_rows += max(
            abs(plan[0][2]), plan[0][1] + plan[0][2] - 1, 1
        )
    if has_post:
        # conv_post's exact folded span (fold=4 -> +-1 row, fold=2 ->
        # +-2 rows for k=7)
        halo_rows += max(abs(dt_min_p), dt_max_p, 1)
    halo_f = -(-halo_rows // 8) * 8  # round up to sublane multiple

    fold_x = fold_in if has_ups else fold
    x_f = x.reshape(batch, t // fold_x, fold_x * c)
    x_pad = jnp.pad(x_f, ((0, 0), (halo_f, halo_f), (0, 0)))

    out = _stage_call(
        x_pad, w_all, bias_all,
        plan=plan, n_res=len(ks), has_ups=has_ups,
        out_width=fold if has_post else 128,
        t_f=t_f, tile_f=tile_f, halo_f=halo_f,
        interpret=interpret,
    )
    if has_post:
        return out.reshape(batch, t_out)  # float32 waveform
    c_final = 128 // fold
    return out.reshape(batch, t_out, c_final)
