"""Top-level VITS model: parameter init and the synthesis pipeline.

Synthesis is split into two jitted stages so spectrogram-frame counts can
be bucketed tightly before the expensive decode:

1. :meth:`VitsModel.infer_durations` — encoder + duration predictor ->
   per-phoneme frame counts (tiny, cheap; its output is the only
   device->host sync in the pipeline).
2. :meth:`VitsModel.decode_frames` — encoder (recomputed — it is <2% of
   FLOPs) + prior sample + flow inverse + HiFi-GAN over a static frame
   capacity ``F``.

:meth:`VitsModel.infer` runs both in one call (fixed frame capacity) for
tests and the graft entry point.

Tensor interface matches the reference ONNX graph contract
(reference: mimic3_tts/voice.py:179-230): phoneme ids [B, T], lengths [B],
scales (noise_scale, length_scale, noise_w), optional speaker id.
"""

from __future__ import annotations

import typing
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...config import ModelConfig
from . import duration as dur
from . import encoder as enc
from . import flow as flw
from . import hifigan as hfg
from .layers import (
    Params,
    init_conv1d,
    init_conv_transpose1d,
    init_embedding,
    init_layer_norm,
    sequence_mask,
)


@dataclass(frozen=True)
class VitsHyperparams:
    """Static hyperparameters derived from a voice's ModelConfig."""

    num_symbols: int
    n_speakers: int
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    resblock: str = "1"
    resblock_kernel_sizes: typing.Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: typing.Tuple[typing.Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    upsample_rates: typing.Tuple[int, ...] = (8, 8, 2, 2)
    upsample_initial_channel: int = 512
    upsample_kernel_sizes: typing.Tuple[int, ...] = (16, 16, 4, 4)
    gin_channels: int = 0
    use_sdp: bool = True
    decoder_type: str = "hifigan"
    subbands: int = 4
    istft_n_fft: int = 16
    istft_hop: int = 4
    mb_upsample_rates: typing.Tuple[int, ...] = (4, 4)
    mb_upsample_kernel_sizes: typing.Tuple[int, ...] = (16, 16)

    @property
    def hop_length(self) -> int:
        if self.decoder_type == "mb-istft":
            hop = self.istft_hop * self.subbands
            for r in self.mb_upsample_rates:
                hop *= r
            return hop
        hop = 1
        for r in self.upsample_rates:
            hop *= r
        return hop

    @staticmethod
    def from_config(config: ModelConfig) -> "VitsHyperparams":
        return VitsHyperparams(
            decoder_type=getattr(config, "decoder_type", "hifigan"),
            subbands=getattr(config, "subbands", 4),
            istft_n_fft=getattr(config, "istft_n_fft", 16),
            istft_hop=getattr(config, "istft_hop", 4),
            mb_upsample_rates=tuple(
                getattr(config, "mb_upsample_rates", (4, 4))
            ),
            mb_upsample_kernel_sizes=tuple(
                getattr(config, "mb_upsample_kernel_sizes", (16, 16))
            ),
            num_symbols=config.num_symbols,
            n_speakers=config.n_speakers,
            inter_channels=config.inter_channels,
            hidden_channels=config.hidden_channels,
            filter_channels=config.filter_channels,
            n_heads=config.n_heads,
            n_layers=config.n_layers,
            kernel_size=config.kernel_size,
            resblock=config.resblock,
            resblock_kernel_sizes=tuple(config.resblock_kernel_sizes),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in config.resblock_dilation_sizes
            ),
            upsample_rates=tuple(config.upsample_rates),
            upsample_initial_channel=config.upsample_initial_channel,
            upsample_kernel_sizes=tuple(config.upsample_kernel_sizes),
            gin_channels=config.gin_channels,
            use_sdp=config.use_sdp,
        )


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def _init_dds_conv(
    key: jax.Array, channels: int, kernel_size: int, n_layers: int
) -> Params:
    keys = jax.random.split(key, n_layers * 2)
    p: Params = {
        "convs_sep": {},
        "convs_1x1": {},
        "norms_1": {},
        "norms_2": {},
    }
    for i in range(n_layers):
        si = str(i)
        p["convs_sep"][si] = init_conv1d(
            keys[2 * i], channels, channels, kernel_size, groups=channels
        )
        p["convs_1x1"][si] = init_conv1d(
            keys[2 * i + 1], channels, channels, 1
        )
        p["norms_1"][si] = init_layer_norm(channels)
        p["norms_2"][si] = init_layer_norm(channels)
    return p


def _init_conv_flow(
    key: jax.Array,
    half_channels: int,
    filter_channels: int,
    kernel_size: int,
    n_layers: int,
    num_bins: int,
) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "pre": init_conv1d(k1, half_channels, filter_channels, 1),
        "convs": _init_dds_conv(k2, filter_channels, kernel_size, n_layers),
        "proj": init_conv1d(
            key,
            filter_channels,
            half_channels * (num_bins * 3 - 1),
            1,
            init="zeros",
        ),
    }


def _init_sdp_flows(key: jax.Array, filter_channels: int) -> Params:
    keys = jax.random.split(key, dur.SDP_N_FLOWS)
    flows: Params = {
        "0": {
            "m": jnp.zeros((2,), jnp.float32),
            "logs": jnp.zeros((2,), jnp.float32),
        }
    }
    for i in range(dur.SDP_N_FLOWS):
        flows[str(2 * i + 1)] = _init_conv_flow(
            keys[i],
            1,
            filter_channels,
            dur.SDP_KERNEL,
            dur.SDP_DDS_LAYERS,
            dur.SDP_NUM_BINS,
        )
    return flows


def _init_sdp(key: jax.Array, hp: VitsHyperparams) -> Params:
    # VITS: StochasticDurationPredictor(hidden, 192, 3, 0.5, 4, gin)
    filter_channels = 192
    keys = jax.random.split(key, 8)
    p: Params = {
        "pre": init_conv1d(keys[0], hp.hidden_channels, filter_channels, 1),
        "proj": init_conv1d(keys[1], filter_channels, filter_channels, 1),
        "convs": _init_dds_conv(
            keys[2], filter_channels, dur.SDP_KERNEL, dur.SDP_DDS_LAYERS
        ),
        "flows": _init_sdp_flows(keys[3], filter_channels),
        "post_pre": init_conv1d(keys[4], 1, filter_channels, 1),
        "post_proj": init_conv1d(
            keys[5], filter_channels, filter_channels, 1
        ),
        "post_convs": _init_dds_conv(
            keys[6], filter_channels, dur.SDP_KERNEL, dur.SDP_DDS_LAYERS
        ),
        "post_flows": _init_sdp_flows(keys[7], filter_channels),
    }
    if hp.gin_channels > 0:
        p["cond"] = init_conv1d(
            jax.random.fold_in(key, 99), hp.gin_channels, filter_channels, 1
        )
    return p


def _init_dp(key: jax.Array, hp: VitsHyperparams) -> Params:
    # VITS: DurationPredictor(hidden, 256, 3, 0.5, gin)
    filter_channels = 256
    keys = jax.random.split(key, 4)
    p: Params = {
        "conv_1": init_conv1d(
            keys[0], hp.hidden_channels, filter_channels, dur.SDP_KERNEL
        ),
        "norm_1": init_layer_norm(filter_channels),
        "conv_2": init_conv1d(
            keys[1], filter_channels, filter_channels, dur.SDP_KERNEL
        ),
        "norm_2": init_layer_norm(filter_channels),
        "proj": init_conv1d(keys[2], filter_channels, 1, 1),
    }
    if hp.gin_channels > 0:
        p["cond"] = init_conv1d(
            keys[3], hp.gin_channels, hp.hidden_channels, 1
        )
    return p


def _init_encoder(key: jax.Array, hp: VitsHyperparams) -> Params:
    head_dim = hp.hidden_channels // hp.n_heads
    keys = jax.random.split(key, hp.n_layers * 8 + 2)
    p: Params = {
        "emb": init_embedding(keys[0], hp.num_symbols, hp.hidden_channels),
        "attn_layers": {},
        "norm_layers_1": {},
        "ffn_layers": {},
        "norm_layers_2": {},
        "proj": init_conv1d(
            keys[1], hp.hidden_channels, 2 * hp.inter_channels, 1
        ),
    }
    rel_stddev = head_dim**-0.5
    ki = 2
    for i in range(hp.n_layers):
        si = str(i)
        p["attn_layers"][si] = {
            "conv_q": init_conv1d(
                keys[ki], hp.hidden_channels, hp.hidden_channels, 1
            ),
            "conv_k": init_conv1d(
                keys[ki + 1], hp.hidden_channels, hp.hidden_channels, 1
            ),
            "conv_v": init_conv1d(
                keys[ki + 2], hp.hidden_channels, hp.hidden_channels, 1
            ),
            "conv_o": init_conv1d(
                keys[ki + 3], hp.hidden_channels, hp.hidden_channels, 1
            ),
            "emb_rel_k": rel_stddev
            * jax.random.normal(
                keys[ki + 4],
                (1, 2 * enc.WINDOW_SIZE + 1, head_dim),
                jnp.float32,
            ),
            "emb_rel_v": rel_stddev
            * jax.random.normal(
                keys[ki + 5],
                (1, 2 * enc.WINDOW_SIZE + 1, head_dim),
                jnp.float32,
            ),
        }
        p["norm_layers_1"][si] = init_layer_norm(hp.hidden_channels)
        p["ffn_layers"][si] = {
            "conv_1": init_conv1d(
                keys[ki + 6],
                hp.hidden_channels,
                hp.filter_channels,
                hp.kernel_size,
            ),
            "conv_2": init_conv1d(
                keys[ki + 7],
                hp.filter_channels,
                hp.hidden_channels,
                hp.kernel_size,
            ),
        }
        p["norm_layers_2"][si] = init_layer_norm(hp.hidden_channels)
        ki += 8
    return p


def _init_wavenet(
    key: jax.Array,
    hidden: int,
    kernel_size: int,
    n_layers: int,
    gin_channels: int,
) -> Params:
    keys = jax.random.split(key, 2 * n_layers + 1)
    p: Params = {"in_layers": {}, "res_skip_layers": {}}
    for i in range(n_layers):
        si = str(i)
        p["in_layers"][si] = init_conv1d(
            keys[2 * i], hidden, 2 * hidden, kernel_size, weight_norm=True
        )
        out_ch = 2 * hidden if i < n_layers - 1 else hidden
        p["res_skip_layers"][si] = init_conv1d(
            keys[2 * i + 1], hidden, out_ch, 1, weight_norm=True
        )
    if gin_channels > 0:
        p["cond_layer"] = init_conv1d(
            keys[-1], gin_channels, 2 * hidden * n_layers, 1, weight_norm=True
        )
    return p


def _init_flow(key: jax.Array, hp: VitsHyperparams) -> Params:
    half = hp.inter_channels // 2
    hidden = hp.hidden_channels
    keys = jax.random.split(key, flw.N_COUPLING * 3)
    flows: Params = {}
    for i in range(flw.N_COUPLING):
        flows[str(2 * i)] = {
            "pre": init_conv1d(keys[3 * i], half, hidden, 1),
            "enc": _init_wavenet(
                keys[3 * i + 1],
                hidden,
                flw.WN_KERNEL,
                flw.WN_LAYERS,
                hp.gin_channels,
            ),
            "post": init_conv1d(
                keys[3 * i + 2], hidden, half, 1, init="zeros"
            ),
        }
    return {"flows": flows}


def _init_hifigan(key: jax.Array, hp: VitsHyperparams) -> Params:
    keys = jax.random.split(key, 64)
    ki = 0

    def next_key() -> jax.Array:
        nonlocal ki
        k = keys[ki]
        ki += 1
        return k

    p: Params = {
        "conv_pre": init_conv1d(
            next_key(), hp.inter_channels, hp.upsample_initial_channel, 7
        ),
        "ups": {},
        "resblocks": {},
    }
    num_kernels = len(hp.resblock_kernel_sizes)
    ch = hp.upsample_initial_channel
    for i, (u, k) in enumerate(
        zip(hp.upsample_rates, hp.upsample_kernel_sizes)
    ):
        out_ch = ch // 2
        p["ups"][str(i)] = init_conv_transpose1d(
            next_key(), ch, out_ch, k, weight_norm=True
        )
        for j, (rk, rd) in enumerate(
            zip(hp.resblock_kernel_sizes, hp.resblock_dilation_sizes)
        ):
            idx = str(i * num_kernels + j)
            if hp.resblock == "1":
                p["resblocks"][idx] = {
                    "convs1": {
                        str(jj): init_conv1d(
                            next_key(),
                            out_ch,
                            out_ch,
                            rk,
                            weight_norm=True,
                            init="normal",
                        )
                        for jj in range(len(rd))
                    },
                    "convs2": {
                        str(jj): init_conv1d(
                            next_key(),
                            out_ch,
                            out_ch,
                            rk,
                            weight_norm=True,
                            init="normal",
                        )
                        for jj in range(len(rd))
                    },
                }
            else:
                p["resblocks"][idx] = {
                    "convs": {
                        str(jj): init_conv1d(
                            next_key(),
                            out_ch,
                            out_ch,
                            rk,
                            weight_norm=True,
                            init="normal",
                        )
                        for jj in range(len(rd))
                    }
                }
        ch = out_ch
    p["conv_post"] = init_conv1d(next_key(), ch, 1, 7, bias=False)
    if hp.gin_channels > 0:
        p["cond"] = init_conv1d(
            next_key(), hp.gin_channels, hp.upsample_initial_channel, 1
        )
    return p


def init_vits_params(
    rng: jax.Array, config: ModelConfig
) -> Params:
    """Random-initialize a full VITS parameter pytree.

    Naming mirrors torch VITS (``enc_p``, ``dp``, ``flow``, ``dec``,
    ``emb_g``) so converted checkpoints drop in unchanged.
    """
    hp = VitsHyperparams.from_config(config)
    k_enc, k_dp, k_flow, k_dec, k_g = jax.random.split(rng, 5)
    if hp.decoder_type == "mb-istft":
        from .mbistft import init_mb_istft

        dec = init_mb_istft(
            k_dec,
            hp.inter_channels,
            initial_channel=hp.upsample_initial_channel,
            subbands=hp.subbands,
            istft_n_fft=hp.istft_n_fft,
            upsample_rates=hp.mb_upsample_rates,
            upsample_kernel_sizes=hp.mb_upsample_kernel_sizes,
            resblock_kernel_sizes=hp.resblock_kernel_sizes,
            resblock_dilation_sizes=hp.resblock_dilation_sizes,
            gin_channels=hp.gin_channels,
        )
    else:
        dec = _init_hifigan(k_dec, hp)
    params: Params = {
        "enc_p": _init_encoder(k_enc, hp),
        "dp": _init_sdp(k_dp, hp) if hp.use_sdp else _init_dp(k_dp, hp),
        "flow": _init_flow(k_flow, hp),
        "dec": dec,
    }
    if hp.n_speakers > 1:
        params["emb_g"] = {
            "weight": jax.random.normal(
                k_g, (hp.n_speakers, hp.gin_channels), jnp.float32
            )
            * (hp.gin_channels**-0.5)
        }
    return params


# ---------------------------------------------------------------------------
# Inference
# ---------------------------------------------------------------------------


def expand_by_durations(
    values: jax.Array,
    durations: jax.Array,
    num_frames: int,
    frame_offset: typing.Union[int, jax.Array] = 0,
) -> jax.Array:
    """Expand text-aligned values [B, T, C] to frames [B, F, C].

    ``durations``: int32 [B, T] frames per phoneme.  Frame ``f`` takes the
    value of the phoneme whose cumulative-duration interval contains it
    (past-the-end frames clamp to the last phoneme; callers mask them).
    ``frame_offset`` shifts the frame window (chunked/streaming decode).
    """
    cum = jnp.cumsum(durations, axis=1)  # [B, T]
    frames = frame_offset + jnp.arange(num_frames, dtype=cum.dtype)
    idx = jax.vmap(
        lambda c: jnp.searchsorted(c, frames, side="right")
    )(cum)
    idx = jnp.minimum(idx, values.shape[1] - 1)
    return jnp.take_along_axis(values, idx[..., None], axis=1)


def frame_indexed_prior_noise(
    rng: jax.Array,
    num_frames: int,
    frame_offset: typing.Union[int, jax.Array],
    batch: int,
    channels: int,
) -> jax.Array:
    """FRAME-INDEXED prior noise [B, F, C] for :meth:`decode_frames`.

    The value at global frame f depends only on (rng, f, channel) —
    never on num_frames, frame_offset, or the BATCH SLOT the utterance
    happens to occupy.  This makes audio independent of the frame
    bucket (so serving can decode speculatively at a predicted bucket),
    makes overlapped streaming windows seam-exact by construction
    (same frame -> same noise), lets a dp ``shard_map`` wrapper
    generate the noise once globally (XLA-partitioned) with per-shard
    slices that agree bit-exactly with the unsharded path, and — with
    position-indexed duration noise — makes sampling BATCH-INVARIANT:
    for a fixed seed, an utterance's audio is identical whether it is
    synthesized alone or packed into any scheduler batch.
    """
    base = jax.random.fold_in(rng, 1)
    frames = frame_offset + jnp.arange(num_frames)
    keys = jax.vmap(lambda f: jax.random.fold_in(base, f))(frames)
    noise = jax.vmap(
        lambda k: jax.random.normal(k, (channels,), jnp.float32)
    )(keys)  # [F, C] — shared across batch rows
    return jnp.broadcast_to(
        noise[None], (batch, num_frames, channels)
    )


class VitsModel:
    """Functional VITS model bound to a voice's hyperparameters."""

    def __init__(
        self,
        config: ModelConfig,
        compute_dtype: jnp.dtype = jnp.float32,
        decoder_dtype: jnp.dtype = jnp.bfloat16,
        pallas_stage_max_channels: int = 0,
    ):
        self.hp = VitsHyperparams.from_config(config)
        self.compute_dtype = compute_dtype
        self.decoder_dtype = decoder_dtype
        self.pallas_stage_max_channels = pallas_stage_max_channels

    # -- submodule wrappers --------------------------------------------------

    def encode(
        self, params: Params, ids: jax.Array, x_mask: jax.Array
    ) -> typing.Tuple[jax.Array, jax.Array, jax.Array]:
        return enc.text_encoder(
            params["enc_p"],
            ids,
            x_mask,
            n_layers=self.hp.n_layers,
            n_heads=self.hp.n_heads,
            kernel_size=self.hp.kernel_size,
        )

    def speaker_embedding(
        self, params: Params, sid: jax.Array
    ) -> typing.Optional[jax.Array]:
        if "emb_g" not in params:
            return None
        return jnp.take(params["emb_g"]["weight"], sid, axis=0)[
            :, None, :
        ]  # [B, 1, gin]

    def log_durations(
        self,
        params: Params,
        x: jax.Array,
        x_mask: jax.Array,
        rng: jax.Array,
        noise_w: jax.Array,
        g: typing.Optional[jax.Array],
        noise: typing.Optional[jax.Array] = None,
    ) -> jax.Array:
        if self.hp.use_sdp:
            return dur.stochastic_duration_predictor_infer(
                params["dp"], x, x_mask, rng, noise_w, g=g, noise=noise
            )
        return dur.duration_predictor(params["dp"], x, x_mask, g=g)

    # -- stage 1: durations ----------------------------------------------------

    def infer_durations(
        self,
        params: Params,
        ids: jax.Array,
        lengths: jax.Array,
        rng: jax.Array,
        length_scale: jax.Array,
        noise_w: jax.Array,
        sid: typing.Optional[jax.Array] = None,
        dur_noise: typing.Optional[jax.Array] = None,
    ) -> typing.Tuple[jax.Array, jax.Array]:
        """Returns (frame counts per phoneme int32 [B, T], totals [B])."""
        x_mask = sequence_mask(lengths, ids.shape[1])
        g = self.speaker_embedding(params, sid) if sid is not None else None
        x, _, _ = self.encode(params, ids, x_mask)
        logw = self.log_durations(
            params,
            x,
            x_mask,
            jax.random.fold_in(rng, 0),
            noise_w,
            g,
            noise=dur_noise,
        )
        w = jnp.exp(logw) * x_mask * length_scale
        w_ceil = jnp.ceil(w)[..., 0].astype(jnp.int32)
        totals = jnp.maximum(jnp.sum(w_ceil, axis=1), 1)
        return w_ceil, totals

    def stream_start(
        self,
        params: Params,
        ids: jax.Array,
        lengths: jax.Array,
        rng: jax.Array,
        length_scale: jax.Array,
        noise_w: jax.Array,
        noise_scale: jax.Array,
        num_frames: int,
        sid: typing.Optional[jax.Array] = None,
    ) -> typing.Tuple[
        jax.Array, jax.Array, jax.Array, jax.Array, jax.Array
    ]:
        """Fused first-window pass for (batched) streaming.

        One executable computes the encoder ONCE, samples durations,
        and decodes the first ``num_frames`` window — so a batch of
        concurrent streams reaches first audio in a single device
        dispatch instead of 3 per stream.  Returns
        ``(durations [B,T], totals [B], m_p, logs_p, audio0)``;
        continuation windows reuse the returned stats via
        :meth:`decode_frames` (``enc_stats=...``, same ``rng``) and are
        seam-exact because prior noise is frame-indexed and
        batch-invariant (:func:`frame_indexed_prior_noise`).

        Duration math matches :meth:`infer_durations` exactly (same
        ``fold_in`` stream, same ceil) so a continuation computed from
        these durations is bit-identical to the unbatched path.
        """
        x_mask = sequence_mask(lengths, ids.shape[1])
        g = self.speaker_embedding(params, sid) if sid is not None else None
        x, m_p, logs_p = self.encode(params, ids, x_mask)
        logw = self.log_durations(
            params, x, x_mask, jax.random.fold_in(rng, 0), noise_w, g
        )
        w = jnp.exp(logw) * x_mask * length_scale
        durations = jnp.ceil(w)[..., 0].astype(jnp.int32)
        totals = jnp.maximum(jnp.sum(durations, axis=1), 1)
        audio0, _ = self.decode_frames(
            params,
            ids,
            lengths,
            durations,
            num_frames,
            rng,
            noise_scale,
            sid=sid,
            enc_stats=(m_p, logs_p),
        )
        return durations, totals, m_p, logs_p, audio0

    # -- stage 2: decode -------------------------------------------------------

    def decode_frames(
        self,
        params: Params,
        ids: jax.Array,
        lengths: jax.Array,
        durations: jax.Array,
        num_frames: int,
        rng: jax.Array,
        noise_scale: jax.Array,
        sid: typing.Optional[jax.Array] = None,
        prior_noise: typing.Optional[jax.Array] = None,
        frame_offset: typing.Union[int, jax.Array] = 0,
        enc_stats: typing.Optional[
            typing.Tuple[jax.Array, jax.Array]
        ] = None,
    ) -> typing.Tuple[jax.Array, jax.Array]:
        """Decode to audio given per-phoneme frame counts.

        Returns (audio [B, num_frames*hop] float32, sample lengths [B]).

        ``frame_offset`` decodes the window [offset, offset+num_frames)
        of the full utterance — chunked/streaming decode.  The internal
        prior noise is FRAME-INDEXED (value at global frame f depends
        only on rng/f/batch slot), so overlapping windows and different
        frame buckets agree on shared frames without callers passing
        noise; ``prior_noise`` remains available to override it.
        ``enc_stats`` = precomputed (m_p, logs_p) skips the encoder
        (chunked decode computes it once instead of per chunk).
        """
        x_mask = sequence_mask(lengths, ids.shape[1])
        g = self.speaker_embedding(params, sid) if sid is not None else None
        if enc_stats is not None:
            m_p, logs_p = enc_stats
        else:
            _, m_p, logs_p = self.encode(params, ids, x_mask)

        durations = durations * x_mask[..., 0].astype(durations.dtype)
        y_lengths = jnp.maximum(jnp.sum(durations, axis=1), 1)
        y_mask = sequence_mask(
            jnp.maximum(y_lengths - frame_offset, 0), num_frames
        )

        m_p_f = expand_by_durations(
            m_p, durations, num_frames, frame_offset
        )
        logs_p_f = expand_by_durations(
            logs_p, durations, num_frames, frame_offset
        )

        if prior_noise is None:
            prior_noise = frame_indexed_prior_noise(
                rng,
                num_frames,
                frame_offset,
                m_p_f.shape[0],
                m_p_f.shape[-1],
            )
        z_p = m_p_f + prior_noise * jnp.exp(logs_p_f) * noise_scale
        z_p = z_p * y_mask

        z = flw.residual_coupling_block(
            params["flow"], z_p, y_mask, g=g, reverse=True
        )

        audio = self.decode_waveform(params["dec"], z * y_mask, g=g)
        return audio, y_lengths * self.hp.hop_length

    def decode_waveform(
        self,
        dec_params: Params,
        z: jax.Array,
        g: typing.Optional[jax.Array] = None,
    ) -> jax.Array:
        """Latent frames -> waveform via the configured decoder family."""
        if self.hp.decoder_type == "mb-istft":
            from .mbistft import mb_istft_generator

            return mb_istft_generator(
                dec_params,
                z,
                g=g,
                subbands=self.hp.subbands,
                istft_n_fft=self.hp.istft_n_fft,
                istft_hop=self.hp.istft_hop,
                resblock_kernel_sizes=self.hp.resblock_kernel_sizes,
                resblock_dilation_sizes=self.hp.resblock_dilation_sizes,
                upsample_rates=self.hp.mb_upsample_rates,
                upsample_kernel_sizes=self.hp.mb_upsample_kernel_sizes,
                compute_dtype=self.decoder_dtype,
            )
        return hfg.hifigan_generator(
            dec_params,
            z,
            g=g,
            resblock_type=self.hp.resblock,
            resblock_kernel_sizes=self.hp.resblock_kernel_sizes,
            resblock_dilation_sizes=self.hp.resblock_dilation_sizes,
            upsample_rates=self.hp.upsample_rates,
            upsample_kernel_sizes=self.hp.upsample_kernel_sizes,
            compute_dtype=self.decoder_dtype,
            pallas_stage_max_channels=self.pallas_stage_max_channels,
        )

    # -- one-shot convenience ----------------------------------------------------

    def infer(
        self,
        params: Params,
        ids: jax.Array,
        lengths: jax.Array,
        rng: jax.Array,
        noise_scale: jax.Array,
        length_scale: jax.Array,
        noise_w: jax.Array,
        max_frames: int,
        sid: typing.Optional[jax.Array] = None,
    ) -> typing.Tuple[jax.Array, jax.Array]:
        """Full pipeline with a fixed frame capacity (single jit unit).

        Frame counts beyond ``max_frames`` are truncated.  Serving uses the
        two-stage path instead so the capacity hugs the actual length.
        """
        durations, _ = self.infer_durations(
            params, ids, lengths, rng, length_scale, noise_w, sid=sid
        )
        # Clamp cumulative durations into the fixed capacity.
        cum = jnp.cumsum(durations, axis=1)
        cum = jnp.minimum(cum, max_frames)
        durations = jnp.concatenate(
            [cum[:, :1], cum[:, 1:] - cum[:, :-1]], axis=1
        )
        return self.decode_frames(
            params,
            ids,
            lengths,
            durations,
            max_frames,
            rng,
            noise_scale,
            sid=sid,
        )
