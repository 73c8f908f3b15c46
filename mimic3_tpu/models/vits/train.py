"""VITS training: losses, generator forward, and the jittable train step.

The reference repo is inference-only (training lived in mimic3-train);
this module completes the framework so voices can be trained/fine-tuned
TPU-natively.  It follows the VITS paper's objective:

- conditional VAE: KL between the flow-mapped posterior and the
  MAS-aligned text prior (weight ``c_kl``, config: mimic3_tts/config.py:290),
- mel-spectrogram L1 reconstruction on a random audio segment
  (weight ``c_mel``, config: :289; segment_size :286),
- stochastic-duration-predictor NLL,
- LSGAN adversarial + feature-matching losses against the multi-period /
  scale discriminators.

Everything here is pure-functional and jit/pjit-compatible; the
device mesh placement lives in :mod:`mimic3_tpu.parallel`.
"""

from __future__ import annotations

import math
import typing
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ...config import TrainingConfig
from ...ops.stft import mel_spectrogram, spec_to_mel, spectrogram
from . import duration as dur
from . import flow as flw
from .discriminator import discriminate, init_discriminators
from .layers import Params, sequence_mask
from .mas import monotonic_alignment_search
from .model import VitsModel, init_vits_params
from .posterior import init_posterior_encoder, posterior_encoder


@dataclass
class TrainBatch:
    """One training batch (all padded to static shapes)."""

    phoneme_ids: jax.Array  # int32 [B, T_text]
    text_lengths: jax.Array  # int32 [B]
    audio: jax.Array  # float32 [B, samples]
    spec_lengths: jax.Array  # int32 [B] (frames = samples // hop)
    speaker_ids: typing.Optional[jax.Array] = None  # int32 [B]


jax.tree_util.register_dataclass(
    TrainBatch,
    data_fields=["phoneme_ids", "text_lengths", "audio", "spec_lengths",
                 "speaker_ids"],
    meta_fields=[],
)


def init_training_params(
    rng: jax.Array, config: TrainingConfig
) -> typing.Tuple[Params, Params]:
    """(generator params incl. posterior ``enc_q``, discriminator params)."""
    k_g, k_q, k_d = jax.random.split(rng, 3)
    params = init_vits_params(k_g, config.model)
    spec_channels = config.audio.filter_length // 2 + 1
    params["enc_q"] = init_posterior_encoder(
        k_q,
        spec_channels,
        config.model.inter_channels,
        config.model.hidden_channels,
        config.model.gin_channels,
        n_layers=16,
    )
    disc_params = init_discriminators(k_d)
    return params, disc_params


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------


def kl_loss(
    z_p: jax.Array,
    logs_q: jax.Array,
    m_p: jax.Array,
    logs_p: jax.Array,
    y_mask: jax.Array,
) -> jax.Array:
    """KL(q(z|y) || p(z|text)) after the flow, per the VITS objective."""
    z_p = z_p.astype(jnp.float32)
    kl = logs_p - logs_q - 0.5
    kl += 0.5 * jnp.square(z_p - m_p) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * y_mask)
    # normalized by total FRAMES (not frames*channels) — the VITS
    # objective's convention; dividing by channels too would weaken the
    # KL term ~192x relative to c_kl's intended weight
    return kl / jnp.maximum(jnp.sum(y_mask), 1.0)


def feature_matching_loss(
    fmaps_real: typing.Sequence[typing.Sequence[jax.Array]],
    fmaps_fake: typing.Sequence[typing.Sequence[jax.Array]],
) -> jax.Array:
    loss = 0.0
    for fr, ff in zip(fmaps_real, fmaps_fake):
        for r, f in zip(fr, ff):
            loss += jnp.mean(
                jnp.abs(jax.lax.stop_gradient(r) - f)
            )
    return 2.0 * loss


def generator_adv_loss(
    fake_logits: typing.Sequence[jax.Array],
) -> jax.Array:
    return sum(jnp.mean(jnp.square(1.0 - lg)) for lg in fake_logits)


def discriminator_adv_loss(
    real_logits: typing.Sequence[jax.Array],
    fake_logits: typing.Sequence[jax.Array],
) -> jax.Array:
    loss = 0.0
    for r, f in zip(real_logits, fake_logits):
        loss += jnp.mean(jnp.square(1.0 - r)) + jnp.mean(jnp.square(f))
    return loss


# ---------------------------------------------------------------------------
# Segment slicing
# ---------------------------------------------------------------------------


def random_segments(
    values: jax.Array,
    lengths: jax.Array,
    rng: jax.Array,
    segment_frames: int,
) -> typing.Tuple[jax.Array, jax.Array]:
    """Slice a random [segment_frames] window per example.

    values: [B, T, C]; windows always fit inside the valid region (short
    examples clamp to start 0 — training data should exceed the segment).
    Returns (segments [B, segment_frames, C], starts [B]).
    """
    b = values.shape[0]
    max_start = jnp.maximum(lengths - segment_frames, 0)
    u = jax.random.uniform(rng, (b,))
    starts = (u * (max_start + 1).astype(jnp.float32)).astype(jnp.int32)
    starts = jnp.minimum(starts, max_start)
    idx = starts[:, None] + jnp.arange(segment_frames)[None, :]
    idx = jnp.minimum(idx, values.shape[1] - 1)
    segments = jnp.take_along_axis(values, idx[..., None], axis=1)
    return segments, starts


def slice_audio_segments(
    audio: jax.Array, starts: jax.Array, segment_frames: int, hop: int
) -> jax.Array:
    idx = (
        starts[:, None] * hop
        + jnp.arange(segment_frames * hop)[None, :]
    )
    idx = jnp.minimum(idx, audio.shape[1] - 1)
    return jnp.take_along_axis(audio, idx, axis=1)


# ---------------------------------------------------------------------------
# Generator training forward
# ---------------------------------------------------------------------------


def generator_forward(
    model: VitsModel,
    config: TrainingConfig,
    params: Params,
    batch: TrainBatch,
    rng: jax.Array,
) -> typing.Dict[str, jax.Array]:
    """VITS training forward pass -> losses + fake/real audio segments."""
    audio_cfg = config.audio
    hop = audio_cfg.hop_length
    segment_frames = config.segment_size // hop

    ids = batch.phoneme_ids
    x_mask = sequence_mask(batch.text_lengths, ids.shape[1])

    g = None
    if batch.speaker_ids is not None and "emb_g" in params:
        g = model.speaker_embedding(params, batch.speaker_ids)

    # text prior
    x, m_p, logs_p = model.encode(params, ids, x_mask)

    # posterior from the linear spectrogram
    spec = spectrogram(
        batch.audio,
        audio_cfg.filter_length,
        hop,
        audio_cfg.win_length,
    )
    t_spec = spec.shape[1]
    y_mask = sequence_mask(batch.spec_lengths, t_spec)
    k_post, k_seg, k_dur = jax.random.split(rng, 3)
    z, m_q, logs_q = posterior_encoder(
        params["enc_q"], spec, y_mask, k_post, g=g
    )

    # flow: posterior latent -> prior space
    z_p = flw.residual_coupling_block(
        params["flow"], z, y_mask, g=g, reverse=False
    )

    # alignment: neg cross-entropy of each frame under each text position
    s_p_sq_r = jnp.exp(-2.0 * logs_p)  # [B, T_text, C]
    neg_1 = jnp.sum(
        -0.5 * math.log(2 * math.pi) - logs_p, axis=-1
    )  # [B, T_text]
    # HIGHEST: keep full f32 mantissas on the MXU — these scores feed
    # the (discrete) MAS alignment, where bf16 truncation adds noise
    neg_2 = jnp.einsum(
        "btc,bjc->bjt", -0.5 * jnp.square(z_p), s_p_sq_r,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    neg_3 = jnp.einsum(
        "btc,bjc->bjt", z_p, m_p * s_p_sq_r,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    neg_4 = jnp.sum(-0.5 * jnp.square(m_p) * s_p_sq_r, axis=-1)
    neg_x_ent = (
        neg_1[:, :, None] + neg_2 + neg_3 + neg_4[:, :, None]
    )  # [B, T_text, T_spec]

    attn = jax.lax.stop_gradient(
        monotonic_alignment_search(
            neg_x_ent, batch.text_lengths, batch.spec_lengths
        )
    )  # [B, T_text, T_spec]

    # durations + SDP loss
    w = jnp.sum(attn, axis=-1, keepdims=True) * x_mask  # [B, T_text, 1]
    if model.hp.use_sdp:
        nll = dur.stochastic_duration_predictor_nll(
            params["dp"], x, x_mask, w, k_dur, g=g
        )
        loss_dur = jnp.sum(nll) / jnp.maximum(jnp.sum(x_mask), 1.0)
    else:
        logw_hat = dur.duration_predictor(params["dp"], x, x_mask, g=g)
        logw = jnp.log(w + 1e-6) * x_mask
        loss_dur = jnp.sum(jnp.square(logw_hat - logw)) / jnp.maximum(
            jnp.sum(x_mask), 1.0
        )

    # expand prior to frames through the alignment
    m_p_f = jnp.einsum(
        "bjt,bjc->btc", attn, m_p,
        precision=jax.lax.Precision.HIGHEST,
    )
    logs_p_f = jnp.einsum(
        "bjt,bjc->btc", attn, logs_p,
        precision=jax.lax.Precision.HIGHEST,
    )

    loss_kl = kl_loss(z_p, logs_q, m_p_f, logs_p_f, y_mask)

    # decode a random segment
    z_seg, starts = random_segments(
        z, batch.spec_lengths, k_seg, segment_frames
    )
    y_hat = model.decode_waveform(
        params["dec"], z_seg, g=g
    )  # [B, segment_frames*hop]
    y_real = slice_audio_segments(batch.audio, starts, segment_frames, hop)

    mel_args = dict(
        sample_rate=audio_cfg.sample_rate,
        n_fft=audio_cfg.filter_length,
        hop_length=hop,
        win_length=audio_cfg.win_length,
        n_mels=audio_cfg.mel_channels,
        fmin=audio_cfg.mel_fmin,
        fmax=audio_cfg.mel_fmax,
    )
    mel_real = mel_spectrogram(y_real, **mel_args)
    mel_fake = mel_spectrogram(y_hat, **mel_args)
    loss_mel = jnp.mean(jnp.abs(mel_real - mel_fake))

    return {
        "y_hat": y_hat,
        "y_real": y_real,
        "loss_mel": loss_mel,
        "loss_kl": loss_kl,
        "loss_dur": loss_dur,
        "attn": attn,
    }


# ---------------------------------------------------------------------------
# Train step (two optimizers, GAN)
# ---------------------------------------------------------------------------


@dataclass
class TrainState:
    params: Params
    disc_params: Params
    opt_g: typing.Any
    opt_d: typing.Any
    step: jax.Array


jax.tree_util.register_dataclass(
    TrainState,
    data_fields=["params", "disc_params", "opt_g", "opt_d", "step"],
    meta_fields=[],
)


def make_optimizers(
    config: TrainingConfig, steps_per_epoch: int = 1000
):
    import optax

    def schedule(step):
        # lr_decay is a per-EPOCH exponential factor in voice configs;
        # apply it continuously per step
        epochs = step / steps_per_epoch
        return config.learning_rate * jnp.power(
            jnp.float32(config.lr_decay), epochs
        )

    def make():
        tx = optax.adam(
            schedule, b1=config.betas[0], b2=config.betas[1],
            eps=config.eps,
        )
        if config.grad_clip:
            tx = optax.chain(
                optax.clip_by_global_norm(config.grad_clip), tx
            )
        return tx

    return make(), make()


def make_train_step(
    config: TrainingConfig,
    compute_dtype: jnp.dtype = jnp.float32,
    steps_per_epoch: int = 1000,
) -> typing.Callable:
    """Build the jittable train step for a voice config."""
    import optax  # noqa: F401

    model = VitsModel(
        config.model,
        compute_dtype=compute_dtype,
        decoder_dtype=compute_dtype,
    )
    opt_g, opt_d = make_optimizers(config, steps_per_epoch)

    def train_step(
        state: TrainState, batch: TrainBatch, rng: jax.Array
    ) -> typing.Tuple[TrainState, typing.Dict[str, jax.Array]]:
        rng_g = jax.random.fold_in(rng, 0)

        # ---- discriminator update ----
        # one un-differentiated generator forward; the D step only needs
        # (y_real, stop_grad(y_hat)), so the generator graph is built
        # once here and once (with grads) in the G step below
        fwd = generator_forward(
            model, config, state.params, batch, rng_g
        )
        y_real = jax.lax.stop_gradient(fwd["y_real"])
        y_hat_sg = jax.lax.stop_gradient(fwd["y_hat"])

        def disc_loss_fn(disc_params):
            real_logits, _ = discriminate(disc_params, y_real)
            fake_logits, _ = discriminate(disc_params, y_hat_sg)
            return discriminator_adv_loss(real_logits, fake_logits)

        loss_d, grads_d = jax.value_and_grad(disc_loss_fn)(
            state.disc_params
        )
        updates_d, new_opt_d = opt_d.update(
            grads_d, state.opt_d, state.disc_params
        )
        new_disc_params = optax.apply_updates(state.disc_params, updates_d)

        # ---- generator update ----
        def gen_loss_fn(params):
            out = generator_forward(model, config, params, batch, rng_g)
            real_logits, fmaps_r = discriminate(
                new_disc_params, out["y_real"]
            )
            fake_logits, fmaps_f = discriminate(
                new_disc_params, out["y_hat"]
            )
            loss_adv = generator_adv_loss(fake_logits)
            loss_fm = feature_matching_loss(fmaps_r, fmaps_f)
            loss = (
                out["loss_mel"] * config.c_mel
                + out["loss_kl"] * config.c_kl
                + out["loss_dur"]
                + loss_adv
                + loss_fm
            )
            metrics = {
                "loss_g": loss,
                "loss_mel": out["loss_mel"],
                "loss_kl": out["loss_kl"],
                "loss_dur": out["loss_dur"],
                "loss_adv": loss_adv,
                "loss_fm": loss_fm,
            }
            return loss, metrics

        (loss_g, metrics), grads_g = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(state.params)
        updates_g, new_opt_g = opt_g.update(
            grads_g, state.opt_g, state.params
        )
        new_params = optax.apply_updates(state.params, updates_g)

        metrics["loss_d"] = loss_d
        new_state = TrainState(
            params=new_params,
            disc_params=new_disc_params,
            opt_g=new_opt_g,
            opt_d=new_opt_d,
            step=state.step + 1,
        )
        return new_state, metrics

    return train_step


def init_train_state(
    rng: jax.Array, config: TrainingConfig
) -> TrainState:
    params, disc_params = init_training_params(rng, config)
    opt_g, opt_d = make_optimizers(config)
    return TrainState(
        params=params,
        disc_params=disc_params,
        opt_g=opt_g.init(params),
        opt_d=opt_d.init(disc_params),
        step=jnp.zeros((), jnp.int32),
    )


__all__ = [
    "TrainBatch",
    "TrainState",
    "generator_forward",
    "init_train_state",
    "init_training_params",
    "make_train_step",
    "kl_loss",
    "spec_to_mel",
]
