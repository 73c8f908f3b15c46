"""MB-iSTFT decoder family tests: ops, inference, training."""

import jax
import jax.numpy as jnp
import numpy as np

from mimic3_tpu.config import ModelConfig, TrainingConfig
from mimic3_tpu.models.vits import VitsModel, init_vits_params
from mimic3_tpu.ops.istft import istft, pqmf_analysis, pqmf_synthesis


def _tiny_cfg():
    return ModelConfig(
        num_symbols=40,
        n_layers=1,
        hidden_channels=32,
        inter_channels=32,
        filter_channels=64,
        upsample_initial_channel=64,
        decoder_type="mb-istft",
    )


def test_istft_inverts_rfft_frames():
    n_fft, hop = 16, 4
    rng = np.random.RandomState(0)
    audio = rng.randn(2, 40 * hop).astype(np.float32)
    pad = (n_fft - hop) // 2
    x = np.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    frames = 1 + (x.shape[1] - n_fft) // hop
    win = np.hanning(n_fft + 1)[:-1]
    framed = np.stack(
        [x[:, i * hop : i * hop + n_fft] * win for i in range(frames)],
        axis=1,
    )
    spec = np.fft.rfft(framed, axis=-1)
    rec = np.asarray(
        istft(
            jnp.array(spec.real.astype(np.float32)),
            jnp.array(spec.imag.astype(np.float32)),
            n_fft,
            hop,
        )
    )
    assert rec.shape == audio.shape
    interior = np.abs(rec - audio)[:, n_fft:-n_fft]
    assert interior.max() < 1e-5


def test_pqmf_near_perfect_reconstruction():
    rng = np.random.RandomState(1)
    sig = rng.randn(1, 4096).astype(np.float32)
    bands = pqmf_analysis(jnp.array(sig), 4)
    assert bands.shape == (1, 1024, 4)
    rec = np.asarray(pqmf_synthesis(bands, 4))
    assert rec.shape == (1, 4096)
    n = 3800
    a, b = sig[0, :n], rec[0, :n]
    snr = 10 * np.log10(np.mean(a**2) / np.mean((a - b) ** 2))
    assert snr > 35.0, snr


def test_mbistft_hop_is_256():
    model = VitsModel(_tiny_cfg(), decoder_dtype=jnp.float32)
    assert model.hp.hop_length == 256


def test_mbistft_inference_shapes_and_determinism():
    cfg = _tiny_cfg()
    params = init_vits_params(jax.random.PRNGKey(0), cfg)
    model = VitsModel(cfg, decoder_dtype=jnp.float32)
    ids = jnp.array([[1, 5, 9, 3, 7, 2]], jnp.int32)
    lengths = jnp.array([6])
    rng = jax.random.PRNGKey(0)
    durs, _ = model.infer_durations(
        params, ids, lengths, rng, jnp.float32(1.0), jnp.float32(0.0)
    )
    a1, alen = model.decode_frames(
        params, ids, lengths, durs, 16, rng, jnp.float32(0.0)
    )
    assert a1.shape == (1, 16 * 256)
    assert bool(jnp.all(jnp.isfinite(a1)))
    a2, _ = model.decode_frames(
        params, ids, lengths, durs, 16, rng, jnp.float32(0.0)
    )
    assert bool(jnp.all(a1 == a2))


def test_mbistft_train_step():
    cfg = TrainingConfig()
    cfg.model = _tiny_cfg()
    cfg.segment_size = 2048
    from mimic3_tpu.models.vits.train import (
        TrainBatch,
        init_train_state,
        make_train_step,
    )

    state = init_train_state(jax.random.PRNGKey(0), cfg)
    step = jax.jit(make_train_step(cfg))
    rng = np.random.RandomState(0)
    batch = TrainBatch(
        phoneme_ids=jnp.asarray(rng.randint(1, 40, (2, 6)), jnp.int32),
        text_lengths=jnp.array([6, 4], jnp.int32),
        audio=jnp.asarray(rng.randn(2, 4096) * 0.1, jnp.float32),
        spec_lengths=jnp.array([16, 12], jnp.int32),
    )
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    for name, value in metrics.items():
        assert np.isfinite(float(value)), name
