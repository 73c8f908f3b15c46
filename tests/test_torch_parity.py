"""Numerical parity: JAX VITS vs the independent torch oracle.

Builds a small torch VITS, converts its (weight-normalized) state_dict
through the production converter, and checks every submodule plus the
full synthesis graph against torch outputs.  This validates both the
model math and the layout conversions real checkpoints go through.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mimic3_tpu.config import ModelConfig
from mimic3_tpu.models.vits import VitsModel
from mimic3_tpu.models.vits import duration as dur
from mimic3_tpu.models.vits import flow as flw
from mimic3_tpu.models.vits import hifigan as hfg
from mimic3_tpu.models.vits.layers import sequence_mask
from mimic3_tpu.runtime.convert import state_dict_to_pytree

import torch_oracle as oracle

torch.manual_seed(0)

N_VOCAB = 40
HID = 32
INTER = 32
FILT = 64
HEADS = 2
LAYERS = 2
INITIAL = 64
RATES = (4, 4)
UPK = (8, 8)


@pytest.fixture(scope="module")
def torch_model():
    m = oracle.SynthesizerTrn(
        N_VOCAB,
        inter_channels=INTER,
        hidden=HID,
        filter_channels=FILT,
        n_heads=HEADS,
        n_layers=LAYERS,
        initial_channel=INITIAL,
        rates=RATES,
        up_kernels=UPK,
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_setup(torch_model):
    params = state_dict_to_pytree(oracle.state_dict_numpy(torch_model))
    cfg = ModelConfig(
        num_symbols=N_VOCAB,
        inter_channels=INTER,
        hidden_channels=HID,
        filter_channels=FILT,
        n_heads=HEADS,
        n_layers=LAYERS,
        upsample_initial_channel=INITIAL,
        upsample_rates=RATES,
        upsample_kernel_sizes=UPK,
    )
    model = VitsModel(cfg, decoder_dtype=jnp.float32)
    return model, params


@pytest.fixture(scope="module")
def sample():
    rng = np.random.RandomState(1)
    ids = rng.randint(1, N_VOCAB, size=(2, 11))
    ids[1, 8:] = 0
    lengths = np.array([11, 8])
    return ids, lengths


def test_encoder_parity(torch_model, jax_setup, sample):
    ids, lengths = sample
    model, params = jax_setup

    with torch.no_grad():
        _, m_t, logs_t, _ = torch_model.enc_p(
            torch.tensor(ids), torch.tensor(lengths)
        )

    mask = sequence_mask(jnp.array(lengths), ids.shape[1])
    _, m_j, logs_j = model.encode(params, jnp.array(ids), mask)

    # torch [B, C, T] vs jax [B, T, C]
    np.testing.assert_allclose(
        np.asarray(m_j), m_t.numpy().transpose(0, 2, 1), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(logs_j), logs_t.numpy().transpose(0, 2, 1), atol=2e-5
    )


def test_sdp_parity_with_noise(torch_model, jax_setup, sample):
    ids, lengths = sample
    model, params = jax_setup

    noise = np.random.RandomState(2).randn(2, 2, ids.shape[1]).astype(
        np.float32
    )

    with torch.no_grad():
        x_t, _, _, mask_t = torch_model.enc_p(
            torch.tensor(ids), torch.tensor(lengths)
        )
        logw_t = torch_model.dp.reverse(
            x_t, mask_t, noise_scale=0.8, noise=torch.tensor(noise)
        )

    mask = sequence_mask(jnp.array(lengths), ids.shape[1])
    x_j, _, _ = model.encode(params, jnp.array(ids), mask)
    logw_j = dur.stochastic_duration_predictor_infer(
        params["dp"],
        x_j,
        mask,
        jax.random.PRNGKey(0),
        jnp.float32(0.8),
        noise=jnp.array(noise.transpose(0, 2, 1)),
    )

    valid = np.asarray(mask[..., 0]) > 0
    np.testing.assert_allclose(
        np.asarray(logw_j)[..., 0][valid],
        logw_t.numpy()[:, 0, :][valid],
        atol=2e-4,
    )


def test_flow_parity(torch_model, jax_setup, sample):
    ids, lengths = sample
    model, params = jax_setup
    del model

    z = np.random.RandomState(3).randn(2, INTER, 9).astype(np.float32)
    mask_np = (np.arange(9)[None] < np.array([9, 6])[:, None]).astype(
        np.float32
    )
    z = z * mask_np[:, None, :]

    with torch.no_grad():
        out_t = torch_model.flow(
            torch.tensor(z),
            torch.tensor(mask_np).unsqueeze(1),
            reverse=True,
        )

    out_j = flw.residual_coupling_block(
        params["flow"],
        jnp.array(z.transpose(0, 2, 1)),
        jnp.array(mask_np)[..., None],
        reverse=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.numpy().transpose(0, 2, 1), atol=2e-5
    )


def test_hifigan_parity(torch_model, jax_setup):
    model, params = jax_setup
    z = np.random.RandomState(4).randn(2, INTER, 13).astype(np.float32)

    with torch.no_grad():
        audio_t = torch_model.dec(torch.tensor(z))

    audio_j = hfg.hifigan_generator(
        params["dec"],
        jnp.array(z.transpose(0, 2, 1)),
        resblock_kernel_sizes=model.hp.resblock_kernel_sizes,
        resblock_dilation_sizes=model.hp.resblock_dilation_sizes,
        upsample_rates=model.hp.upsample_rates,
        upsample_kernel_sizes=model.hp.upsample_kernel_sizes,
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(audio_j), audio_t.numpy()[:, 0, :], atol=2e-5
    )


def test_full_infer_parity_deterministic(torch_model, jax_setup, sample):
    """End-to-end parity in deterministic mode (noise scales = 0) — the
    reference's own regression setting
    (reference: tests/get_sample_hashes.py:106-114)."""
    ids, lengths = sample
    model, params = jax_setup

    with torch.no_grad():
        audio_t, alen_t, w_t = torch_model.infer(
            torch.tensor(ids),
            torch.tensor(lengths),
            noise_scale=0.0,
            length_scale=1.0,
            noise_w=0.0,
        )

    rng = jax.random.PRNGKey(0)
    durs, totals = model.infer_durations(
        params,
        jnp.array(ids),
        jnp.array(lengths),
        rng,
        jnp.float32(1.0),
        jnp.float32(0.0),
    )
    np.testing.assert_array_equal(
        np.asarray(durs), w_t.numpy()[:, 0, :].astype(np.int32)
    )

    num_frames = int(np.asarray(totals).max())
    audio_j, alen_j = model.decode_frames(
        params,
        jnp.array(ids),
        jnp.array(lengths),
        durs,
        num_frames,
        rng,
        jnp.float32(0.0),
    )
    hop = model.hp.hop_length
    np.testing.assert_array_equal(np.asarray(alen_j), alen_t.numpy() * hop)

    for b in range(ids.shape[0]):
        n = int(alen_j[b])
        ref = audio_t.numpy()[b]
        got = np.asarray(audio_j)[b, :n]
        np.testing.assert_allclose(got, ref[:n], atol=5e-5)
        corr = np.corrcoef(got, ref[:n])[0, 1]
        assert corr > 0.9999, f"waveform correlation {corr}"


def test_resblock2_matches_torch():
    """resblock2 (resblock="2" voices) vs the torch oracle; also an
    end-to-end decode smoke with a resblock-2 config."""
    import tests.torch_oracle as oracle

    torch.manual_seed(5)
    c, k, dil = 16, 3, (1, 3)
    block = oracle.ResBlock2(c, k, dil)
    params = state_dict_to_pytree(
        oracle.state_dict_numpy(block), strip_prefixes=()
    )

    rng = np.random.RandomState(1)
    x = rng.randn(2, 64, c).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = (
            block(torch.from_numpy(x.transpose(0, 2, 1)))
            .numpy()
            .transpose(0, 2, 1)
        )

    from mimic3_tpu.models.vits.hifigan import resblock2

    got = np.asarray(resblock2(params, jnp.asarray(x), k, dil))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)

    # full model smoke at resblock="2": decode runs, finite audio
    from mimic3_tpu.config import ModelConfig
    from mimic3_tpu.models.vits import VitsModel, init_vits_params

    config = ModelConfig(
        num_symbols=40,
        n_layers=1,
        hidden_channels=32,
        inter_channels=32,
        filter_channels=64,
        upsample_initial_channel=64,
        resblock="2",
        resblock_kernel_sizes=(3, 5, 7),
        resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
    )
    model = VitsModel(config)
    mparams = init_vits_params(jax.random.PRNGKey(0), config)
    ids = jnp.asarray(rng.randint(1, 40, (2, 8)), jnp.int32)
    lengths = jnp.full((2,), 8, jnp.int32)
    audio, audio_lengths = model.infer(
        mparams, ids, lengths, jax.random.PRNGKey(1),
        jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0),
        max_frames=32,
    )
    assert np.isfinite(np.asarray(audio)).all()
    assert int(np.asarray(audio_lengths).max()) > 0


def test_deterministic_duration_predictor_matches_torch():
    """use_sdp=False voices: the two-conv duration predictor vs the
    torch oracle, plus a full infer smoke with use_sdp disabled."""
    import tests.torch_oracle as oracle

    torch.manual_seed(17)
    hid, gin = 32, 16
    block = oracle.DurationPredictor(hid, 64, 3, gin_channels=gin)
    block.eval()
    params = state_dict_to_pytree(
        oracle.state_dict_numpy(block), strip_prefixes=()
    )

    rng = np.random.RandomState(2)
    x = rng.randn(2, 12, hid).astype(np.float32)
    g = rng.randn(2, 1, gin).astype(np.float32)
    mask = np.ones((2, 12, 1), np.float32)
    mask[1, 9:] = 0.0
    with torch.no_grad():
        ref = (
            block(
                torch.from_numpy(x.transpose(0, 2, 1)),
                torch.from_numpy(mask.transpose(0, 2, 1)),
                g=torch.from_numpy(g.transpose(0, 2, 1)),
            )
            .numpy()
            .transpose(0, 2, 1)
        )

    from mimic3_tpu.models.vits.duration import duration_predictor

    got = np.asarray(
        duration_predictor(
            params, jnp.asarray(x), jnp.asarray(mask), jnp.asarray(g),
            kernel_size=3,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-4)

    # model-level smoke: use_sdp=False init + infer end-to-end
    from mimic3_tpu.config import ModelConfig
    from mimic3_tpu.models.vits import VitsModel, init_vits_params

    config = ModelConfig(
        num_symbols=40,
        n_layers=1,
        hidden_channels=32,
        inter_channels=32,
        filter_channels=64,
        upsample_initial_channel=64,
        use_sdp=False,
    )
    model = VitsModel(config)
    mparams = init_vits_params(jax.random.PRNGKey(3), config)
    assert "conv_1" in mparams["dp"]  # deterministic DP layout
    ids = jnp.asarray(rng.randint(1, 40, (2, 8)), jnp.int32)
    lengths = jnp.full((2,), 8, jnp.int32)
    audio, audio_lengths = model.infer(
        mparams, ids, lengths, jax.random.PRNGKey(1),
        jnp.float32(0.0), jnp.float32(1.0), jnp.float32(0.0),
        max_frames=64,
    )
    assert np.isfinite(np.asarray(audio)).all()
    assert int(np.asarray(audio_lengths).max()) > 0
