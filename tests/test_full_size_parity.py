"""Numerical parity at the REAL ``*_low`` voice dimensions.

The toy-dim parity suite (tests/test_torch_parity.py) can miss
shape/broadcast bugs that only appear at production hyperparameters —
hidden 192, 6 encoder layers, HiFi-GAN 512ch with 8*8*2*2 upsampling
(reference: mimic3_tts/config.py:113-143).  These run the full graph at
those dimensions against the independent torch oracle, single- and
multi-speaker.  Slow (CPU, ~20M params) — marked accordingly.
"""

import numpy as np
import pytest
import torch

import torch_oracle as oracle

from mimic3_tpu.config import ModelConfig
from mimic3_tpu.models.vits import VitsModel
from mimic3_tpu.runtime.convert import state_dict_to_pytree

pytestmark = pytest.mark.slow

N_VOCAB = 130  # typical phonemes.txt size
T_TEXT = 13


def _build(n_speakers: int = 1, gin: int = 0):
    import jax.numpy as jnp

    torch.manual_seed(11)
    tm = oracle.SynthesizerTrn(
        N_VOCAB,
        n_speakers=n_speakers,
        gin_channels=gin,
    )
    tm.eval()
    params = state_dict_to_pytree(oracle.state_dict_numpy(tm))
    cfg = ModelConfig(
        num_symbols=N_VOCAB,
        n_speakers=n_speakers,
        gin_channels=gin,
    )
    jm = VitsModel(cfg, decoder_dtype=jnp.float32)
    return tm, jm, params


def _check_parity(tm, jm, params, sid=None):
    import jax
    import jax.numpy as jnp

    ids = np.random.RandomState(3).randint(1, N_VOCAB, (2, T_TEXT))
    ids[1, 10:] = 0
    lengths = np.array([T_TEXT, 10])

    with torch.no_grad():
        audio_t, _ylen_t, w_t = tm.infer(
            torch.tensor(ids),
            torch.tensor(lengths),
            noise_scale=0.0,
            length_scale=1.0,
            noise_w=0.0,
            sid=None if sid is None else torch.tensor(sid),
        )

    rng = jax.random.PRNGKey(0)
    sid_j = None if sid is None else jnp.array(sid)
    durs, totals = jm.infer_durations(
        params,
        jnp.array(ids),
        jnp.array(lengths),
        rng,
        jnp.float32(1.0),
        jnp.float32(0.0),
        sid=sid_j,
    )
    np.testing.assert_array_equal(
        np.asarray(durs), w_t.numpy()[:, 0, :].astype(np.int32)
    )
    num_frames = int(np.asarray(totals).max())
    audio_j, alen_j = jm.decode_frames(
        params,
        jnp.array(ids),
        jnp.array(lengths),
        durs,
        num_frames,
        rng,
        jnp.float32(0.0),
        sid=sid_j,
    )
    for b in range(ids.shape[0]):
        n = int(alen_j[b])
        assert n > 0
        got = np.asarray(audio_j)[b, :n]
        ref = audio_t.numpy()[b][:n]
        np.testing.assert_allclose(got, ref, atol=2e-4)
        corr = np.corrcoef(got, ref)[0, 1]
        assert corr > 0.999, f"batch {b}: waveform correlation {corr}"


def test_full_size_single_speaker():
    """hidden 192 / 6 layers / 512ch HiFi-GAN, exact *_low dims."""
    tm, jm, params = _build()
    assert jm.hp.hidden_channels == 192
    assert jm.hp.n_layers == 6
    assert jm.hp.upsample_initial_channel == 512
    assert tuple(jm.hp.upsample_rates) == (8, 8, 2, 2)
    _check_parity(tm, jm, params)


def test_full_size_multispeaker():
    """vctk-style multispeaker dims (gin conditioning everywhere)."""
    tm, jm, params = _build(n_speakers=109, gin=256)
    _check_parity(tm, jm, params, sid=np.array([3, 57]))
