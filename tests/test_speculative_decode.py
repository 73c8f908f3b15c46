"""Speculative frame-bucket decode + frame-indexed prior noise.

The serving path dispatches the decode at a predicted frame bucket
before the duration-totals host sync (runtime/session.py).  That is
only sound because prior noise is indexed by GLOBAL frame number
(models/vits/model.py decode_frames), making audio independent of the
frame bucket and of chunk window grids.
"""

import numpy as np
import pytest

from mimic3_tpu.runtime.testvoice import create_test_voice
from mimic3_tpu.runtime.voice import TpuVoice

IDS = [3, 7, 1, 9, 4, 4, 8, 2, 6, 5]


@pytest.fixture(scope="module")
def voice_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("spec_voices") / "en_US" / "test_low"
    create_test_voice(d, full_size=False)
    return d


def _fresh_session(voice_dir, **kw):
    v = TpuVoice.load_from_directory(
        voice_dir, share_sessions=False, **kw
    )
    return v.session


def test_noise_is_bucket_independent(voice_dir):
    """Same seed at two frame buckets -> identical valid samples."""
    import jax
    import jax.numpy as jnp

    session = _fresh_session(voice_dir)
    model, params = session.model, session.params
    ids = jnp.asarray([IDS], jnp.int32)
    lengths = jnp.asarray([len(IDS)], jnp.int32)
    rng = jax.random.PRNGKey(5)
    durations, totals = model.infer_durations(
        params, ids, lengths, rng, jnp.float32(1.0), jnp.float32(0.0)
    )
    total = int(np.asarray(totals)[0])
    small = 1
    while small < total:
        small *= 2
    a_small, len_small = model.decode_frames(
        params, ids, lengths, durations, small, rng, jnp.float32(0.8)
    )
    a_big, len_big = model.decode_frames(
        params, ids, lengths, durations, small * 2, rng,
        jnp.float32(0.8),
    )
    n = int(np.asarray(len_small)[0])
    assert n == int(np.asarray(len_big)[0])
    np.testing.assert_allclose(
        np.asarray(a_small)[0, :n], np.asarray(a_big)[0, :n],
        atol=2e-5, rtol=0,
    )


def test_speculation_matches_normal_path(voice_dir):
    on = _fresh_session(voice_dir)
    off = _fresh_session(voice_dir)
    off.speculative_decode = False
    assert on.speculative_decode

    # first call trains the EMA (non-speculative); later calls predict
    for s in (on, off):
        s.synthesize_ids(IDS, noise_scale=0.5, noise_w=0.0, seed=1)
    assert on._ema_frames_per_phoneme is not None

    a = on.synthesize_ids(IDS, noise_scale=0.5, noise_w=0.0, seed=2)
    b = off.synthesize_ids(IDS, noise_scale=0.5, noise_w=0.0, seed=2)
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=0)


def test_misprediction_falls_back(voice_dir):
    session = _fresh_session(voice_dir)
    ref = session.synthesize_ids(
        IDS, noise_scale=0.5, noise_w=0.0, seed=3
    )
    # force an absurdly small prediction -> spec bucket too small
    with session._lock:
        session._ema_frames_per_phoneme = 0.25
    got = session.synthesize_ids(
        IDS, noise_scale=0.5, noise_w=0.0, seed=3
    )
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=0)


def test_chunked_agrees_with_batch_under_noise(voice_dir):
    """Frame-indexed noise unifies the streamed and batch paths."""
    session = _fresh_session(voice_dir)
    full = session.synthesize_ids(
        IDS, noise_scale=0.667, noise_w=0.0, seed=9
    )
    chunks = list(
        session.synthesize_ids_chunked(
            IDS, noise_scale=0.667, noise_w=0.0, seed=9,
            chunk_frames=16, overlap=48,
        )
    )
    stitched = np.concatenate(chunks)
    assert len(stitched) == len(full)
    err = np.abs(stitched - full)
    assert float(err.max()) < 5e-4, float(err.max())


def test_streaming_honors_speculation_flag(voice_dir):
    """speculative_decode=False also disables the streamed first-window
    pre-dispatch, with identical output."""
    session = _fresh_session(voice_dir)
    ref = np.concatenate(
        list(
            session.synthesize_ids_chunked(
                IDS, noise_scale=0.5, noise_w=0.0, seed=4,
                chunk_frames=16, overlap=48,
            )
        )
    )
    session.speculative_decode = False
    got = np.concatenate(
        list(
            session.synthesize_ids_chunked(
                IDS, noise_scale=0.5, noise_w=0.0, seed=4,
                chunk_frames=16, overlap=48,
            )
        )
    )
    np.testing.assert_array_equal(got, ref)


def test_ema_tracks_observations(voice_dir):
    session = _fresh_session(voice_dir)
    assert session._ema_frames_per_phoneme is None
    session.synthesize_ids(IDS, noise_scale=0.0, noise_w=0.0)
    first = session._ema_frames_per_phoneme
    assert first is not None and 0.25 <= first <= 64.0
    session.synthesize_ids(IDS * 2, noise_scale=0.0, noise_w=0.0)
    assert session._ema_frames_per_phoneme is not None
