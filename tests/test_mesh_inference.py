"""Data-parallel inference over a device mesh matches single-device.

The reference scales serving with N worker threads
(reference: mimic3_http/__main__.py:53-61); the TPU-native design
shards the request batch over a ``jax.sharding.Mesh`` dp axis instead
(SURVEY.md §2.4).  These tests run that path on the 8 virtual CPU
devices set up by conftest.py and require numerical agreement with the
unsharded session.
"""

import numpy as np
import pytest

from mimic3_tpu.runtime.testvoice import create_test_voice
from mimic3_tpu.runtime.voice import TpuVoice

SEQS = [
    [1, 5, 9, 2, 7, 3],
    [4, 4, 8, 1],
    [2, 9, 9, 9, 5, 5, 6, 1, 3],
    [7, 1],
    [3, 3, 3, 8, 2, 6],
    [5, 2, 7],
    [6, 6, 1, 4, 9, 2, 8, 3],
    [9, 8, 7, 6, 5],
]


@pytest.fixture(scope="module")
def voice_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("mesh_voices") / "en_US" / "test_low"
    create_test_voice(d, full_size=False, n_speakers=4)
    return d


@pytest.fixture(scope="module")
def single(voice_dir):
    # deterministic=True -> f32 decoder, so cross-layout comparisons
    # are not confounded by bf16 rounding
    return TpuVoice.load_from_directory(
        voice_dir, share_sessions=False, deterministic=True
    ).session


@pytest.fixture(scope="module")
def dp8(voice_dir):
    return TpuVoice.load_from_directory(
        voice_dir, share_sessions=False, deterministic=True, dp=8
    ).session


def test_mesh_session_spans_devices(dp8):
    import jax

    assert dp8.mesh is not None
    assert dp8.dp == 8
    leaf = jax.tree_util.tree_leaves(dp8.params)[0]
    assert len(leaf.sharding.device_set) == 8
    # every batch bucket divides dp
    assert all(b % 8 == 0 for b in dp8.batch_buckets)


def test_dp8_matches_single_deterministic(single, dp8):
    ref = single.synthesize_ids_batch(
        SEQS, noise_scale=0.0, noise_w=0.0, seed=0
    )
    got = dp8.synthesize_ids_batch(
        SEQS, noise_scale=0.0, noise_w=0.0, seed=0
    )
    assert len(ref) == len(got) == len(SEQS)
    for r, g in zip(ref, got):
        assert r.shape == g.shape
        np.testing.assert_allclose(g, r, atol=2e-5, rtol=0)


def test_dp8_matches_single_with_noise_and_speakers(single, dp8):
    sids = [0, 1, 2, 3, 0, 1, 2, 3]
    ref = single.synthesize_ids_batch(
        SEQS, speaker_ids=sids, noise_scale=0.667, noise_w=0.8, seed=11
    )
    got = dp8.synthesize_ids_batch(
        SEQS, speaker_ids=sids, noise_scale=0.667, noise_w=0.8, seed=11
    )
    for r, g in zip(ref, got):
        assert r.shape == g.shape
        np.testing.assert_allclose(g, r, atol=2e-5, rtol=0)


def test_partial_batch_pads_to_dp(single, dp8):
    """A 5-item batch on dp=8 pads internally and still matches."""
    ref = single.synthesize_ids_batch(
        SEQS[:5], noise_scale=0.0, noise_w=0.0, seed=0
    )
    got = dp8.synthesize_ids_batch(
        SEQS[:5], noise_scale=0.0, noise_w=0.0, seed=0
    )
    assert len(got) == 5
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, atol=2e-5, rtol=0)


def test_batch_bucket_reuses_executable(dp8):
    """Distinct partial batch sizes share one padded executable."""
    dp8.synthesize_ids_batch(SEQS[:3], noise_scale=0.0, noise_w=0.0)
    dur_compiled = dp8._dur_fn._cache_size()
    dec_compiled = dp8._dec_fn._cache_size()
    dp8.synthesize_ids_batch(SEQS[:6], noise_scale=0.0, noise_w=0.0)
    dp8.synthesize_ids_batch(SEQS[:8], noise_scale=0.0, noise_w=0.0)
    assert dp8._dur_fn._cache_size() == dur_compiled
    assert dp8._dec_fn._cache_size() == dec_compiled


def test_single_stream_on_mesh(dp8):
    """Batch-1 (streaming) requests run replicated on the mesh."""
    audio = dp8.synthesize_ids(SEQS[0], noise_scale=0.0, noise_w=0.0)
    assert audio.size > 0
    chunks = list(
        dp8.synthesize_ids_chunked(
            SEQS[2], noise_scale=0.0, noise_w=0.0, chunk_frames=16,
            overlap=32,
        )
    )
    assert chunks and all(c.size for c in chunks)


def test_oversized_batch_splits(single):
    """Direct batches beyond the largest bucket split, not compile."""
    seqs = (SEQS * 3)[:20]  # > default max bucket 16
    dur0 = single._dur_fn._cache_size()
    out = single.synthesize_ids_batch(
        seqs, noise_scale=0.0, noise_w=0.0, seed=0
    )
    assert len(out) == 20
    ref = single.synthesize_ids_batch(
        seqs[:16], noise_scale=0.0, noise_w=0.0, seed=0
    )
    np.testing.assert_allclose(out[0], ref[0], atol=2e-5, rtol=0)
    del dur0
