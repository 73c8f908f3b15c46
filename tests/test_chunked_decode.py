"""Chunked (streaming) decode must match the full decode seamlessly."""

import numpy as np
import pytest

from mimic3_tpu.runtime.testvoice import create_test_voice
from mimic3_tpu.runtime.voice import TpuVoice


@pytest.fixture(scope="module")
def voice(tmp_path_factory):
    d = tmp_path_factory.mktemp("chunk_voices") / "en_US" / "test_low"
    create_test_voice(d, full_size=False)
    return TpuVoice.load_from_directory(d)


def test_chunked_matches_full_deterministic(voice):
    ids = voice.phonemes_to_ids(
        [list(word) for word in "the quick brown fox jumps".split()]
    )
    session = voice.session

    full = session.synthesize_ids(ids, noise_scale=0.0, noise_w=0.0)
    chunks = list(
        session.synthesize_ids_chunked(
            ids,
            noise_scale=0.0,
            noise_w=0.0,
            chunk_frames=16,
            overlap=48,
        )
    )
    assert len(chunks) >= 2  # actually streamed
    stitched = np.concatenate(chunks)
    assert len(stitched) == len(full)
    # same float audio up to receptive-field edge effects
    err = np.abs(stitched - full)
    assert float(err.max()) < 5e-4, float(err.max())


def test_chunked_first_chunk_is_small(voice):
    ids = voice.phonemes_to_ids(
        [list(word) for word in "a much longer sentence for streaming "
         "purposes with many words".split()]
    )
    gen = voice.session.synthesize_ids_chunked(
        ids, noise_scale=0.0, noise_w=0.0, chunk_frames=16, overlap=32
    )
    first = next(gen)
    hop = voice.session.model.hp.hop_length
    assert len(first) == 16 * hop  # one chunk, not the whole utterance
    rest = list(gen)
    assert rest


def test_chunked_with_noise_is_deterministic_per_seed(voice):
    ids = voice.phonemes_to_ids([list("hello"), list("world")])

    def run():
        return np.concatenate(
            list(
                voice.session.synthesize_ids_chunked(
                    ids, noise_scale=0.5, noise_w=0.0, seed=7,
                    chunk_frames=16, overlap=48,
                )
            )
        )

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)


def test_small_first_chunk_matches_uniform_grid(voice):
    """first_chunk_frames changes the grid, not the audio (same seed)."""
    ids = voice.phonemes_to_ids(
        [list(word) for word in "pack my box with five dozen "
         "liquor jugs".split()]
    )

    def run(**kw):
        return list(
            voice.session.synthesize_ids_chunked(
                ids, noise_scale=0.5, noise_w=0.0, seed=11,
                chunk_frames=16, overlap=48, **kw
            )
        )

    uniform = run()
    small_first = run(first_chunk_frames=8)
    hop = voice.session.model.hp.hop_length
    assert len(small_first[0]) == 8 * hop  # smaller first chunk
    a = np.concatenate(uniform)
    b = np.concatenate(small_first)
    assert len(a) == len(b)
    err = np.abs(a - b)
    assert float(err.max()) < 5e-4, float(err.max())


def test_first_chunk_frames_clamped_to_chunk_frames(voice):
    ids = voice.phonemes_to_ids([list("hello"), list("there")])
    chunks = list(
        voice.session.synthesize_ids_chunked(
            ids, noise_scale=0.0, noise_w=0.0,
            chunk_frames=16, overlap=32, first_chunk_frames=999,
        )
    )
    hop = voice.session.model.hp.hop_length
    assert len(chunks[0]) <= 16 * hop
