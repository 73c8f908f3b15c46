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


def test_batched_stream_start_matches_solo(voice):
    """stream_start_batch rows are bit-identical to solo chunked
    streams (batch-invariant sampling: frame-indexed prior noise +
    position-indexed duration noise)."""
    session = voice.session
    seq_a = voice.phonemes_to_ids([list("hello"), list("there")])
    seq_b = voice.phonemes_to_ids(
        [list(w) for w in "a much longer sentence entirely".split()]
    )

    gens = session.stream_start_batch(
        [seq_b, seq_a],
        noise_scale=0.667,
        noise_w=0.8,
        seed=42,
        chunk_frames=16,
        overlap=32,
        first_chunk_frames=8,
    )
    batched = [np.concatenate(list(g)) for g in gens]

    for seq, got in zip((seq_b, seq_a), batched):
        solo = np.concatenate(
            list(
                session.synthesize_ids_chunked(
                    seq,
                    noise_scale=0.667,
                    noise_w=0.8,
                    seed=42,
                    chunk_frames=16,
                    overlap=32,
                    first_chunk_frames=8,
                )
            )
        )
        assert len(solo) == len(got)
        np.testing.assert_allclose(got, solo, atol=2e-5)


def test_scheduler_batches_concurrent_streams(voice):
    """Concurrent synthesize_ids_chunked calls with a scheduler
    attached share one fused stream-start batch and still produce
    exactly the solo output."""
    import threading

    from mimic3_tpu.server.scheduler import BatchScheduler

    session = voice.session
    seqs = [
        voice.phonemes_to_ids([list("first"), list("stream")]),
        voice.phonemes_to_ids([list("second"), list("one")]),
        voice.phonemes_to_ids([list("third")]),
    ]
    kwargs = dict(
        noise_scale=0.667, noise_w=0.8, seed=7,
        chunk_frames=16, overlap=32, first_chunk_frames=8,
    )
    solos = [
        np.concatenate(
            list(session.synthesize_ids_chunked(s, **kwargs))
        )
        for s in seqs
    ]

    scheduler = BatchScheduler(max_batch=8, max_delay_ms=200.0)
    session.batcher = scheduler
    results: list = [None] * len(seqs)
    try:
        barrier = threading.Barrier(len(seqs))

        def run(i):
            barrier.wait()
            results[i] = np.concatenate(
                list(
                    session.synthesize_ids_chunked(seqs[i], **kwargs)
                )
            )

        threads = [
            threading.Thread(target=run, args=(i,))
            for i in range(len(seqs))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        session.batcher = None
        scheduler.shutdown()

    # the three stream starts shared device batches
    assert scheduler.stats.items == len(seqs)
    assert scheduler.stats.batches < len(seqs)
    for solo, got in zip(solos, results):
        assert got is not None and len(got) == len(solo)
        np.testing.assert_allclose(got, solo, atol=2e-5)
