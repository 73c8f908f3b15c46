"""End-to-end voice runtime tests with a synthetic voice directory."""

import numpy as np
import pytest

from mimic3_tpu.runtime.session import pick_bucket
from mimic3_tpu.runtime.testvoice import create_test_voice
from mimic3_tpu.runtime.voice import BreakType, TpuVoice


@pytest.fixture(scope="module")
def voice_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("voices") / "en_US" / "test_low"
    return create_test_voice(d, full_size=False)


@pytest.fixture(scope="module")
def voice(voice_dir):
    return TpuVoice.load_from_directory(voice_dir)


def test_pick_bucket():
    assert pick_bucket(5, (32, 64)) == 32
    assert pick_bucket(32, (32, 64)) == 32
    assert pick_bucket(33, (32, 64)) == 64
    # serving default: clamp at the largest warmed bucket (no compile
    # on the request path); grow=True restores the geometric ladder
    assert pick_bucket(65, (32, 64)) == 64
    assert pick_bucket(200, (32, 64)) == 64
    assert pick_bucket(65, (32, 64), grow=True) == 128
    assert pick_bucket(200, (32, 64), grow=True) == 256


def test_voice_loads(voice):
    assert voice.config.model.num_symbols > 0
    assert voice.phoneme_to_id["_"] == 0
    assert voice.phoneme_to_id["^"] == 1


def test_text_to_phonemes(voice):
    chunks = list(voice.text_to_phonemes("hello world"))
    assert len(chunks) == 1
    word_phonemes, bt = chunks[0]
    assert bt == BreakType.UTTERANCE
    assert word_phonemes[0] == list("hello")
    assert word_phonemes[1] == list("world")


def test_phonemes_to_ids(voice):
    ids = voice.phonemes_to_ids([list("hi")])
    # ^ # h i # $  (bos, start blank, chars, end blank, eos)
    assert ids[0] == voice.phoneme_to_id["^"]
    assert ids[-1] == voice.phoneme_to_id["$"]
    assert voice.phoneme_to_id["h"] in ids
    assert voice.phoneme_to_id["i"] in ids


def test_ids_to_audio(voice):
    ids = voice.phonemes_to_ids([list("hello"), list("world")])
    audio = voice.ids_to_audio(ids, noise_scale=0, noise_w=0)
    assert audio.dtype == np.int16
    assert len(audio) > 0
    assert np.abs(audio).max() > 0
    # deterministic mode: same input -> same audio
    audio2 = voice.ids_to_audio(ids, noise_scale=0, noise_w=0)
    np.testing.assert_array_equal(audio, audio2)


def test_batch_matches_single(voice):
    """Batched synthesis must produce the same audio as single calls."""
    seqs = [
        voice.phonemes_to_ids([list("hello")]),
        voice.phonemes_to_ids([list("goodbye"), list("now")]),
    ]
    batch = voice.session.synthesize_ids_batch(
        seqs, noise_scale=0.0, noise_w=0.0
    )
    for seq, batched in zip(seqs, batch):
        single = voice.session.synthesize_ids(
            seq, noise_scale=0.0, noise_w=0.0
        )
        assert len(single) == len(batched)
        np.testing.assert_allclose(single, batched, atol=1e-5)


def test_batch_invariant_sampling(voice):
    """With a fixed seed, NOISY sampling is batch-invariant: an
    utterance's audio is identical whether synthesized alone or packed
    into any batch slot/bucket (prior noise is frame-indexed and
    duration noise position-indexed — neither depends on the batch
    slot or the padded bucket)."""
    a = voice.phonemes_to_ids([list("hello")])
    b = voice.phonemes_to_ids(
        [list("a"), list("much"), list("longer"), list("utterance")]
    )
    solo = voice.session.synthesize_ids(
        a, noise_scale=0.667, noise_w=0.8, seed=123
    )
    # slot 1 of a 2-row batch whose max length forces a larger bucket
    packed = voice.session.synthesize_ids_batch(
        [b, a], noise_scale=0.667, noise_w=0.8, seed=123
    )[1]
    assert len(solo) == len(packed)
    # tight tolerance: the property is bit-level (same noise values),
    # with only batch-size-dependent XLA reduction order as slack
    np.testing.assert_allclose(solo, packed, atol=2e-5)


def test_rtf_tracked(voice):
    assert voice.session.stats.utterances > 0
    assert voice.session.stats.mean_rtf > 0


def test_multispeaker_voice(tmp_path):
    d = create_test_voice(
        tmp_path / "multi_low", n_speakers=3, full_size=False
    )
    v = TpuVoice.load_from_directory(d)
    assert v.config.is_multispeaker
    assert v.resolve_speaker_id("speaker_1") == 1
    assert v.resolve_speaker_id(2) == 2
    assert v.resolve_speaker_id("2") == 2
    assert v.resolve_speaker_id("nonexistent") == 0

    # Random-init weights barely propagate the speaker embedding (VITS
    # zero-inits the coupling projections; HiFi-GAN weights are N(0,.01)),
    # so amplify emb_g to verify the conditioning path is actually wired.
    v.session.params["emb_g"]["weight"] = (
        v.session.params["emb_g"]["weight"] * 100.0
    )
    ids = v.phonemes_to_ids([list("hey")])
    a0 = v.ids_to_audio(ids, speaker=0, noise_scale=0, noise_w=0)
    a1 = v.ids_to_audio(ids, speaker="speaker_1", noise_scale=0, noise_w=0)
    # different speaker embeddings must change the audio
    n = min(len(a0), len(a1))
    assert (len(a0) != len(a1)) or (
        np.abs(a0[:n].astype(np.int32) - a1[:n].astype(np.int32)).max() > 0
    )


def test_shared_sessions(voice_dir):
    v1 = TpuVoice.load_from_directory(voice_dir)
    v2 = TpuVoice.load_from_directory(voice_dir)
    assert v1.session is v2.session
    v3 = TpuVoice.load_from_directory(voice_dir, share_sessions=False)
    assert v3.session is not v1.session


def test_no_compile_on_oversized_request(voice_dir):
    """A pathological 10k-phoneme input must reuse the largest warmed
    executable (truncate + warn), never trigger a fresh XLA compile."""
    v = TpuVoice.load_from_directory(voice_dir, share_sessions=False)
    session = v.session
    session.text_buckets = (16, 32)
    session.frame_buckets = (64, 128)
    assert not session.allow_bucket_growth  # serving default

    # warm the largest buckets
    session.warmup(batch_sizes=(1,))
    dur_compiled = session._dur_fn._cache_size()
    dec_compiled = session._dec_fn._cache_size()

    audio = session.synthesize_ids(
        list(np.tile(np.arange(2, 10), 1250)),  # 10k phonemes
        noise_scale=0.0,
        noise_w=0.0,
    )
    assert len(audio) > 0
    assert session._dur_fn._cache_size() == dur_compiled
    assert session._dec_fn._cache_size() == dec_compiled


def test_warmup_precompiles_chunk_windows(voice):
    """warmup(chunk_windows=...) compiles the streaming executables so
    the first low-latency request pays no XLA compile."""
    session = voice.session
    before = session.stats.compile_count
    session.warmup(
        text_buckets=(32,), frame_buckets=(64,), chunk_windows=(24, 48)
    )
    # 1 dur + 1 dec + 1 fused stream-start (supplies the encoder
    # stats; there is no separate encoder executable) + 2 chunk
    # windows = 5 executables
    assert session.stats.compile_count - before == 5
    # streaming through the warmed path still works
    ids = voice.phonemes_to_ids([list("warm"), list("boot")])
    chunks = list(
        session.synthesize_ids_chunked(
            ids, noise_scale=0.0, noise_w=0.0,
            chunk_frames=16, overlap=4, first_chunk_frames=8,
        )
    )
    assert chunks and all(len(c) > 0 for c in chunks)
