"""Engine tests: voice discovery, utterance assembly, text_to_wav."""

import io
import wave
from pathlib import Path

import numpy as np
import pytest

from mimic3_tpu.api import AudioResult, MarkResult
from mimic3_tpu.engine import (
    Mimic3Settings,
    Mimic3TextToSpeechSystem,
    VoiceNotFoundError,
)
from mimic3_tpu.runtime.testvoice import create_test_voice


@pytest.fixture(scope="module")
def voices_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("engine_voices")
    create_test_voice(root / "en_US" / "test_low", full_size=False)
    (root / "en_US" / "test_low" / "ALIASES").write_text("tester\n")
    return root


@pytest.fixture()
def tts(voices_root):
    return Mimic3TextToSpeechSystem(
        Mimic3Settings(
            voice="en_US/test_low",
            voices_directories=[voices_root],
            no_download=True,
        )
    )


def test_get_voices(tts):
    voices = list(tts.get_voices())
    local = [v for v in voices if v.key == "en_US/test_low"]
    assert len(local) == 1
    assert "tester" in (local[0].aliases or set())
    # registry voices are listed as remote entries
    remote = [v for v in voices if v.key == "en_UK/apope_low"]
    assert len(remote) == 1
    assert remote[0].location.startswith("http")


def test_voice_not_found(tts):
    tts.voice = "xx_XX/nope_low"
    with pytest.raises(VoiceNotFoundError):
        tts.speak_text("hi")


def test_voice_speaker_split(tts):
    tts.voice = "en_US/test_low#3"
    assert tts.voice == "en_US/test_low"
    assert tts.speaker == "3"
    # changing voice clears speaker
    tts.voice = "en_US/other"
    assert tts.speaker is None


def test_alias_loads(tts):
    tts.voice = "tester"
    tts.speak_text("hello")
    results = list(tts.end_utterance())
    assert any(isinstance(r, AudioResult) for r in results)


def test_text_to_wav(tts):
    wav_bytes = tts.text_to_wav("hello world")
    with wave.open(io.BytesIO(wav_bytes)) as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() > 0


def test_marks_and_breaks(tts):
    tts.begin_utterance()
    tts.speak_text("one")
    tts.set_mark("m1")
    tts.add_break(100)
    tts.speak_text("two")
    results = list(tts.end_utterance())
    kinds = [type(r).__name__ for r in results]
    assert kinds.count("MarkResult") == 1
    # audio, mark, silence, audio
    assert kinds == [
        "AudioResult",
        "MarkResult",
        "AudioResult",
        "AudioResult",
    ]
    mark = [r for r in results if isinstance(r, MarkResult)][0]
    assert mark.name == "m1"
    # break silence is 100ms of int16 zeros
    silence = results[2]
    assert len(silence.audio_bytes) == int(0.1 * 22050) * 2
    assert not any(silence.audio_bytes)


def test_volume_scaling(tts):
    tts.volume = 50
    tts.speak_text("loud")
    half = [
        r for r in tts.end_utterance() if isinstance(r, AudioResult)
    ][0]
    tts.volume = 100
    tts.speak_text("loud")
    full = [
        r for r in tts.end_utterance() if isinstance(r, AudioResult)
    ][0]
    half_arr = np.frombuffer(half.audio_bytes, np.int16)
    full_arr = np.frombuffer(full.audio_bytes, np.int16)
    assert abs(half_arr.astype(np.float64)).max() <= (
        abs(full_arr.astype(np.float64)).max() / 2 + 1
    )


def test_settings_change_flushes(tts):
    """Rate change mid-utterance must split synthesis at the boundary."""
    tts.begin_utterance()
    tts.speak_text("first part")
    tts.rate = 2.0
    tts.speak_text("second part")
    results = list(tts.end_utterance())
    audio = [r for r in results if isinstance(r, AudioResult)]
    assert len(audio) == 2


def test_settings_snapshot_per_sentence(tts):
    """Each sentence is synthesized with the settings captured when its
    text was queued — a deliberate divergence from the reference, which
    passes the STALE previous chunk's settings at an utterance boundary
    (reference: mimic3_tts/tts.py:489-495, fallback :525).  See the
    ``end_utterance`` docstring."""
    used = []
    orig = tts._synthesize

    def spy(phonemes, settings):
        used.append(settings)
        return orig(phonemes, settings)

    tts._synthesize = spy
    tts.rate = 1.0
    tts.speak_text("first part")
    tts.rate = 2.0
    tts.speak_text("second part")
    list(tts.end_utterance())
    assert [s.rate for s in used] == [1.0, 2.0]
    # and the snapshot is taken at queue time, not end_utterance time:
    tts.rate = 0.5
    tts.speak_text("third part")
    tts.rate = 3.0
    used.clear()
    list(tts.end_utterance())
    assert [s.rate for s in used] == [0.5]


def test_deterministic_synthesis(voices_root):
    def synth():
        tts = Mimic3TextToSpeechSystem(
            Mimic3Settings(
                voice="en_US/test_low",
                voices_directories=[voices_root],
                no_download=True,
                noise_scale=0.0,
                noise_w=0.0,
                use_deterministic_compute=True,
                share_sessions=False,
            )
        )
        return tts.text_to_wav("the same text every time")

    assert synth() == synth()


def test_text_to_wav_no_audio_yields_empty_wav():
    """When synthesis yields no AudioResult, text_to_wav returns a valid
    zero-frame WAV instead of wave.Error from an unparameterized
    Wave_write.close() (raised in __exit__, after the in-function
    handler)."""
    from mimic3_tpu.api import TextToSpeechSystem

    class SilentTts(TextToSpeechSystem):
        voice = "x"
        language = "en"
        volume = 100.0
        rate = 1.0

        def get_voices(self):
            return []

        def begin_utterance(self):
            pass

        def speak_text(self, text, text_language=None):
            pass

        def speak_tokens(self, tokens):
            pass

        def add_break(self, time_ms):
            pass

        def set_mark(self, name):
            pass

        def end_utterance(self):
            return []

        def shutdown(self):
            pass

    wav_bytes = SilentTts().text_to_wav("anything")
    with wave.open(io.BytesIO(wav_bytes)) as w:
        assert w.getnframes() == 0
        assert w.getframerate() == 22050


def test_corrupt_config_falls_back_to_scan(tmp_path):
    """A voice dir with corrupt config.json must not be picked by the
    exact-key fast path; the scan finds a healthy copy elsewhere."""
    bad_root = tmp_path / "bad"
    good_root = tmp_path / "good"
    bad_dir = bad_root / "en_US" / "dup_low"
    bad_dir.mkdir(parents=True)
    (bad_dir / "config.json").write_text("{ truncated")
    create_test_voice(
        good_root / "en_US" / "dup_low", full_size=False, seed=21
    )

    tts = Mimic3TextToSpeechSystem(
        Mimic3Settings(
            voices_directories=[str(bad_root), str(good_root)],
            no_download=True,
        )
    )
    voice = tts._get_or_load_voice("en_US/dup_low")
    assert Path(voice.location).parent.parent == good_root
