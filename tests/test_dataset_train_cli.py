"""Dataset pipeline + mimic3-train CLI end-to-end (tiny synthetic data)."""

import json
import subprocess
import sys
import wave
from pathlib import Path

import numpy as np
import pytest

from mimic3_tpu.config import TrainingConfig
from mimic3_tpu.runtime.dataset import (
    batches,
    load_metadata,
    make_frontend,
    read_wav,
)
from mimic3_tpu.runtime.testvoice import create_test_voice

REPO = Path(__file__).parent.parent


def _write_wav(path: Path, samples: np.ndarray, rate: int = 22050):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(
            (samples * 20000).astype(np.int16).tobytes()
        )


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("train_data")
    voice_dir = create_test_voice(root / "voice", full_size=False)
    # make the tiny config's segments small so training fits
    cfg = TrainingConfig.load_path(voice_dir / "config.json")
    cfg.segment_size = 2048
    cfg.batch_size = 2
    with open(voice_dir / "config.json", "w") as f:
        cfg.save(f)

    audio_dir = root / "wavs"
    audio_dir.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    texts = ["hello world", "good morning", "testing one two"]
    for i, text in enumerate(texts):
        n = 22050 // 4 + i * 1000  # ~0.25s+
        _write_wav(
            audio_dir / f"utt{i}.wav", rng.randn(n) * 0.05
        )
        rows.append(f"utt{i}|{text}")
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")
    return root, voice_dir, audio_dir


def test_read_wav_roundtrip(dataset_dir):
    root, _, audio_dir = dataset_dir
    audio = read_wav(audio_dir / "utt0.wav", 22050)
    assert audio.dtype == np.float32
    assert np.abs(audio).max() <= 1.0


def test_load_metadata_and_batches(dataset_dir):
    root, voice_dir, audio_dir = dataset_dir
    frontend = make_frontend(voice_dir)
    utts = load_metadata(root / "metadata.csv", audio_dir, frontend)
    assert len(utts) == 3
    assert all(u.phoneme_ids for u in utts)

    config = TrainingConfig.load_path(voice_dir / "config.json")
    it = batches(
        utts, config, batch_size=2, text_buckets=(32, 64),
        frame_buckets=(16, 32, 64),
    )
    batch = next(it)
    assert batch.phoneme_ids.shape[0] == 2
    assert batch.audio.shape[1] % 256 == 0
    assert int(batch.spec_lengths.max()) * 256 <= batch.audio.shape[1]


def test_train_cli_end_to_end(dataset_dir, tmp_path):
    """Run mimic3-train for 2 steps and export inference weights."""
    root, voice_dir, audio_dir = dataset_dir
    result = subprocess.run(
        [
            sys.executable, "-m", "mimic3_tpu.train_cli",
            str(voice_dir),
            "--metadata", str(root / "metadata.csv"),
            "--audio-dir", str(audio_dir),
            "--batch-size", "2",
            "--steps", "2",
            "--checkpoint-every", "1000",
            "--export",
        ],
        capture_output=True,
        timeout=500,
        cwd=REPO,
        env={
            "PATH": "/usr/bin:/bin",
            "JAX_PLATFORMS": "cpu",
            "HOME": "/tmp",
        },
    )
    assert result.returncode == 0, result.stderr.decode()[-3000:]
    out = json.loads(result.stdout.strip().splitlines()[-1])
    assert out["final_step"] == 2
    assert (voice_dir / "generator.npz").is_file()

    # exported weights still load for inference
    from mimic3_tpu.runtime.voice import TpuVoice

    voice = TpuVoice.load_from_directory(voice_dir)
    ids = voice.phonemes_to_ids([list("ok")])
    audio = voice.ids_to_audio(ids, noise_scale=0, noise_w=0)
    assert len(audio) > 0


def test_partial_batch_topped_up_to_full(dataset_dir):
    """3 utterances with batch_size 8 (remainder < batch/2): the last
    batch must repeat items until FULL, not yield ragged arrays."""
    root, voice_dir, audio_dir = dataset_dir
    frontend = make_frontend(voice_dir)
    utts = load_metadata(root / "metadata.csv", audio_dir, frontend)
    config = TrainingConfig.load_path(voice_dir / "config.json")
    it = batches(
        utts, config, batch_size=8, text_buckets=(32,),
        frame_buckets=(64,),
    )
    batch = next(it)
    assert batch.phoneme_ids.shape[0] == 8
    assert batch.text_lengths.shape[0] == 8
    assert batch.audio.shape[0] == 8
    assert batch.spec_lengths.shape[0] == 8
    # true lengths: padded silence is NOT counted as valid frames
    import numpy as np

    hop = config.audio.hop_length
    seg_frames = config.segment_size // hop
    raw_frames = {
        len(read_wav(u.audio_path, config.audio.sample_rate)) // hop
        for u in utts
    }
    for n in np.asarray(batch.spec_lengths):
        assert int(n) in raw_frames
    # audio buffer still covers at least one segment
    assert batch.audio.shape[1] >= seg_frames * hop
