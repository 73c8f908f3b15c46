#!/usr/bin/env python3
"""Real-TPU training smoke + throughput: full-size VITS GAN step.

Builds a synthetic full-size voice and LJSpeech-style dataset, then
runs ``mimic3-train`` on the current JAX device for a few steps and
reports steps/sec.  Proves the full training objective (generator +
MPD/MSD discriminators, two optimizers) compiles and runs on real TPU
hardware, not just the CPU test mesh.

Usage: nohup python -u scripts/train_tpu_smoke.py > /tmp/train_tpu.log 2>&1 &
"""

import json
import shutil
import tempfile
import time
import wave
from pathlib import Path

import numpy as np

ROOT = Path(tempfile.mkdtemp(prefix="mimic3_train_tpu_"))
STEPS = 20
BATCH = 16


def write_wav(path: Path, samples: np.ndarray) -> None:
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(22050)
        f.writeframes(
            (np.clip(samples, -1, 1) * 20000).astype(np.int16).tobytes()
        )


def main() -> int:
    from mimic3_tpu.config import TrainingConfig
    from mimic3_tpu.runtime.session import enable_compilation_cache
    from mimic3_tpu.runtime.testvoice import create_test_voice

    enable_compilation_cache()
    import jax

    print("devices:", jax.devices(), flush=True)

    voice_dir = create_test_voice(ROOT / "voice", full_size=True)
    cfg = TrainingConfig.load_path(voice_dir / "config.json")
    cfg.batch_size = BATCH
    with open(voice_dir / "config.json", "w") as f:
        cfg.save(f)

    audio_dir = ROOT / "wavs"
    audio_dir.mkdir()
    rng = np.random.RandomState(0)
    rows = []
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "pack my box with five dozen liquor jugs",
        "how vexingly quick daft zebras jump",
        "sphinx of black quartz judge my vow",
    ] * 8
    for i, text in enumerate(texts):
        n = 22050 + (i % 7) * 2000  # ~1-1.6 s
        write_wav(audio_dir / f"utt{i}.wav", rng.randn(n) * 0.05)
        rows.append(f"utt{i}|{text}")
    (ROOT / "metadata.csv").write_text("\n".join(rows) + "\n")

    from mimic3_tpu.train_cli import main as train_main

    t0 = time.perf_counter()
    rc = train_main(
        [
            str(voice_dir),
            "--metadata", str(ROOT / "metadata.csv"),
            "--audio-dir", str(audio_dir),
            "--batch-size", str(BATCH),
            "--steps", str(STEPS),
            "--checkpoint-every", "100000",
            "--log-every", "5",
        ]
    )
    elapsed = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "rc": rc,
                "steps": STEPS,
                "batch": BATCH,
                "wall_s_incl_compile": round(elapsed, 1),
            }
        ),
        flush=True,
    )
    shutil.rmtree(ROOT, ignore_errors=True)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
