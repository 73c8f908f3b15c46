"""Train->export->serve round-trip harness tests.

The full round trip (scripts/train_roundtrip.py) is a TPU-scale job —
3000 GAN steps take ~22 min on one v5e chip and the 1-core host CPU
cannot even compile the train step in an hour — so the suite covers the
harness pieces hermetically and gates the full run behind an env flag
(results of the real run are recorded in docs/TRAINING.md).
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

SCRIPTS = Path(__file__).resolve().parent.parent / "scripts"
sys.path.insert(0, str(SCRIPTS))

from train_roundtrip import (  # noqa: E402
    _texts,
    mel_correlation,
    tone_teacher,
    tone_teacher_wav_bytes,
)


def test_tone_teacher_deterministic():
    a = tone_teacher("hello world")
    b = tone_teacher("hello world")
    assert np.array_equal(a, b)
    assert a.dtype == np.float32
    assert float(np.abs(a).max()) < 1.0  # headroom, no clipping


def test_tone_teacher_is_structured():
    """Same text -> same audio; shared words -> partial similarity;
    the mapping is per-character, i.e. learnable + generalizable."""
    self_corr = mel_correlation(
        tone_teacher("hello world"), tone_teacher("hello world")
    )
    cross = mel_correlation(
        tone_teacher("hello world"), tone_teacher("quartz nymph")
    )
    assert self_corr == pytest.approx(1.0)
    # unrelated text correlates strictly less (the gate's baseline)
    assert cross < self_corr - 0.2


def test_tone_teacher_wav_bytes_parse():
    import io
    import wave

    with wave.open(io.BytesIO(tone_teacher_wav_bytes("abc"))) as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 1
        assert w.getnframes() > 0


def test_texts_are_deterministic_and_disjoint():
    texts = _texts(80)
    assert texts == _texts(80)
    train, heldout = texts[:72], texts[72:]
    assert not set(train) & set(heldout)


@pytest.mark.slow
@pytest.mark.skipif(
    not os.environ.get("MIMIC3_RUN_ROUNDTRIP"),
    reason="full round trip is a TPU-scale job; "
    "set MIMIC3_RUN_ROUNDTRIP=1 (see docs/TRAINING.md for recorded "
    "results: heldout corr 0.779 vs 0.707 baseline at 3000 steps)",
)
def test_full_roundtrip():
    proc = subprocess.run(
        [
            sys.executable,
            str(SCRIPTS / "train_roundtrip.py"),
            "--steps", os.environ.get("MIMIC3_ROUNDTRIP_STEPS", "3000"),
            "--threshold", "0.72",  # above the 0.707 cross baseline
        ],
        capture_output=True,
    )
    assert proc.returncode == 0, proc.stdout.decode()[-2000:]
