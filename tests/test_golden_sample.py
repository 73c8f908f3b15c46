"""Checked-in golden-sample regression (the reference's test strategy:
deterministic synthesis compared against a committed WAV,
reference: tests/apope_sample_amd64.wav + samples_match.py).

The voice is fully reproducible from its seed, so no weights are
committed — only the 22 KB golden WAV.  Comparison is fuzzy (<=0.1%
differing samples, correlation >= 0.999) to absorb cross-machine float
variation, exactly like the reference's cross-arch bound.
"""

import io
import wave
from pathlib import Path

import numpy as np
import pytest

from mimic3_tpu.engine import Mimic3Settings, Mimic3TextToSpeechSystem
from mimic3_tpu.runtime.testvoice import create_test_voice

GOLDEN = Path(__file__).parent / "data" / "golden_test_low.wav"
SENTENCE = "a rainbow is a meteorological phenomenon"


@pytest.mark.skipif(not GOLDEN.is_file(), reason="no golden WAV")
def test_golden_sample_regression(tmp_path):
    create_test_voice(
        tmp_path / "en_US" / "golden_low", full_size=False, seed=1234
    )
    tts = Mimic3TextToSpeechSystem(
        Mimic3Settings(
            voice="en_US/golden_low",
            voices_directories=[tmp_path],
            no_download=True,
            noise_scale=0.0,
            noise_w=0.0,
            use_deterministic_compute=True,
        )
    )
    wav_bytes = tts.text_to_wav(SENTENCE)

    with wave.open(io.BytesIO(wav_bytes)) as w:
        got = np.frombuffer(
            w.readframes(w.getnframes()), np.int16
        )
    with wave.open(str(GOLDEN)) as w:
        ref = np.frombuffer(w.readframes(w.getnframes()), np.int16)

    n = min(len(got), len(ref))
    assert n > 0
    differing = abs(len(got) - len(ref)) + int(
        np.count_nonzero(got[:n] != ref[:n])
    )
    percent = 100.0 * differing / n
    corr = float(
        np.corrcoef(
            got[:n].astype(np.float64), ref[:n].astype(np.float64)
        )[0, 1]
    )
    assert percent <= 0.1, f"{percent:.3f}% samples differ"
    assert corr >= 0.999, f"correlation {corr:.6f}"


def test_samples_match_script(tmp_path):
    """The conformance comparator itself: exit 0 on matching WAVs,
    1 on diverging ones (it gates releases — it must not lie)."""
    import subprocess
    import sys

    import numpy as np

    def write(path, samples):
        with wave.open(str(path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(22050)
            w.writeframes(samples.astype(np.int16).tobytes())

    rng = np.random.RandomState(0)
    base = (rng.randn(22050) * 8000).astype(np.int16)
    write(tmp_path / "a.wav", base)
    # identical + tiny jitter on <0.1% of samples: must PASS
    close = base.copy()
    close[::2000] += 1
    write(tmp_path / "b.wav", close)
    # uncorrelated noise: must FAIL
    write(
        tmp_path / "c.wav", (rng.randn(22050) * 8000).astype(np.int16)
    )

    script = Path(__file__).parent.parent / "scripts" / "samples_match.py"

    def run(x, y):
        return subprocess.run(
            [sys.executable, str(script), str(x), str(y)],
            capture_output=True,
        ).returncode

    assert run(tmp_path / "a.wav", tmp_path / "a.wav") == 0
    assert run(tmp_path / "a.wav", tmp_path / "b.wav") == 0
    assert run(tmp_path / "a.wav", tmp_path / "c.wav") == 1
