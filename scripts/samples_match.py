#!/usr/bin/env python3
"""Fuzzy WAV comparison for golden-sample regression tests.

Compares two WAVs frame by frame; passes when no more than
``--percent-threshold`` percent of samples differ (the reference's
cross-machine tolerance is 0.1%, reference: tests/samples_match.py:28-62).
Also reports waveform correlation — the fidelity metric used against the
ONNX reference (BASELINE.md: >= 0.999).

Exit code 0 = match, 1 = differ.
"""

import argparse
import sys
import wave

import numpy as np


def load_wav(path: str):
    with wave.open(path, "rb") as w:
        data = np.frombuffer(
            w.readframes(w.getnframes()), dtype=np.int16
        )
        return data, w.getframerate(), w.getsampwidth(), w.getnchannels()


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("wav1")
    parser.add_argument("wav2")
    parser.add_argument(
        "--percent-threshold",
        type=float,
        default=0.1,
        help="Percent of samples allowed to differ (default: 0.1)",
    )
    parser.add_argument(
        "--min-correlation",
        type=float,
        default=None,
        help="Also require at least this waveform correlation",
    )
    args = parser.parse_args()

    a, rate_a, width_a, ch_a = load_wav(args.wav1)
    b, rate_b, width_b, ch_b = load_wav(args.wav2)

    if (rate_a, width_a, ch_a) != (rate_b, width_b, ch_b):
        print(
            f"Format mismatch: {rate_a}/{width_a}/{ch_a} vs "
            f"{rate_b}/{width_b}/{ch_b}",
            file=sys.stderr,
        )
        return 1

    smaller = min(len(a), len(b))
    if smaller == 0:
        print("Empty WAV", file=sys.stderr)
        return 1

    different = abs(len(a) - len(b)) + int(
        np.count_nonzero(a[:smaller] != b[:smaller])
    )
    percent = 100.0 * different / smaller
    corr = float(
        np.corrcoef(
            a[:smaller].astype(np.float64), b[:smaller].astype(np.float64)
        )[0, 1]
    )
    print(f"different={percent:.4f}% correlation={corr:.6f}")

    if percent > args.percent_threshold:
        return 1
    if args.min_correlation is not None and corr < args.min_correlation:
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
