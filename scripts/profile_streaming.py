"""Measure streaming time-to-first-audio on the current JAX device.

Creates a full-size synthetic voice, then compares:
- full-utterance latency (``synthesize_ids``),
- time-to-first-chunk of the streaming decode
  (``synthesize_ids_chunked``), which the server's low-latency mode
  uses for its first sub-sentence response.

Prints one JSON line. Run under nohup on the TPU host (remote compiles
can take minutes; never kill mid-compile — the relay wedges).
"""

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--tiny", action="store_true",
        help="Tiny model (CPU smoke test of the harness itself)",
    )
    parser.add_argument(
        "--first-chunk", type=int, default=None,
        help="first_chunk_frames for the chunked path (e.g. 32)",
    )
    args = parser.parse_args()

    from mimic3_tpu.runtime.testvoice import create_test_voice
    from mimic3_tpu.runtime.voice import TpuVoice

    with tempfile.TemporaryDirectory() as td:
        vdir = Path(td) / "en_US" / "bench_low"
        create_test_voice(vdir, full_size=not args.tiny)
        voice = TpuVoice.load_from_directory(vdir)
        session = voice.session

        # ~128 in-vocab ids via the voice's own frontend; length_scale
        # scaled so ~8 frames/phoneme like a trained voice ->
        # ~1000 frames ~ 11.6 s of audio
        words = (
            "the quick brown fox jumps over the lazy dog "
            "while seven wizards mix bright blue potions"
        ).split()
        ids = voice.phonemes_to_ids([list(w) for w in words])
        kw = dict(length_scale=8.0, noise_scale=0.667, noise_w=0.8)
        ckw = dict(kw)
        if args.first_chunk:
            ckw["first_chunk_frames"] = args.first_chunk

        t0 = time.perf_counter()
        full = session.synthesize_ids(ids, seed=0, **kw)
        print(
            f"warmup full: {time.perf_counter() - t0:.1f}s "
            f"({len(full)} samples)",
            file=sys.stderr,
        )
        t0 = time.perf_counter()
        chunks = list(
            session.synthesize_ids_chunked(ids, seed=0, **ckw)
        )
        print(
            f"warmup chunked: {time.perf_counter() - t0:.1f}s "
            f"({len(chunks)} chunks)",
            file=sys.stderr,
        )

        sr = session.config.audio.sample_rate
        n = 10
        full_lat, first_lat, total_lat = [], [], []
        audio_sec = 0.0
        for i in range(n):
            t0 = time.perf_counter()
            full = session.synthesize_ids(ids, seed=i, **kw)
            full_lat.append(time.perf_counter() - t0)
            audio_sec = len(full) / sr

            t0 = time.perf_counter()
            gen = session.synthesize_ids_chunked(ids, seed=i, **ckw)
            first = next(gen)
            first_lat.append(time.perf_counter() - t0)
            for _ in gen:
                pass
            total_lat.append(time.perf_counter() - t0)
            del first

        def p50(xs):
            return sorted(xs)[len(xs) // 2]

        result = {
            "metric": "streaming time-to-first-audio (VITS *_low)",
            "value": round(p50(first_lat) * 1000, 1),
            "unit": "ms",
            "extra": {
                "utterance_audio_sec": round(audio_sec, 2),
                "full_utterance_p50_ms": round(p50(full_lat) * 1000, 1),
                "chunked_total_p50_ms": round(p50(total_lat) * 1000, 1),
                "first_chunk_audio_ms": round(
                    len(chunks[0]) / sr * 1000, 1
                ),
                "speedup_to_first_audio": round(
                    p50(full_lat) / p50(first_lat), 2
                ),
            },
        }
        print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
