#!/usr/bin/env python3
"""End-to-end HTTP serving load test on the current JAX device.

Two-phase by default:

- **Phase 0 (profiling)**: a server with NO warmup takes a small
  representative traffic sample, paying inline compiles; its
  /api/stats ``executable_hits`` table is saved as the traffic
  profile (closed over the batch-bucket ladder, since the scheduler's
  realized batch sizes vary run to run).
- **Phase 1 (measurement)**: a fresh server starts with ``--warmup
  --warmup-profile``, compiling ONLY the profiled executables (the
  full grid is ~175 executables; the b=1 f=2048/4096 decodes alone
  take minutes each to compile and no short-text deployment ever
  dispatches them).  Then the SLO phases run: concurrent /api/tts
  batch throughput + first-chunk latency at 1/4/16 streamers, with a
  zero-hot-path-compile assertion.

``--full-warmup`` restores the old single-phase full-grid behavior.

Usage: nohup python -u scripts/serve_load_test.py > /tmp/serve_load.log 2>&1 &
"""

import argparse
import io
import json
import subprocess
import sys
import tempfile
import time
import urllib.parse
import urllib.request
import wave
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

BATCH_LADDER = (1, 2, 4, 8, 16)

PORT = 59333
BASE = f"http://127.0.0.1:{PORT}"
N_REQUESTS = 48
CONCURRENCY = 16
TEXT = "the quick brown fox jumps over the lazy dog near the river."


def wait_healthy(timeout: float) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                f"{BASE}/api/healthcheck", timeout=5
            ) as r:
                if r.status == 200:
                    return
        except Exception:
            time.sleep(2)
    raise TimeoutError("server never became healthy")


def one_request(i: int) -> float:
    q = urllib.parse.urlencode(
        {"text": TEXT, "voice": "en_US/test_low"}
    )
    with urllib.request.urlopen(
        f"{BASE}/api/tts?{q}", timeout=600
    ) as r:
        data = r.read()
    with wave.open(io.BytesIO(data)) as w:
        return w.getnframes() / w.getframerate()


def one_streaming_request(i: int) -> float:
    """First-chunk latency (seconds) of a low-latency streaming call.

    BASELINE.md tracks "p50 first-chunk latency" as a target; the
    reference has no streaming at all (its server renders the full WAV
    per request, mimic3_http/app.py).
    """
    q = urllib.parse.urlencode(
        {
            "text": TEXT,
            "voice": "en_US/test_low",
            "streaming": "true",
            "streamingMode": "low-latency",
        }
    )
    t0 = time.perf_counter()
    with urllib.request.urlopen(
        f"{BASE}/api/tts?{q}", timeout=600
    ) as r:
        first = r.read(1)  # returns on the first streamed byte
        latency = time.perf_counter() - t0
        assert first, "empty streaming response"
        r.read()  # drain
    return latency


def _percentile(values, pct: float) -> float:
    ordered = sorted(values)
    idx = min(len(ordered) - 1, int(pct / 100.0 * len(ordered)))
    return ordered[idx]


def first_chunk_latency_sweep() -> dict:
    """p50/p99 first-chunk latency at 1/4/16 concurrent streamers."""
    out = {}
    for conc in (1, 4, 16):
        n = max(16, conc * 4)
        with ThreadPoolExecutor(max_workers=conc) as pool:
            lats = list(pool.map(one_streaming_request, range(n)))
        out[f"c{conc}"] = {
            "n": n,
            "p50_ms": round(_percentile(lats, 50) * 1000, 1),
            "p99_ms": round(_percentile(lats, 99) * 1000, 1),
        }
        print(f"first-chunk latency @ {conc} clients: {out[f'c{conc}']}",
              flush=True)
    return out


def jit_executables() -> int:
    with urllib.request.urlopen(f"{BASE}/api/stats", timeout=30) as r:
        stats = json.loads(r.read())
    return sum(
        v.get("jit_executables", 0) for v in stats["voices"].values()
    )


def fetch_stats() -> dict:
    with urllib.request.urlopen(f"{BASE}/api/stats", timeout=30) as r:
        return json.loads(r.read())


def expand_profile(hits: dict) -> dict:
    """Close an observed hit table over the batch-bucket ladder.

    The scheduler's realized batch sizes depend on request arrival
    timing, so a short profiling run may observe e.g. b=5-packed
    batches (bucket 8) but never bucket 2 — which a later run WILL
    hit.  Every observed (kind, text, frames) signature is therefore
    expanded to all batch buckets; text/frame buckets stay exactly as
    observed (they are functions of the traffic's content, not of
    arrival timing).
    """
    keys = set()
    for key in hits:
        parts = key.split(":")  # kind : bN : tN [: fN]
        for b in BATCH_LADDER:
            parts[1] = f"b{b}"
            keys.add(":".join(parts))
    return {k: 1 for k in sorted(keys)}


def start_server(voices_root: Path, extra: list, log_name: str):
    server_log = open(voices_root / log_name, "wb")
    print(f"server log: {voices_root}/{log_name}", flush=True)
    return subprocess.Popen(
        [
            sys.executable, "-m", "mimic3_tpu.server",
            "--port", str(PORT),
            "--voices-dir", str(voices_root),
            "--preload-voice", "en_US/test_low",
            "--no-download",
            *extra,
        ],
        stdout=server_log,
        stderr=subprocess.STDOUT,
    )


def profiling_phase(voices_root: Path) -> Path:
    """Phase 0: sample the traffic with no warmup; save the profile."""
    server = start_server(voices_root, [], "server_phase0.log")
    try:
        t0 = time.perf_counter()
        wait_healthy(timeout=1200)
        print(
            f"phase0 server up after {time.perf_counter() - t0:.0f}s "
            "(no warmup)",
            flush=True,
        )
        t0 = time.perf_counter()
        # representative sample of both phase-1 workloads (pays
        # inline compiles; they land in the persistent XLA cache)
        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(one_request, range(8)))
        one_streaming_request(-1)
        with ThreadPoolExecutor(max_workers=4) as pool:
            list(pool.map(one_streaming_request, range(4)))
        hits: dict = {}
        for voice in fetch_stats()["voices"].values():
            for key, count in voice.get(
                "executable_hits", {}
            ).items():
                hits[key] = hits.get(key, 0) + count
        print(
            f"phase0 traffic in {time.perf_counter() - t0:.0f}s; "
            f"{len(hits)} executable signatures observed: "
            f"{sorted(hits)}",
            flush=True,
        )
    finally:
        _graceful_stop(server)
    profile = expand_profile(hits)
    profile_path = voices_root / "traffic_profile.json"
    profile_path.write_text(json.dumps(profile, indent=1))
    print(
        f"profile: {len(profile)} signatures after batch-ladder "
        f"expansion -> {profile_path}",
        flush=True,
    )
    return profile_path


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--full-warmup", action="store_true",
        help="single-phase full-grid warmup (old behavior) instead of "
        "the profiled two-phase run",
    )
    args = parser.parse_args()

    voices_root = Path(tempfile.mkdtemp(prefix="serve_load_"))
    voice_dir = voices_root / "en_US" / "test_low"
    # voice creation is seed-derived weights + a validation synth — pure
    # CPU work; keep it off the TPU so it can't contend with (or block
    # on) the device the server is about to own
    import os

    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    subprocess.run(
        [
            sys.executable, "-m", "mimic3_tpu.runtime.testvoice",
            str(voice_dir),
        ],
        check=True,
        env=env,
    )

    warmup_args = ["--warmup"]
    if not args.full_warmup:
        profile_path = profiling_phase(voices_root)
        warmup_args += ["--warmup-profile", str(profile_path)]

    server = start_server(voices_root, warmup_args, "server.log")
    try:
        # The server binds only AFTER preload+warmup completes
        # (server/__main__.py), so healthy == fully warmed.  On a
        # remote-compile environment a cold cache makes this take the
        # better part of an hour; the server's per-combo warmup INFO
        # logs (see server.log) show progress.
        t_start = time.perf_counter()
        print("waiting for warmup...", flush=True)
        wait_healthy(timeout=5400)
        warmup_wall_s = time.perf_counter() - t_start
        print(f"healthy after {warmup_wall_s:.0f}s", flush=True)
        # settle requests: absorb any executable the warmup grid missed
        one_request(-1)
        one_streaming_request(-1)
        print(
            f"settled after {time.perf_counter() - t_start:.0f}s",
            flush=True,
        )
        # snapshot the jit cache: any growth during the load phases
        # below is a compile on the hot path (SLO: zero)
        executables_before = jit_executables()

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=CONCURRENCY) as pool:
            audio_secs = list(
                pool.map(one_request, range(N_REQUESTS))
            )
        elapsed = time.perf_counter() - t0

        latency = first_chunk_latency_sweep()
        executables_after = jit_executables()

        with urllib.request.urlopen(
            f"{BASE}/api/stats", timeout=30
        ) as r:
            stats = json.loads(r.read())

        hot_path_compiles = executables_after - executables_before
        print(
            json.dumps(
                {
                    "requests": N_REQUESTS,
                    "concurrency": CONCURRENCY,
                    "wall_s": round(elapsed, 2),
                    "audio_sec_total": round(sum(audio_secs), 1),
                    "served_audio_sec_per_sec": round(
                        sum(audio_secs) / elapsed, 1
                    ),
                    "mean_batch_size": stats["scheduler"][
                        "mean_batch_size"
                    ],
                    "batches": stats["scheduler"]["batches"],
                    "first_chunk_latency": latency,
                    "hot_path_compiles": hot_path_compiles,
                    "warmup_wall_s": round(warmup_wall_s, 1),
                    "warmup_mode": (
                        "full-grid" if args.full_warmup
                        else "profiled"
                    ),
                }
            ),
            flush=True,
        )
        if hot_path_compiles:
            dispatched = set()
            for voice in stats["voices"].values():
                dispatched.update(voice.get("executable_hits", {}))
            missed = sorted(
                dispatched - set(expand_profile(dispatched))
            ) if args.full_warmup else sorted(
                dispatched
                - set(
                    json.loads(
                        (voices_root / "traffic_profile.json")
                        .read_text()
                    )
                )
            )
            print(
                f"SLO VIOLATION: {hot_path_compiles} XLA compiles on "
                f"the serving hot path; dispatched-but-unprofiled "
                f"signatures: {missed}",
                flush=True,
            )
            return 1
    finally:
        _graceful_stop(server)
    return 0


def _graceful_stop(server: subprocess.Popen) -> None:
    """Stop the server without ever killing it mid-XLA-compile.

    Round-3 incident: an unconditional ``server.terminate()`` here fired
    while the warmup compile storm was in flight and wedged the TPU
    relay for the rest of the round (docs/STATUS.md).  Now: (1) poll
    /api/stats until no device call is in flight, (2) SIGTERM — which
    the server itself also defers while compiles run, (3) escalate to
    SIGKILL only after a long grace period.
    """
    deadline = time.time() + 1200
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                f"{BASE}/api/stats", timeout=10
            ) as r:
                stats = json.loads(r.read())
            in_flight = stats.get("device", {}).get("calls_in_flight", 0)
            if in_flight == 0:
                break
            print(
                f"drain: {in_flight} device call(s) in flight...",
                flush=True,
            )
        except Exception:
            # server not serving yet (warmup) or already gone; the
            # server-side SIGTERM deferral covers the warmup window
            break
        time.sleep(5)
    server.terminate()
    try:
        server.wait(timeout=120)
        return
    except subprocess.TimeoutExpired:
        pass
    # server is deferring SIGTERM (compile in flight): wait it out
    print("server deferring SIGTERM; waiting for compile drain",
          flush=True)
    try:
        server.wait(timeout=3600)
    except subprocess.TimeoutExpired:
        print("escalating to SIGKILL after 1h grace", flush=True)
        server.kill()
        server.wait(timeout=30)


if __name__ == "__main__":
    raise SystemExit(main())
