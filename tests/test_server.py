"""HTTP server tests: spawn the real server, hit it with urllib."""

import io
import json
import subprocess
import sys
import time
import urllib.error
import urllib.parse
import urllib.request
import wave
from pathlib import Path

import pytest

from mimic3_tpu.runtime.testvoice import create_test_voice

REPO = Path(__file__).parent.parent
PORT = 59333
BASE = f"http://127.0.0.1:{PORT}"


CACHE_DIR = {}


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = tmp_path_factory.mktemp("srv_voices")
    create_test_voice(root / "en_US" / "test_low", full_size=False)
    CACHE_DIR["path"] = tmp_path_factory.mktemp("wav_cache")
    proc = subprocess.Popen(
        [
            sys.executable,
            "-m",
            "mimic3_tpu.server",
            "--port",
            str(PORT),
            "--host",
            "127.0.0.1",
            "--voices-dir",
            str(root),
            "--voice",
            "en_US/test_low",
            "--no-download",
            "--deterministic",
            "--preload-voice",
            "en_US/test_low",
            "--cache-dir",
            str(CACHE_DIR["path"]),
        ],
        cwd=REPO,
        env={
            "PATH": "/usr/bin:/bin",
            "JAX_PLATFORMS": "cpu",
            "HOME": "/tmp",
        },
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
    )
    # wait for readiness
    deadline = time.time() + 120
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                f"{BASE}/api/healthcheck", timeout=2
            ) as r:
                if r.status == 200:
                    break
        except Exception:
            if proc.poll() is not None:
                raise RuntimeError(
                    proc.stderr.read().decode()[-3000:]
                )
            time.sleep(0.5)
    else:
        proc.kill()
        raise RuntimeError("server did not become ready")
    yield proc
    proc.terminate()
    try:
        # graceful SIGTERM cleanup (scheduler join, cache removal) can
        # exceed 10 s when the 1-CPU box is loaded; escalate to SIGKILL
        # rather than failing teardown
        proc.wait(timeout=30)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait(timeout=10)


def get(path, timeout=120):
    with urllib.request.urlopen(f"{BASE}{path}", timeout=timeout) as r:
        return r.status, r.read(), dict(r.headers)


def post(path, data, content_type="text/plain", timeout=120):
    req = urllib.request.Request(
        f"{BASE}{path}",
        data=data.encode(),
        headers={"Content-Type": content_type},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, r.read(), dict(r.headers)


def test_healthcheck(server):
    status, body, _ = get("/api/healthcheck")
    assert status == 200
    assert body == b"OK"


def test_tts_post(server):
    status, body, headers = post(
        "/api/tts?voice=en_US/test_low", "hello world"
    )
    assert status == 200
    assert headers["Content-Type"] == "audio/wav"
    with wave.open(io.BytesIO(body)) as w:
        assert w.getframerate() == 22050
        assert w.getnframes() > 0


def test_tts_get(server):
    query = urllib.parse.urlencode(
        {"text": "hi there", "voice": "en_US/test_low",
         "lengthScale": "0.8"}
    )
    status, body, _ = get(f"/api/tts?{query}")
    assert status == 200
    with wave.open(io.BytesIO(body)) as w:
        assert w.getnframes() > 0


def test_tts_ssml(server):
    ssml = '<speak><s>one</s><break time="100ms"/><s>two</s></speak>'
    status, body, _ = post(
        "/api/tts?voice=en_US/test_low",
        ssml,
        content_type="application/ssml+xml",
    )
    assert status == 200
    with wave.open(io.BytesIO(body)) as w:
        assert w.getnframes() > 0


def test_tts_missing_text(server):
    try:
        get("/api/tts")
        status = 200
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 400


def test_tts_cache(server):
    query = urllib.parse.urlencode(
        {"text": "cache me", "voice": "en_US/test_low",
         "cacheId": "fixed-key"}
    )
    _, body1, _ = get(f"/api/tts?{query}")
    _, body2, _ = get(f"/api/tts?{query}")
    assert body1 == body2


def test_api_voices(server):
    status, body, headers = get("/api/voices")
    assert status == 200
    voices = json.loads(body)
    keys = {v["key"] for v in voices}
    assert "en_US/test_low" in keys
    local = next(v for v in voices if v["key"] == "en_US/test_low")
    assert local["language_english"] == "English (US)"
    assert "sample_text" in local


def test_marytts_process(server):
    status, body, _ = get(
        "/process?INPUT_TEXT=hello&VOICE=en_US/test_low"
    )
    assert status == 200
    with wave.open(io.BytesIO(body)) as w:
        assert w.getnframes() > 0


def test_marytts_voices(server):
    status, body, _ = get("/voices")
    assert status == 200
    assert b"en_US/test_low" in body
    assert b"vits" in body


def test_index_and_openapi(server):
    status, body, _ = get("/")
    assert status == 200 and b"mimic3-tpu" in body
    status, body, _ = get("/openapi.json")
    assert status == 200
    spec = json.loads(body)
    assert "/api/tts" in spec["paths"]
    status, body, _ = get("/openapi")
    assert status == 200


def test_stats(server):
    status, body, _ = get("/api/stats")
    assert status == 200
    stats = json.loads(body)
    assert stats["scheduler"]["batches"] >= 1


def test_profile_capture(server):
    """POST /api/profile records a jax.profiler trace directory."""
    status, body, _ = post("/api/profile?seconds=0.2", "")
    assert status == 200, body
    payload = json.loads(body)
    assert payload["seconds"] == 0.2
    trace_dir = Path(payload["profile_dir"])
    assert trace_dir.is_dir()
    # xprof writes plugins/profile/<run>/...
    assert list(trace_dir.rglob("*")), "trace directory is empty"


def test_tts_streaming(server):
    """streaming=true returns chunked WAV with an unknown-length header."""
    query = urllib.parse.urlencode(
        {"text": "first sentence. second sentence.",
         "voice": "en_US/test_low", "streaming": "true"}
    )
    req = urllib.request.Request(f"{BASE}/api/tts?{query}")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers.get("Transfer-Encoding") == "chunked"
        blob = r.read()
    assert blob[:4] == b"RIFF"
    # payload after the 44-byte header is real PCM
    pcm = blob[44:]
    assert len(pcm) > 1000
    import numpy as np

    arr = np.frombuffer(pcm[: len(pcm) // 2 * 2], np.int16)
    assert np.abs(arr.astype(np.int32)).max() > 0


def test_cache_id_traversal_blocked(server):
    """A cacheId with path components must not escape the cache dir."""
    query = urllib.parse.urlencode(
        {"text": "traversal probe", "voice": "en_US/test_low",
         "cacheId": "../../escape"}
    )
    status, body, _ = get(f"/api/tts?{query}")
    assert status == 200
    cache_dir = CACHE_DIR["path"]
    assert not (cache_dir.parent / "escape.wav").exists()
    assert not (cache_dir.parent.parent / "escape.wav").exists()
    # the sanitized entry lives INSIDE the cache dir
    inside = list(cache_dir.glob("*escape*.wav"))
    assert inside, list(cache_dir.iterdir())


def test_oversized_body_413(server):
    import socket

    with socket.create_connection(("127.0.0.1", PORT), timeout=10) as s:
        s.sendall(
            b"POST /api/tts HTTP/1.1\r\n"
            b"Host: x\r\n"
            b"Content-Length: 999999999\r\n"
            b"\r\n"
            b"partial body"
        )
        response = s.recv(4096).decode()
    assert "413" in response.splitlines()[0]


def test_tts_streaming_low_latency(server):
    """streamingMode=low-latency streams sub-sentence decode chunks."""
    query = urllib.parse.urlencode(
        {"text": "a rather long sentence with quite a few words in it",
         "voice": "en_US/test_low", "streaming": "true",
         "streamingMode": "low-latency"}
    )
    req = urllib.request.Request(f"{BASE}/api/tts?{query}")
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers.get("Transfer-Encoding") == "chunked"
        blob = r.read()
    assert blob[:4] == b"RIFF"
    import numpy as np

    pcm = np.frombuffer(blob[44:][: (len(blob) - 44) // 2 * 2], np.int16)
    assert len(pcm) > 1000
    assert np.abs(pcm.astype(np.int32)).max() > 0
    # fixed gain: never clips to full scale
    assert np.abs(pcm.astype(np.int32)).max() <= 32767


def test_404(server):
    try:
        get("/nope")
        status = 200
    except urllib.error.HTTPError as e:
        status = e.code
    assert status == 404


def test_cli_remote_mode(server):
    """The mimic3 CLI's --remote client drives the server end to end."""
    result = subprocess.run(
        [
            sys.executable, "-m", "mimic3_tpu.cli",
            "--remote", BASE,
            "--voice", "en_US/test_low",
            "--stdout",
            "remote client check",
        ],
        capture_output=True,
        timeout=120,
        cwd=REPO,
        env={"PATH": "/usr/bin:/bin", "HOME": "/tmp"},
    )
    assert result.returncode == 0, result.stderr.decode()[-2000:]
    with wave.open(io.BytesIO(result.stdout)) as w:
        assert w.getnframes() > 0


def test_cli_remote_voices(server):
    result = subprocess.run(
        [
            sys.executable, "-m", "mimic3_tpu.cli",
            "--remote", BASE, "--voices",
        ],
        capture_output=True,
        timeout=60,
        cwd=REPO,
        env={"PATH": "/usr/bin:/bin", "HOME": "/tmp"},
    )
    assert result.returncode == 0, result.stderr.decode()[-2000:]
    assert "en_US/test_low" in result.stdout.decode()


def test_concurrent_requests_batch(server):
    """Concurrent requests must all succeed (and share device batches)."""
    import concurrent.futures

    def one(i):
        q = urllib.parse.urlencode(
            {"text": f"request number {i}", "voice": "en_US/test_low",
             "noCache": "true"}
        )
        status, body, _ = get(f"/api/tts?{q}")
        assert status == 200
        with wave.open(io.BytesIO(body)) as w:
            return w.getnframes()

    with concurrent.futures.ThreadPoolExecutor(max_workers=6) as pool:
        frames = list(pool.map(one, range(6)))
    assert all(f > 0 for f in frames)

    _, body, _ = get("/api/stats")
    stats = json.loads(body)
    assert stats["scheduler"]["items"] >= 6


def test_no_speaker_leak_between_requests(tmp_path):
    """A request without '#speaker' must not inherit the previous
    request's speaker on a reused worker-thread engine."""
    import types

    from mimic3_tpu.runtime.testvoice import create_test_voice
    from mimic3_tpu.server.app import TtsApp, TtsParams

    create_test_voice(
        tmp_path / "en_US" / "multi_low", full_size=False,
        n_speakers=4, seed=11,
    )
    cfg = types.SimpleNamespace(
        voice=None, speaker=None, default_voice=None, show_openapi=True,
        voices_dir=[str(tmp_path)], preload_voice=[], length_scale=None,
        noise_scale=0.0, noise_w=0.0, cache_dir=None,
        cache_dir_is_temp=False, max_text_length=None, deterministic=True,
        no_download=True, play_program="aplay", num_workers=1,
        max_batch=4, batch_delay_ms=1.0, warmup=False, profile_dir=None,
    )
    app = TtsApp(cfg)
    try:
        def synth(voice):
            return app._synthesize_blocking(
                TtsParams(text="hello there", voice=voice)
            )

        default_first = synth("en_US/multi_low")  # before any #speaker
        spk2 = synth("en_US/multi_low#2")
        default_again = synth("en_US/multi_low")  # same thread, no '#'
        assert spk2 != default_first  # speakers actually differ
        assert default_again == default_first  # no leak from #2
    finally:
        app.shutdown()


def test_scheduler_stress_concurrent_settings_and_shutdown(tmp_path):
    """Torture the BatchScheduler: many threads, mixed scale settings
    (different batch keys), every future must resolve; shutdown with
    work in flight must reject new submissions cleanly."""
    import random
    import threading

    from mimic3_tpu.config import TrainingConfig
    from mimic3_tpu.models.vits import init_vits_params
    from mimic3_tpu.runtime.session import VitsSession
    from mimic3_tpu.runtime.testvoice import create_test_voice
    from mimic3_tpu.server.scheduler import BatchScheduler

    voice_dir = create_test_voice(
        tmp_path / "v", full_size=False, seed=33
    )
    config = TrainingConfig.load_path(voice_dir / "config.json")
    import jax

    params = init_vits_params(jax.random.PRNGKey(0), config.model)
    session = VitsSession(config, params, deterministic=True)
    sched = BatchScheduler(max_batch=4, max_delay_ms=2.0)
    session.batcher = sched

    rng = random.Random(7)
    errors = []
    results = []
    lock = threading.Lock()

    def worker(i):
        try:
            ids = [1 + (i + j) % 20 for j in range(3 + i % 5)]
            audio = session.synthesize_ids(
                ids,
                length_scale=rng.choice([1.0, 1.0, 1.0, 1.3]),
                noise_scale=0.0,
                noise_w=0.0,
            )
            with lock:
                results.append(len(audio))
        except Exception as err:  # noqa: BLE001
            with lock:
                errors.append(err)

    threads = [
        threading.Thread(target=worker, args=(i,)) for i in range(24)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors[:3]
    assert len(results) == 24
    assert all(n > 0 for n in results)
    stats = sched.stats
    assert stats.items == 24

    sched.shutdown()
    with pytest.raises(RuntimeError):
        sched.submit(session, [1, 2, 3])


def test_keepalive_and_head(server):
    """Connection-level HTTP semantics: two requests over one
    keep-alive connection, and HEAD returning headers without a body."""
    import socket

    with socket.create_connection(("127.0.0.1", PORT), timeout=30) as s:
        s.sendall(
            b"GET /api/healthcheck HTTP/1.1\r\nHost: t\r\n\r\n"
        )
        first = b""
        while b"OK" not in first:
            chunk = s.recv(4096)
            assert chunk, "connection closed before first response"
            first += chunk
        assert first.startswith(b"HTTP/1.1 200")
        # second request on the SAME connection
        s.sendall(
            b"GET /api/voices HTTP/1.1\r\nHost: t\r\n\r\n"
        )
        second = b""
        while b"test_low" not in second:
            chunk = s.recv(65536)
            assert chunk, "keep-alive connection was closed"
            second += chunk
        assert b"HTTP/1.1 200" in second

    with socket.create_connection(("127.0.0.1", PORT), timeout=30) as s:
        s.sendall(
            b"HEAD /api/healthcheck HTTP/1.1\r\nHost: t\r\n"
            b"Connection: close\r\n\r\n"
        )
        data = b""
        while True:
            chunk = s.recv(4096)
            if not chunk:
                break
            data += chunk
        head, _, body = data.partition(b"\r\n\r\n")
        assert head.startswith(b"HTTP/1.1 200")
        assert body == b"", body  # HEAD: no body
