"""Kill-safety: SIGTERM must never abort an in-flight XLA compile.

Round-3 incident (docs/STATUS.md): a load test SIGTERMed the server
mid-warmup-compile-storm, which wedged the TPU relay for the rest of
the round.  These tests pin the defenses: a device-call tracker that
every jit dispatch registers in, warmup grids that cancel at executable
boundaries, and a SIGTERM handler that defers exit until in-flight
device calls drain.
"""

import os
import signal
import subprocess
import sys
import threading
import time
from pathlib import Path

from mimic3_tpu.runtime import session as rt_session

REPO = Path(__file__).parent.parent


def test_device_call_tracking_and_idle_wait():
    assert rt_session.device_calls_in_flight() == 0
    release = threading.Event()
    entered = threading.Event()

    def hold():
        with rt_session._device_call():
            entered.set()
            release.wait(timeout=30)

    t = threading.Thread(target=hold)
    t.start()
    assert entered.wait(timeout=10)
    assert rt_session.device_calls_in_flight() == 1
    # a bounded wait while busy times out without raising
    assert rt_session.wait_device_idle(timeout=0.05) is False
    release.set()
    assert rt_session.wait_device_idle(timeout=10) is True
    t.join(timeout=10)
    assert rt_session.device_calls_in_flight() == 0


def test_jit_dispatches_are_tracked(tmp_path):
    """The session's jit entry points register in the tracker (the
    counter rises during a call and settles back to zero)."""
    from mimic3_tpu.runtime.testvoice import create_test_voice
    from mimic3_tpu.runtime.voice import TpuVoice

    d = tmp_path / "en_US" / "test_low"
    create_test_voice(d, full_size=False)
    voice = TpuVoice.load_from_directory(d)
    seen = []
    orig_enter = rt_session._device_call.__enter__

    def spy(self):
        seen.append(1)
        return orig_enter(self)

    rt_session._device_call.__enter__ = spy
    try:
        ids = voice.phonemes_to_ids([list(w) for w in "a b".split()])
        voice.session.synthesize_ids(ids, noise_scale=0.0, noise_w=0.0)
    finally:
        rt_session._device_call.__enter__ = orig_enter
    assert seen, "no jit dispatch registered in the device-call tracker"
    assert rt_session.device_calls_in_flight() == 0


def test_warmup_cancels_between_executables(tmp_path):
    """With a graceful shutdown requested, warmup() compiles nothing
    and returns immediately (the SIGTERM-during-warmup safe path)."""
    from mimic3_tpu.runtime.testvoice import create_test_voice
    from mimic3_tpu.runtime.voice import TpuVoice

    d = tmp_path / "en_US" / "test_low"
    create_test_voice(d, full_size=False)
    voice = TpuVoice.load_from_directory(d)
    session = voice.session
    before = session.jit_executable_count()
    rt_session.request_graceful_shutdown()
    try:
        session.warmup(chunk_windows=(64,), parallel=2)
    finally:
        rt_session.reset_graceful_shutdown()
    assert session.jit_executable_count() == before


_CHILD = r"""
import sys, time
from mimic3_tpu.runtime.session import (
    _device_call, install_kill_safe_sigterm,
)

install_kill_safe_sigterm()
guard = _device_call().__enter__()
print("INFLIGHT", flush=True)
# simulated in-flight XLA compile; SIGTERM arrives during this window
time.sleep(float(sys.argv[1]))
try:
    guard.__exit__(None, None, None)
    # the deferred KeyboardInterrupt can land any time from here on
    time.sleep(30)
except KeyboardInterrupt:
    print("CLEAN_EXIT", flush=True)
    sys.exit(0)
print("NO_INTERRUPT", flush=True)
sys.exit(3)
"""


def _spawn_child(hold_sec: float) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-c", _CHILD, str(hold_sec)],
        cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        text=True,
    )


def _wait_line(proc: subprocess.Popen, want: str, timeout: float) -> None:
    deadline = time.time() + timeout
    while time.time() < deadline:
        line = proc.stdout.readline()
        if want in line:
            return
        if not line and proc.poll() is not None:
            break
        time.sleep(0.01)
    raise AssertionError(
        f"never saw {want!r}; stderr: {proc.stderr.read()}"
    )


def test_sigterm_during_device_call_is_deferred():
    proc = _spawn_child(hold_sec=4.0)
    try:
        _wait_line(proc, "INFLIGHT", timeout=30)
        proc.send_signal(signal.SIGTERM)
        time.sleep(1.5)
        # still alive: the simulated compile is in flight
        assert proc.poll() is None, "SIGTERM killed a mid-compile process"
        out, err = proc.communicate(timeout=30)
        # rc 0 + CLEAN_EXIT: the simulated compile finished, THEN the
        # deferred interrupt unwound the process
        assert proc.returncode == 0, (out, err)
        assert "CLEAN_EXIT" in out
    finally:
        if proc.poll() is None:
            proc.kill()


def test_second_sigterm_forces_exit():
    proc = _spawn_child(hold_sec=60.0)
    try:
        _wait_line(proc, "INFLIGHT", timeout=30)
        proc.send_signal(signal.SIGTERM)  # deferred
        time.sleep(1.0)
        assert proc.poll() is None
        proc.send_signal(signal.SIGTERM)  # escape hatch: force exit
        proc.communicate(timeout=30)
        assert proc.returncode != 0  # unwound before the hold ended
    finally:
        if proc.poll() is None:
            proc.kill()
