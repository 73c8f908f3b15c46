"""Native C++ host-audio library tests (with fallback parity)."""

import io
import wave

import numpy as np
import pytest

from mimic3_tpu.runtime import native
from mimic3_tpu.utils import audio_float_to_int16, scale_int16_volume


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available")
    return lib


def test_peak_normalize_matches_numpy(lib):
    rng = np.random.RandomState(0)
    audio = (rng.randn(10000) * 0.3).astype(np.float32)
    fast = native.peak_normalize_i16(audio)
    # independent numpy computation
    peak = max(0.01, float(np.abs(audio).max()))
    ref = np.clip(audio * (32767.0 / peak), -32767, 32767).astype(
        np.int16
    )
    np.testing.assert_array_equal(fast, ref)


def test_peak_normalize_quiet_audio(lib):
    audio = np.full(100, 1e-4, np.float32)  # below the 0.01 floor
    fast = native.peak_normalize_i16(audio)
    ref = (audio * (32767.0 / 0.01)).astype(np.int16)
    np.testing.assert_array_equal(fast, ref)


def test_scale_i16(lib):
    samples = np.array([-32768, -100, 0, 100, 32767], np.int16)
    out = np.frombuffer(
        native.scale_i16(samples.tobytes(), 0.5), np.int16
    )
    np.testing.assert_array_equal(out, [-16384, -50, 0, 50, 16383])


def test_wav_header(lib):
    data = bytes(22050 * 2)  # 1 second of silence
    header = native.wav_header(len(data))
    blob = header + data
    with wave.open(io.BytesIO(blob)) as w:
        assert w.getframerate() == 22050
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        assert w.getnframes() == 22050


def test_utils_use_native_transparently(lib):
    rng = np.random.RandomState(1)
    audio = (rng.randn(5000) * 0.5).astype(np.float32)
    out = audio_float_to_int16(audio)
    assert out.dtype == np.int16
    assert np.abs(out.astype(np.int32)).max() == 32767  # peak-normalized

    scaled = scale_int16_volume(out.tobytes(), 50.0)
    arr = np.frombuffer(scaled, np.int16)
    assert np.abs(arr.astype(np.int32)).max() <= 16384
