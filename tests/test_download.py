"""Downloader logic tests (no network: local file:// URLs + registry)."""

import hashlib

import pytest

from mimic3_tpu.download import (
    VoiceDownloadError,
    VoiceFile,
    download_voice,
    is_later_version,
    is_voice_downloaded,
)
from mimic3_tpu.voices_registry import (
    get_voices_registry,
    DEFAULT_VOICES_URL_FORMAT,
)


def test_is_later_version():
    assert is_later_version("2.0", "1.9")
    assert is_later_version("1.10", "1.9")
    assert not is_later_version("1.0", "1.0")
    assert not is_later_version("1.0", "1.0.1")
    assert is_later_version("1.0.1", "1.0")


def test_registry_contents():
    registry = get_voices_registry()
    assert len(registry) == 40
    apope = registry["en_UK/apope_low"]
    assert "generator.onnx" in apope["files"]
    assert apope["files"]["generator.onnx"]["sha256_sum"]
    assert "{lang}" in DEFAULT_VOICES_URL_FORMAT
    vctk = registry["en_US/vctk_low"]
    assert len(vctk["speakers"]) > 100


def test_download_from_local_url(tmp_path):
    # serve "remote" files via file:// URLs
    src = tmp_path / "remote"
    src.mkdir()
    payload = b"fake model data"
    (src / "generator.onnx").write_bytes(payload)
    (src / "config.json").write_bytes(b"{}")
    sha = hashlib.sha256(payload).hexdigest()

    dest = tmp_path / "voices"
    voice_dir = download_voice(
        "xx_XX/fake_low",
        f"file://{src}",
        [
            VoiceFile("generator.onnx", len(payload), sha),
            VoiceFile("config.json"),
        ],
        voice_version="1.0",
        voices_dir=dest,
        progress=False,
    )
    assert (voice_dir / "generator.onnx").read_bytes() == payload

    # second download skips (sha match): corrupt the source to prove it
    (src / "generator.onnx").write_bytes(b"changed upstream")
    download_voice(
        "xx_XX/fake_low",
        f"file://{src}",
        [VoiceFile("generator.onnx", len(payload), sha)],
        voice_version="1.0",
        voices_dir=dest,
        progress=False,
    )
    assert (voice_dir / "generator.onnx").read_bytes() == payload


def test_download_sha_mismatch(tmp_path):
    src = tmp_path / "remote"
    src.mkdir()
    (src / "generator.onnx").write_bytes(b"evil bytes")
    with pytest.raises(VoiceDownloadError):
        download_voice(
            "xx_XX/fake_low",
            f"file://{src}",
            [VoiceFile("generator.onnx", 10, "0" * 64)],
            voice_version="1.0",
            voices_dir=tmp_path / "voices",
            progress=False,
        )
    # failed file must not be left behind
    assert not (
        tmp_path / "voices" / "xx_XX" / "fake_low" / "generator.onnx"
    ).exists()


def test_is_voice_downloaded_false_for_missing(tmp_path):
    assert not is_voice_downloaded("en_UK/apope_low", tmp_path)
    assert not is_voice_downloaded("not/a_voice", tmp_path)


def test_is_voice_downloaded_size_only_mode(tmp_path):
    """verify_hashes=False checks presence+size (fast listing path);
    the default still verifies sha256."""
    from mimic3_tpu.voices_registry import get_voices_registry

    key = "en_UK/apope_low"
    info = get_voices_registry()[key]
    voice_dir = tmp_path / key
    voice_dir.mkdir(parents=True)
    for rel_path, file_info in info["files"].items():
        path = voice_dir / rel_path
        path.parent.mkdir(parents=True, exist_ok=True)
        # right size, wrong content -> wrong hash
        path.write_bytes(b"x" * int(file_info["size_bytes"]))

    assert is_voice_downloaded(key, tmp_path, verify_hashes=False)
    assert not is_voice_downloaded(key, tmp_path)  # sha256 mismatch

    # wrong size fails even without hashing
    first = next(iter(info["files"]))
    (voice_dir / first).write_bytes(b"short")
    assert not is_voice_downloaded(key, tmp_path, verify_hashes=False)
