"""CLI tests: subprocess-level, like a real user."""

import io
import json
import subprocess
import sys
import wave
from pathlib import Path

import pytest

from mimic3_tpu.runtime.testvoice import create_test_voice

REPO = Path(__file__).parent.parent


@pytest.fixture(scope="module")
def voices_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_voices")
    create_test_voice(root / "en_US" / "test_low", full_size=False)
    return root


def run_cli(*args, input_text=None, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "mimic3_tpu.cli", *args],
        input=input_text.encode() if input_text else None,
        capture_output=True,
        timeout=timeout,
        cwd=REPO,
        env={
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "JAX_PLATFORMS": "cpu",
            "HOME": "/tmp",
        },
    )


def test_version():
    result = run_cli("--version")
    assert result.returncode == 0
    assert result.stdout.decode().strip()


def test_voices_list(voices_root):
    result = run_cli(
        "--voices", "--voices-dir", str(voices_root), "--no-download"
    )
    assert result.returncode == 0
    out = result.stdout.decode()
    assert "en_US/test_low" in out
    assert "en_UK/apope_low" in out  # registry entry


def test_synthesize_to_stdout(voices_root):
    result = run_cli(
        "--voice",
        "en_US/test_low",
        "--voices-dir",
        str(voices_root),
        "--no-download",
        "--deterministic",
        "--stdout",
        "hello world",
    )
    assert result.returncode == 0, result.stderr.decode()[-2000:]
    with wave.open(io.BytesIO(result.stdout)) as w:
        assert w.getframerate() == 22050
        assert w.getnframes() > 0


def test_output_dir_and_csv(voices_root, tmp_path):
    out_dir = tmp_path / "wavs"
    result = run_cli(
        "--voice",
        "en_US/test_low",
        "--voices-dir",
        str(voices_root),
        "--no-download",
        "--deterministic",
        "--csv",
        "--output-dir",
        str(out_dir),
        input_text="utt1|hello\nutt2|goodbye\n",
    )
    assert result.returncode == 0, result.stderr.decode()[-2000:]
    assert (out_dir / "utt1.wav").is_file()
    assert (out_dir / "utt2.wav").is_file()


def test_ssml_with_marks(voices_root, tmp_path):
    mark_file = tmp_path / "marks.txt"
    ssml = (
        "<speak><s>one</s>"
        '<mark name="halfway"/>'
        "<s>two</s></speak>"
    )
    result = run_cli(
        "--voice",
        "en_US/test_low",
        "--voices-dir",
        str(voices_root),
        "--no-download",
        "--deterministic",
        "--ssml",
        "--stdout",
        "--mark-file",
        str(mark_file),
        input_text=ssml,
    )
    assert result.returncode == 0, result.stderr.decode()[-2000:]
    assert mark_file.read_text().strip() == "halfway"
    with wave.open(io.BytesIO(result.stdout)) as w:
        assert w.getnframes() > 0


def test_deterministic_flag_repeatable(voices_root):
    def synth():
        return run_cli(
            "--voice",
            "en_US/test_low",
            "--voices-dir",
            str(voices_root),
            "--no-download",
            "--deterministic",
            "--stdout",
            "repeatable audio",
        ).stdout

    assert synth() == synth()


def test_download_cli_list():
    result = subprocess.run(
        [sys.executable, "-m", "mimic3_tpu.download_cli", "--list"],
        capture_output=True,
        timeout=60,
        cwd=REPO,
        env={"PATH": "/usr/bin:/bin", "HOME": "/tmp"},
    )
    assert result.returncode == 0
    assert "en_UK/apope_low" in result.stdout.decode()


def test_testvoice_cli(tmp_path):
    result = subprocess.run(
        [
            sys.executable,
            "-m",
            "mimic3_tpu.runtime.testvoice",
            str(tmp_path / "v"),
            "--tiny",
        ],
        capture_output=True,
        timeout=120,
        cwd=REPO,
        env={
            "PATH": "/usr/bin:/bin",
            "JAX_PLATFORMS": "cpu",
            "HOME": "/tmp",
        },
    )
    assert result.returncode == 0, result.stderr.decode()[-2000:]
    out = json.loads(result.stdout)
    assert (Path(out["voice_dir"]) / "generator.npz").is_file()


def test_csv_voice_and_blank_line_modes(voices_root, tmp_path):
    """--csv-voice (id|voice|text rows, reference __main__.py:348-423)
    and --process-on-blank-line (book-style paragraphs)."""
    out_dir = tmp_path / "csvv"
    result = run_cli(
        "--voices-dir",
        str(voices_root),
        "--no-download",
        "--deterministic",
        "--csv-voice",
        "--output-dir",
        str(out_dir),
        input_text=(
            "a1|en_US/test_low|hello there\n"
            "a2|en_US/test_low#0|second row\n"
        ),
    )
    assert result.returncode == 0, result.stderr.decode()[-2000:]
    assert (out_dir / "a1.wav").is_file()
    assert (out_dir / "a2.wav").is_file()

    # paragraphs: two blank-line-separated blocks -> two outputs
    out_dir2 = tmp_path / "para"
    result = run_cli(
        "--voice",
        "en_US/test_low",
        "--voices-dir",
        str(voices_root),
        "--no-download",
        "--deterministic",
        "--process-on-blank-line",
        "--output-dir",
        str(out_dir2),
        "--output-naming",
        "time",
        input_text="first paragraph line one.\nline two.\n\n"
        "second paragraph.\n",
    )
    assert result.returncode == 0, result.stderr.decode()[-2000:]
    wavs = list(out_dir2.glob("*.wav"))
    assert len(wavs) == 2, [w.name for w in wavs]
