"""Tests for the voice config schema (JSON round-trip, overlays)."""

import io
import json

from mimic3_tpu.config import (
    BlankBetween,
    Phonemizer,
    TrainingConfig,
    recursive_update,
)


def test_defaults_match_reference():
    cfg = TrainingConfig()
    assert cfg.audio.sample_rate == 22050
    assert cfg.audio.hop_length == 256
    assert cfg.model.hidden_channels == 192
    assert cfg.model.n_layers == 6
    assert cfg.model.n_heads == 2
    assert cfg.model.filter_channels == 768
    assert cfg.model.upsample_rates == (8, 8, 2, 2)
    assert cfg.inference.noise_scale == 0.667
    assert cfg.inference.noise_w == 0.8
    assert cfg.inference.length_scale == 1.0
    assert cfg.phonemes.pad == "_"
    assert cfg.phonemes.blank == "#"


def test_json_roundtrip():
    cfg = TrainingConfig()
    cfg.model.num_symbols = 130
    cfg.model.n_speakers = 109
    cfg.model.gin_channels = 256
    cfg.phonemizer = Phonemizer.ESPEAK
    cfg.text_language = "en-gb"

    buf = io.StringIO()
    cfg.save(buf)
    buf.seek(0)
    cfg2 = TrainingConfig.load(buf)

    assert cfg2.model.num_symbols == 130
    assert cfg2.model.n_speakers == 109
    assert cfg2.is_multispeaker
    assert cfg2.phonemizer == Phonemizer.ESPEAK
    assert cfg2.text_language == "en-gb"
    assert cfg2.model.upsample_rates == (8, 8, 2, 2)


def test_load_real_style_config():
    """Parse a config.json shaped like a real mimic3 voice's."""
    raw = {
        "audio": {"sample_rate": 22050, "hop_length": 256},
        "model": {
            "num_symbols": 155,
            "n_speakers": 1,
            "use_sdp": True,
            "resblock_dilation_sizes": [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        },
        "phonemes": {
            "bos": "^",
            "eos": "$",
            "auto_bos_eos": True,
            "blank_between": "tokens_and_words",
        },
        "inference": {"noise_scale": 0.667, "noise_w": 0.8},
        "phonemizer": "espeak",
        "text_language": "en-gb",
        "unknown_future_key": {"x": 1},
    }
    cfg = TrainingConfig.load(io.StringIO(json.dumps(raw)))
    assert cfg.model.num_symbols == 155
    assert cfg.phonemes.blank_between == BlankBetween.TOKENS_AND_WORDS
    assert cfg.phonemes.auto_bos_eos is True
    assert cfg.phonemizer == Phonemizer.ESPEAK
    assert cfg.model.resblock_dilation_sizes == ((1, 3, 5), (1, 3, 5), (1, 3, 5))


def test_recursive_update():
    base = {"a": {"b": 1, "c": 2}, "d": 3}
    recursive_update(base, {"a": {"b": 10}, "e": 4})
    assert base == {"a": {"b": 10, "c": 2}, "d": 3, "e": 4}


def test_mel_normalize_roundtrip():
    import numpy as np

    cfg = TrainingConfig()
    mel_db = np.linspace(-90.0, 10.0, 100)
    norm = cfg.audio.normalize(mel_db)
    denorm = cfg.audio.denormalize(norm)
    # Clipping makes it non-exact at edges; interior must round-trip.
    interior = (mel_db > -80) & (mel_db < 0)
    assert np.allclose(denorm[interior], mel_db[interior], atol=1e-6)
