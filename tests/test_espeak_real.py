"""Byte-compat tests against a REAL libespeak-ng (not the fake shim).

Skipped when no real libespeak-ng is installed (it is absent on the CI
machine); the Docker image installs ``libespeak-ng1`` and runs this file
during the build (Dockerfile test gate), which is where the reference's
wholesale-divergence risk — espeak IPA byte compatibility
(reference: mimic3_tts/voice.py:497,507) — gets real coverage.

Expected IPA strings below are espeak-ng's stable en-us output; they are
the compatibility contract (phoneme ids shift if any byte differs).
"""

import pytest

from mimic3_tpu.text.espeak import EspeakPhonemizer


def _real_espeak_available() -> bool:
    """True only when an actual libespeak-ng loads (not the test shim)."""
    import mimic3_tpu.text.espeak as espeak_mod

    if any("fake" in str(n) for n in espeak_mod._LIB_NAMES):
        return False
    try:
        return EspeakPhonemizer.is_available()
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _real_espeak_available(),
    reason="real libespeak-ng not installed",
)


def test_hello_ipa_en_us():
    p = EspeakPhonemizer()
    out = p.phonemize(
        "hello", voice="en-us", phoneme_separator="", word_separator=" "
    )
    assert out.strip() == "həlˈoʊ"


def test_sentence_with_clause_breakers():
    """Clause breakers survive phonemization attached to the last word
    (what the voice layer's break detection keys on —
    reference: mimic3_tts/voice.py:510-533)."""
    p = EspeakPhonemizer()
    out = p.phonemize(
        "Hello, world.",
        voice="en-us",
        keep_clause_breakers=True,
        phoneme_separator="",
        word_separator="#",
        punctuation_separator="",
    )
    words = out.split("#")
    assert words[0].endswith(",")
    assert words[-1].endswith(".")
    assert words[0].rstrip(",") == "həlˈoʊ"
    assert words[-1].rstrip(".") == "wˈɜːld"


def test_phonemes_map_to_ids():
    """Real espeak IPA → grapheme split → id encoding round trip."""
    from mimic3_tpu.text import phonemes2ids
    from mimic3_tpu.text.ipa import IPA

    p = EspeakPhonemizer()
    out = p.phonemize(
        "hello world",
        voice="en-us",
        phoneme_separator="",
        word_separator="#",
    )
    word_phonemes = [IPA.graphemes(w) for w in out.split("#") if w]
    symbols = sorted({ph for w in word_phonemes for ph in w})
    table = {"_": 0, "^": 1, "$": 2, "#": 3}
    for i, s in enumerate(symbols):
        table[s] = i + 4
    ids = phonemes2ids(
        word_phonemes=word_phonemes,
        phoneme_to_id=table,
        pad="_",
        bos="^",
        eos="$",
        auto_bos_eos=True,
        blank="#",
        blank_between="words",
    )
    assert ids[0] == table["^"]
    assert ids[-1] == table["$"]
    assert all(isinstance(i, int) for i in ids)
    assert len(ids) > len(word_phonemes)


def test_deterministic_across_calls():
    p = EspeakPhonemizer()
    kwargs = dict(
        voice="en-us", phoneme_separator="", word_separator=" "
    )
    a = p.phonemize("The quick brown fox jumps over the lazy dog.", **kwargs)
    b = p.phonemize("The quick brown fox jumps over the lazy dog.", **kwargs)
    assert a == b
