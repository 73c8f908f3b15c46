"""Tests for the phoneme-id encoder (the voice compatibility contract)."""

import io

from mimic3_tpu.text import load_phoneme_ids, load_phoneme_map, phonemes2ids
from mimic3_tpu.text.ipa import IPA


TABLE = {
    "_": 0,
    "^": 1,
    "$": 2,
    "#": 3,
    ",": 4,
    ".": 5,
    "a": 10,
    "b": 11,
    "c": 12,
    "d": 13,
    "ˈ": 14,
    "ː": 15,
    "˥": 16,
    "|": 17,
    "‖": 18,
}


def test_blank_between_words():
    ids = phonemes2ids(
        [["a", "b"], ["c"]],
        TABLE,
        blank="#",
        blank_between="words",
        blank_at_start=True,
        blank_at_end=True,
    )
    assert ids == [3, 10, 11, 3, 12, 3]


def test_blank_between_words_no_edges():
    ids = phonemes2ids(
        [["a", "b"], ["c"]],
        TABLE,
        blank="#",
        blank_between="words",
        blank_at_start=False,
        blank_at_end=False,
    )
    assert ids == [10, 11, 3, 12]


def test_blank_between_tokens():
    ids = phonemes2ids(
        [["a", "b"], ["c"]],
        TABLE,
        blank="#",
        blank_between="tokens",
    )
    assert ids == [3, 10, 3, 11, 3, 12, 3]


def test_no_blank():
    ids = phonemes2ids([["a", "b"], ["c"]], TABLE)
    assert ids == [10, 11, 12]


def test_bos_eos():
    ids = phonemes2ids(
        [["a"]],
        TABLE,
        bos="^",
        eos="$",
        auto_bos_eos=True,
        blank="#",
        blank_between="words",
    )
    assert ids == [1, 3, 10, 3, 2]


def test_simple_punctuation():
    ids = phonemes2ids(
        [["a", "!"], ["b", ";"]],
        TABLE,
        simple_punctuation=True,
    )
    # ! -> . and ; -> ,
    assert ids == [10, 5, 11, 4]


def test_missing_phonemes_skipped():
    ids = phonemes2ids([["a", "zz", "b"]], TABLE)
    assert ids == [10, 11]


def test_missing_phonemes_fail():
    try:
        phonemes2ids([["zz"]], TABLE, fail_on_missing=True)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_phoneme_map():
    ids = phonemes2ids(
        [["x"]],
        TABLE,
        phoneme_map={"x": ["a", "b"]},
    )
    assert ids == [10, 11]


def test_separate_stress():
    ids = phonemes2ids(
        [["ˈa"]],
        TABLE,
        separate=["ˈ"],
    )
    assert ids == [14, 10]


def test_separate_graphemes():
    # "aː" is two clusters under the NFD-combining rule
    ids = phonemes2ids([["aː"]], TABLE, separate_graphemes=True)
    assert ids == [10, 15]


def test_separate_tones_after():
    ids = phonemes2ids([["a˥"]], TABLE, separate_tones=True)
    assert ids == [10, 16]


def test_separate_tones_before():
    ids = phonemes2ids(
        [["a˥"]], TABLE, separate_tones=True, tone_before=True
    )
    assert ids == [16, 10]


def test_load_phoneme_ids():
    content = "# comment\n0 _\n1 ^\n3  \n10 a\n"
    table = load_phoneme_ids(io.StringIO(content))
    assert table == {"_": 0, "^": 1, " ": 3, "a": 10}


def test_load_phoneme_map():
    content = "# comment\nx a b\ny c\n"
    pmap = load_phoneme_map(io.StringIO(content))
    assert pmap == {"x": ["a", "b"], "y": ["c"]}


def test_ipa_graphemes_combining():
    # combining tilde attaches to its base
    assert IPA.graphemes("ã") == ["ã"] or IPA.graphemes("ã") == [
        "ã"
    ]
    clusters = IPA.graphemes("ˈhə̃loʊ")
    assert clusters[0] == "ˈ"
    assert "ə̃" in clusters


def test_ipa_graphemes_modifier_letters_standalone():
    assert IPA.graphemes("aː") == ["a", "ː"]
    assert IPA.graphemes("ˈa") == ["ˈ", "a"]
