"""SSML engine tests against a scripted fake TTS (no model needed)."""

import typing

from mimic3_tpu.api import (
    AudioResult,
    BaseResult,
    BaseToken,
    MarkResult,
    Phonemes,
    SayAs,
    TextToSpeechSystem,
    Voice,
    Word,
)
from mimic3_tpu.ssml import SSMLSpeaker, parse_rate, parse_volume


class FakeTTS(TextToSpeechSystem):
    """Records calls; emits one AudioResult per spoken chunk."""

    def __init__(self):
        self.calls: typing.List[tuple] = []
        self._voice = "en/default"
        self._language = "en_US"
        self._volume = 100.0
        self._rate = 1.0
        self._queued: typing.List[BaseResult] = []

    @property
    def voice(self):
        return self._voice

    @voice.setter
    def voice(self, v):
        self._voice = v
        self.calls.append(("voice", v))

    @property
    def language(self):
        return self._language

    @language.setter
    def language(self, v):
        self._language = v

    @property
    def volume(self):
        return self._volume

    @volume.setter
    def volume(self, v):
        self._volume = v
        self.calls.append(("volume", v))

    @property
    def rate(self):
        return self._rate

    @rate.setter
    def rate(self, v):
        self._rate = v
        self.calls.append(("rate", v))

    def get_voices(self):
        return [Voice("k", "n", "l", "", "")]

    def begin_utterance(self):
        self.calls.append(("begin",))

    def speak_text(self, text, text_language=None):
        self.calls.append(("text", text.strip(), self._voice, self._rate))
        self._queued.append(
            AudioResult(audio_bytes=b"\0\0", tag=text.strip())
        )

    def speak_tokens(self, tokens: typing.Iterable[BaseToken]):
        tokens = list(tokens)
        self.calls.append(("tokens", tokens))
        self._queued.append(
            AudioResult(audio_bytes=b"\0\0", tag=tokens)
        )

    def add_break(self, time_ms):
        self.calls.append(("break", time_ms))
        self._queued.append(AudioResult(audio_bytes=b"", tag="break"))

    def set_mark(self, name):
        self.calls.append(("mark", name))
        self._queued.append(MarkResult(name=name))

    def end_utterance(self):
        out = self._queued
        self._queued = []
        self.calls.append(("end",))
        return out


def run(ssml: str):
    tts = FakeTTS()
    results = list(SSMLSpeaker(tts).speak(ssml))
    return tts, results


def test_plain_text_wrapped():
    tts, results = run("Hello world")
    assert ("text", "Hello world", "en/default", 1.0) in tts.calls
    assert len(results) == 1


def test_sentences_stream_incrementally():
    tts, results = run("<speak><s>one</s><s>two</s></speak>")
    ends = [c for c in tts.calls if c == ("end",)]
    assert len(ends) >= 2
    tags = [r.tag for r in results if isinstance(r, AudioResult)]
    assert tags == ["one", "two"]


def test_break_and_mark():
    tts, results = run(
        '<speak>before<break time="250ms"/><mark name="here"/>after</speak>'
    )
    assert ("break", 250) in tts.calls
    assert ("mark", "here") in tts.calls
    marks = [r for r in results if isinstance(r, MarkResult)]
    assert marks and marks[0].name == "here"


def test_break_seconds():
    tts, _ = run('<speak>x<break time="1.5s"/></speak>')
    assert ("break", 1500) in tts.calls


def test_voice_switch_and_restore():
    tts, _ = run(
        '<speak><s>a</s><voice name="other/voice"><s>b</s></voice>'
        "<s>c</s></speak>"
    )
    texts = [c for c in tts.calls if c[0] == "text"]
    assert texts[0][2] == "en/default"
    assert texts[1][2] == "other/voice"
    assert texts[2][2] == "en/default"


def test_prosody_rate_nested():
    tts, _ = run(
        '<speak><prosody rate="50%"><s>slow</s>'
        '<prosody rate="x-fast"><s>fast</s></prosody>'
        "<s>slow again</s></prosody></speak>"
    )
    texts = [c for c in tts.calls if c[0] == "text"]
    assert texts[0][3] == 0.5
    assert texts[1][3] == 3.0
    assert texts[2][3] == 0.5


def test_word_tokens_with_role():
    tts, _ = run('<speak><w role="verb">record</w></speak>')
    token_calls = [c for c in tts.calls if c[0] == "tokens"]
    assert len(token_calls) == 1
    word = token_calls[0][1][0]
    assert isinstance(word, Word)
    assert word.text.strip() == "record"
    assert word.role == "verb"


def test_phoneme_tag():
    tts, _ = run(
        '<speak><phoneme alphabet="ipa" ph="həˈloʊ">hello</phoneme></speak>'
    )
    token_calls = [c for c in tts.calls if c[0] == "tokens"]
    ph = token_calls[0][1][0]
    assert isinstance(ph, Phonemes)
    assert ph.text == "həˈloʊ"
    # inner text must NOT be spoken
    assert not any(c[0] == "text" for c in tts.calls)


def test_sub_alias():
    tts, _ = run('<speak><sub alias="World Wide Web">WWW</sub></speak>')
    texts = [c for c in tts.calls if c[0] == "text"]
    assert texts == [("text", "World Wide Web", "en/default", 1.0)]


def test_say_as():
    tts, _ = run(
        '<speak><say-as interpret-as="spell-out">abc</say-as></speak>'
    )
    token_calls = [c for c in tts.calls if c[0] == "tokens"]
    sa = token_calls[0][1][0]
    assert isinstance(sa, SayAs)
    assert sa.interpret_as == "spell-out"
    assert sa.text.strip() == "abc"


def test_metadata_skipped():
    tts, _ = run(
        "<speak><metadata><skip>not spoken</skip></metadata>real</speak>"
    )
    texts = [c for c in tts.calls if c[0] == "text"]
    assert texts == [("text", "real", "en/default", 1.0)]


def test_parse_volume():
    assert parse_volume("silent") == 0.0
    assert parse_volume("50") == 50.0
    assert parse_volume("+10", current=50) == 60.0
    assert parse_volume("-10%", current=50) == 45.0
    assert parse_volume("200") == 100.0  # clamped
    assert parse_volume("loud") == 80.0


def test_parse_rate():
    assert parse_rate("x-slow") == 0.25
    assert parse_rate("150%") == 1.5
    assert parse_rate("2") == 2.0
    assert parse_rate("") == 1.0


def test_malformed_inputs_do_not_crash():
    """Untrusted SSML (the server feeds request bodies here) either
    synthesizes best-effort or raises ParseError — never IndexError/
    KeyError/AttributeError from tag handling."""
    from xml.etree.ElementTree import ParseError

    cases = [
        "",  # empty
        "plain text, no xml at all",
        "<speak>",  # unclosed root (wrapped retry also fails)
        "<speak><s>unclosed sentence</speak>",
        "<speak><voice/></speak>",  # voice with no name
        '<speak><voice name="">empty name</voice></speak>',
        "<speak><break/>only a break</speak>",
        '<speak><break time="garbage"/>x</speak>',
        '<speak><prosody rate="">y</prosody></speak>',
        '<speak><prosody volume="loudish">z</prosody></speak>',
        '<speak><phoneme>no ph attr</phoneme></speak>',
        '<speak><say-as>no interpret-as</say-as></speak>',
        '<speak><mark/></speak>',  # mark with no name
        '<speak><sub>no alias</sub></speak>',
        "<speak>" + "<s>" * 50 + "deep" + "</s>" * 50 + "</speak>",
        "<speak>&amp;&lt;&gt;</speak>",
        '<?xml version="1.0"?><speak>decl</speak>',
        "<speak><unknown-tag>inside</unknown-tag></speak>",
        "<speak><metadata><junk/></metadata>after</speak>",
    ]
    for ssml in cases:
        tts = FakeTTS()
        try:
            list(SSMLSpeaker(tts).speak(ssml))
        except ParseError:
            pass  # acceptable for truly invalid XML
