#!/usr/bin/env python3
"""Deterministic golden-hash generation for installed voices.

For every installed voice, synthesizes one fixed sentence in
deterministic mode (noise_scale=0, noise_w=0, length_scale=1) and prints
``sha256  voice_key`` lines — the regression contract the reference uses
(reference: tests/get_sample_hashes.py:102-190, tests/sample_hashes.txt).

Usage:
    python scripts/get_sample_hashes.py [--voices-dir DIR] \
        [--voice KEY ...] [--output-dir DIR] > sample_hashes.txt
Compare two runs with ``diff`` (or scripts/samples_match.py per WAV for
cross-machine fuzz).
"""

import argparse
import hashlib
import sys
from pathlib import Path

# one fixed sentence per short language code
TEST_SENTENCES = {
    "af": "Dit het my nogal lank geneem om 'n stem te ontwikkel.",
    "bn": "একটি কণ্ঠস্বর তৈরি করতে আমার বেশ সময় লেগেছে।",
    "de": "Es hat ziemlich lange gedauert, eine Stimme zu entwickeln.",
    "el": "Μου πήρε αρκετό καιρό να αναπτύξω μια φωνή.",
    "en": "It took me quite a long time to develop a voice, and now "
    "that I have it I'm not going to be silent.",
    "es": "Me llevó bastante tiempo desarrollar una voz.",
    "fa": "توسعه یک صدا زمان زیادی از من گرفت.",
    "fi": "Äänen kehittäminen vei minulta melko kauan.",
    "fr": "Il m'a fallu beaucoup de temps pour développer une voix.",
    "gu": "અવાજ વિકસાવવામાં મને ઘણો સમય લાગ્યો.",
    "ha": "Ya dauki lokaci mai tsawo kafin in samar da murya.",
    "hu": "Elég sok időbe telt, mire kialakítottam egy hangot.",
    "it": "Mi ci è voluto parecchio tempo per sviluppare una voce.",
    "jv": "Aku butuh wektu suwe kanggo ngembangake swara.",
    "ko": "목소리를 만드는 데 꽤 오랜 시간이 걸렸습니다.",
    "ne": "आवाज विकास गर्न मलाई निकै लामो समय लाग्यो।",
    "nl": "Het kostte me vrij veel tijd om een stem te ontwikkelen.",
    "pl": "Opracowanie głosu zajęło mi sporo czasu.",
    "ru": "Мне потребовалось довольно много времени, чтобы создать голос.",
    "sw": "Ilinichukua muda mrefu kuunda sauti.",
    "te": "స్వరాన్ని అభివృద్ధి చేయడానికి నాకు చాలా సమయం పట్టింది.",
    "tn": "Go ntsere nako e telele go dira lentswe.",
    "uk": "Мені знадобилося досить багато часу, щоб створити голос.",
    "vi": "Tôi đã mất khá nhiều thời gian để phát triển một giọng nói.",
    "yo": "Ó gbà mí ní àkókò gígùn láti ṣe agbékalẹ̀ ohùn kan.",
}


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--voices-dir", action="append", help="Voice directories"
    )
    parser.add_argument(
        "--voice",
        action="append",
        help="Only hash specific voice key(s)",
    )
    parser.add_argument(
        "--output-dir", help="Also write the synthesized WAVs here"
    )
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()

    import logging

    logging.basicConfig(
        level=logging.DEBUG if args.debug else logging.WARNING
    )

    from mimic3_tpu.engine import Mimic3Settings, Mimic3TextToSpeechSystem

    tts = Mimic3TextToSpeechSystem(
        Mimic3Settings(
            voices_directories=args.voices_dir,
            no_download=True,
            noise_scale=0.0,
            noise_w=0.0,
            length_scale=1.0,
            use_deterministic_compute=True,
        )
    )

    out_dir = Path(args.output_dir) if args.output_dir else None
    if out_dir:
        out_dir.mkdir(parents=True, exist_ok=True)

    wanted = set(args.voice or [])
    count = 0
    for voice in sorted(tts.get_voices(), key=lambda v: v.key):
        if wanted and voice.key not in wanted:
            continue
        if not Path(voice.location).is_dir():
            continue  # not installed
        short_lang = voice.language.split("_", maxsplit=1)[0]
        sentence = TEST_SENTENCES.get(short_lang, TEST_SENTENCES["en"])
        tts.voice = voice.key
        try:
            wav_bytes = tts.text_to_wav(sentence)
        except Exception as err:
            print(f"ERROR {voice.key}: {err}", file=sys.stderr)
            continue
        digest = hashlib.sha256(wav_bytes).hexdigest()
        print(f"{digest}  {voice.key}")
        count += 1
        if out_dir:
            safe = voice.key.replace("/", "_")
            (out_dir / f"{safe}.wav").write_bytes(wav_bytes)

    print(f"hashed {count} voices", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
