"""mimic3-tpu: a TPU-native neural text-to-speech framework.

A from-scratch rebuild of the capabilities of MycroftAI/mimic3 (text ->
phonemes -> phoneme ids -> VITS -> 16-bit PCM WAV), designed TPU-first:

- The VITS synthesis graph (transformer text encoder with relative-position
  attention, stochastic duration predictor built from neural spline flows,
  residual-coupling normalizing flow, HiFi-GAN decoder) is implemented in
  JAX and compiled by XLA for TPU, with Pallas kernels for the hot ops.
  This replaces the reference's black-box ONNX Runtime session
  (reference: mimic3_tts/voice.py:403-405).
- Serving uses static-shape length buckets so XLA never recompiles on the
  request hot path, and `jax.sharding` meshes for batch data parallelism.
- The text front end (phonemizers, phoneme-id encoding), SSML engine,
  CLI, and HTTP API keep the reference's contracts so existing voices,
  clients, and scripts keep working.

Public API mirrors the reference's `opentts_abc` + `mimic3_tts` split:

    from mimic3_tpu import Mimic3Settings, Mimic3TextToSpeechSystem
    tts = Mimic3TextToSpeechSystem(Mimic3Settings(voice="en_UK/apope_low"))
    wav_bytes = tts.text_to_wav("Hello world.")
"""

__version__ = "0.1.0"

from .api import (  # noqa: F401
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

__all__ = [
    "AudioResult",
    "BaseResult",
    "BaseToken",
    "MarkResult",
    "Phonemes",
    "SayAs",
    "TextToSpeechSystem",
    "Voice",
    "Word",
    "Mimic3Settings",
    "Mimic3TextToSpeechSystem",
    "__version__",
]


def __getattr__(name):
    # Lazy imports so `import mimic3_tpu` does not pull in JAX for pure
    # front-end consumers (e.g. SSML-only use, voice listing).
    if name in ("Mimic3Settings", "Mimic3TextToSpeechSystem", "VoiceNotFoundError"):
        from . import engine

        return getattr(engine, name)
    if name == "SSMLSpeaker":
        from .ssml import SSMLSpeaker

        return SSMLSpeaker
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
