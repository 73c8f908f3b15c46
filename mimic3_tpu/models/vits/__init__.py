"""VITS end-to-end TTS model, implemented TPU-first in JAX.

Architecture follows the VITS paper (arXiv 2106.06103) with the exact
hyperparameters a Mimic 3 voice's ``config.json`` declares
(reference: mimic3_tts/config.py:113-143):

- transformer text encoder with windowed relative-position attention,
- stochastic duration predictor (neural spline flows over log-durations),
- residual-coupling normalizing flow,
- HiFi-GAN decoder (multi-receptive-field vocoder).

Design notes (TPU):
- activations are channels-last ``[batch, time, channels]`` so the channel
  axis maps to TPU lanes,
- every sequence op is masked; shapes are static (length buckets),
- synthesis is split into a cheap *duration* stage and an expensive
  *decode* stage so the spectrogram-frame count can be bucketed tightly
  before the decoder (the FLOPs hot spot) runs.

Parameter pytrees use the canonical VITS module names (``enc_p``, ``dp``,
``flow``, ``dec``, ``emb_g``) so checkpoints exported from torch/ONNX map
one-to-one.
"""

from .model import (  # noqa: F401
    VitsModel,
    init_vits_params,
)
