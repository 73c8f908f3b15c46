"""Converter robustness across legacy ``torch.onnx.export`` variants.

The released mimic3 voices were exported years ago with old torch
(opset <= 13), whose graphs decompose ops differently from a modern
export — most notably LayerNorm (a single LayerNormalization node only
exists from opset 17; before that it is ReduceMean/Sub/Div/Mul/Add
primitives) — and deduplicate bitwise-identical tensors behind
Identity nodes (VITS zero-inits every flow ``post`` projection, so
this happens in REAL voices, not just random-init oracles).

These tests export the independent torch oracle across
opsets x constant-folding x voice variants (resblock 1/2, sdp
true/false, multispeaker) and prove
:func:`mimic3_tpu.runtime.convert.recover_initializer_names` recovers
every live parameter with exact values; a fully-anonymized pass
(opaque tensor ids, bare node names — the oldest exporter idiom) and a
loud-failure negative test complete the matrix.

Reference artifact being replaced: ``mimic3_tts/voice.py:403-405``
(the reference runs such onnx files blindly through onnxruntime).
"""

import logging
import sys
import types

import numpy as np
import pytest
import torch

import torch_oracle as oracle

from mimic3_tpu.config import ModelConfig
from mimic3_tpu.runtime.convert import (
    ConversionError,
    _fold_weight_norm_flat,
    normalize_param_name,
    onnx_to_pytree,
    recover_initializer_names,
)
from mimic3_tpu.runtime.onnx_reader import read_onnx_graph

N_VOCAB, HID, INTER, FILT, HEADS, LAYERS, INITIAL = 40, 32, 32, 64, 2, 2, 64
RATES, UPK = (4, 4), (8, 8)
T_TEXT, MAX_FRAMES = 11, 400

VARIANTS = {
    "base": ({}, {}),
    "resblock2": (
        dict(
            resblock="2",
            resblock_kernel_sizes=(3, 5, 7),
            resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
        ),
        dict(
            resblock="2",
            res_kernels=(3, 5, 7),
            res_dilations=((1, 2), (2, 6), (3, 12)),
        ),
    ),
    "sdpfalse": (dict(use_sdp=False), dict(use_sdp=False)),
    "ms": (
        dict(n_speakers=5, gin_channels=32),
        dict(n_speakers=5, gin_channels=32),
    ),
}

# parameters a traced inference graph legitimately omits
DEAD = ("dp.post_", "dp.flows.1.")


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


class _Wrap(torch.nn.Module):
    def __init__(self, net):
        super().__init__()
        self.net = net

    def forward(self, ids, lengths, dur_noise, prior_noise):
        return self.net.infer(
            ids,
            lengths,
            noise_scale=0.667,
            length_scale=1.0,
            noise_w=0.8,
            dur_noise=dur_noise,
            prior_noise=prior_noise,
        )


class _WrapSid(torch.nn.Module):
    def __init__(self, net):
        super().__init__()
        self.net = net

    def forward(self, ids, lengths, sid, dur_noise, prior_noise):
        return self.net.infer(
            ids,
            lengths,
            noise_scale=0.667,
            length_scale=1.0,
            noise_w=0.8,
            sid=sid,
            dur_noise=dur_noise,
            prior_noise=prior_noise,
        )


def _build(variant: str, distinct: bool = False):
    """Oracle net + matching ModelConfig for a voice variant.

    ``distinct=True`` perturbs every parameter so no two tensors are
    bitwise-identical — this DEFEATS exporter deduplication, so
    recovered-value checks prove correct *assignment*, not just
    coverage (identical dedup'd tensors can't distinguish the two).
    """
    ckw, okw = VARIANTS[variant]
    cfg = ModelConfig(
        num_symbols=N_VOCAB,
        inter_channels=INTER,
        hidden_channels=HID,
        filter_channels=FILT,
        n_heads=HEADS,
        n_layers=LAYERS,
        upsample_initial_channel=INITIAL,
        upsample_rates=RATES,
        upsample_kernel_sizes=UPK,
        **ckw,
    )
    torch.manual_seed(7)
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
        **okw,
    )
    if distinct:
        with torch.no_grad():
            gen = torch.Generator().manual_seed(99)
            for p in net.parameters():
                p.add_(
                    torch.rand(p.shape, generator=gen) * 0.02 + 0.001
                )
    net.eval()
    return net, cfg


def _export(net, variant: str, path, opset: int, fold: bool) -> None:
    _install_onnx_stub()
    args = [
        torch.tensor(
            np.random.RandomState(1).randint(1, N_VOCAB, (1, T_TEXT))
        ),
        torch.tensor([T_TEXT]),
    ]
    if variant == "ms":
        wrapper = _WrapSid(net)
        args.append(torch.tensor([1]))
    else:
        wrapper = _Wrap(net)
    args += [
        torch.zeros(1, 2, T_TEXT),
        torch.zeros(1, INTER, MAX_FRAMES),
    ]
    torch.onnx.export(
        wrapper,
        tuple(args),
        str(path),
        do_constant_folding=fold,
        opset_version=opset,
        dynamo=False,
    )


def _truth(net):
    sd = {
        normalize_param_name(k): v
        for k, v in oracle.state_dict_numpy(net).items()
    }
    return _fold_weight_norm_flat(sd)


def _assert_recovered(named, net, context: str) -> None:
    truth = _truth(net)
    got = _fold_weight_norm_flat(named)
    for name, arr in truth.items():
        if name.startswith(DEAD):
            continue
        if name == "dp.flows.0.logs" and arr.ndim == 2:
            arr = arr[:, 0:1]
        assert name in got, f"[{context}] {name} not recovered"
        np.testing.assert_allclose(
            got[name], arr, atol=1e-5, err_msg=f"[{context}] {name}"
        )


def _anonymize(initializers, nodes):
    """Oldest-exporter idiom: opaque tensor ids, bare node names, and
    Identity outputs stripped of their dotted names."""
    mapping = {k: f"{900 + i}" for i, k in enumerate(initializers)}
    out_map = {}
    for j, n in enumerate(nodes):
        for t, o in enumerate(n.outputs):
            if "." in o and not o.startswith("/"):
                out_map[o] = f"anon_{j}_{t}"
    new_inits = {mapping[k]: v for k, v in initializers.items()}
    for j, n in enumerate(nodes):
        n.name = f"{n.op_type}_{j}"
        n.inputs = [
            out_map.get(mapping.get(i, i), mapping.get(i, i))
            for i in n.inputs
        ]
        n.outputs = [out_map.get(o, o) for o in n.outputs]
    return new_inits, nodes


# -- default matrix: one legacy + one modern point per variant ---------

FAST_CASES = [
    ("base", 11, True),
    ("base", 13, False),
    ("resblock2", 11, True),
    ("sdpfalse", 11, True),
    ("ms", 13, True),
    ("ms", 17, False),
]


@pytest.mark.parametrize("variant,opset,fold", FAST_CASES)
def test_opset_recovery(variant, opset, fold, tmp_path):
    net, cfg = _build(variant)
    path = tmp_path / "g.onnx"
    _export(net, variant, path, opset, fold)
    initializers, nodes = read_onnx_graph(path)
    named = recover_initializer_names(
        initializers, nodes, cfg, strict=True
    )
    _assert_recovered(named, net, f"{variant}/op{opset}/fold{fold}")


@pytest.mark.slow
def test_opset_matrix_full(tmp_path):
    """Every remaining opset x folding x variant combination."""
    for variant in VARIANTS:
        for opset in (11, 13, 15, 17):
            for fold in (True, False):
                if (variant, opset, fold) in FAST_CASES:
                    continue
                net, cfg = _build(variant)
                path = tmp_path / f"{variant}_{opset}_{fold}.onnx"
                _export(net, variant, path, opset, fold)
                initializers, nodes = read_onnx_graph(path)
                named = recover_initializer_names(
                    initializers, nodes, cfg, strict=True
                )
                _assert_recovered(
                    named, net, f"{variant}/op{opset}/fold{fold}"
                )


# -- fully-anonymized legacy idiom -------------------------------------


@pytest.mark.parametrize("variant,opset", [("base", 11), ("ms", 13)])
def test_fully_anonymized_recovery(variant, opset, tmp_path):
    """No dotted names anywhere AND every tensor value distinct: proves
    shape/order/pattern matching assigns each tensor to the RIGHT
    module (with dedup'd identical tensors a misassignment would be
    invisible)."""
    net, cfg = _build(variant, distinct=True)
    path = tmp_path / "g.onnx"
    _export(net, variant, path, opset, True)
    initializers, nodes = read_onnx_graph(path)
    initializers, nodes = _anonymize(initializers, nodes)
    named = recover_initializer_names(
        initializers, nodes, cfg, strict=True
    )
    _assert_recovered(named, net, f"anon-{variant}/op{opset}")


def test_dedup_identity_alias_recovery(tmp_path):
    """Zero-init flow `post` projections deduplicate in REAL exports;
    the Identity-alias output names must recover every copy."""
    net, cfg = _build("base")  # random init: posts are all zero
    path = tmp_path / "g.onnx"
    _export(net, "base", path, 13, True)
    initializers, nodes = read_onnx_graph(path)
    n_posts_stored = sum(
        1
        for k in initializers
        if k.endswith("post.weight") and "conv_post" not in k
    )
    assert n_posts_stored == 1, "expected exporter dedup of post weights"
    named = recover_initializer_names(
        initializers, nodes, cfg, strict=True
    )
    for f in (0, 2, 4, 6):
        assert f"flow.flows.{f}.post.weight" in named
        assert f"flow.flows.{f}.post.bias" in named


# -- loud failure on unknown layouts -----------------------------------


def test_unknown_layout_fails_loudly(tmp_path, caplog):
    """A config mismatch (wrong channel widths — i.e. an export this
    converter does not understand) must raise, not fill live weights
    with random init silently."""
    net, cfg = _build("base")
    path = tmp_path / "g.onnx"
    _export(net, "base", path, 13, True)
    wrong_cfg = ModelConfig(
        num_symbols=N_VOCAB,
        inter_channels=INTER,
        hidden_channels=HID,
        filter_channels=FILT * 2,  # wrong: shapes won't line up
        n_heads=HEADS,
        n_layers=LAYERS,
        upsample_initial_channel=INITIAL,
        upsample_rates=RATES,
        upsample_kernel_sizes=UPK,
    )
    with pytest.raises(ConversionError):
        onnx_to_pytree(path, model_config=wrong_cfg)  # strict default

    # non-strict downgrades to a loud warning
    initializers, nodes = read_onnx_graph(path)
    with caplog.at_level(logging.WARNING):
        recover_initializer_names(
            initializers, nodes, wrong_cfg, strict=False
        )
    assert any(
        "could not be recovered" in r.message for r in caplog.records
    )
