"""ONNX reading + end-to-end checkpoint conversion tests.

The torch oracle's state_dict is serialized as an ONNX file (with the
independent test writer), read back with the production protobuf parser,
converted to the JAX pytree, and the resulting model must reproduce the
torch output — the exact path a real ``generator.onnx`` voice takes.
"""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

import onnx_writer
import torch_oracle as oracle
from mimic3_tpu.config import ModelConfig
from mimic3_tpu.models.vits import VitsModel
from mimic3_tpu.runtime.convert import (
    load_pytree_npz,
    onnx_to_pytree,
    save_pytree_npz,
    state_dict_to_pytree,
)
from mimic3_tpu.runtime.onnx_reader import read_onnx_initializers


def test_reader_roundtrip(tmp_path):
    tensors = {
        "a.weight": np.random.randn(3, 4, 5).astype(np.float32),
        "b.bias": np.random.randn(7).astype(np.float32),
        "c.ids": np.arange(-3, 3, dtype=np.int64),
        "d.scalar": np.array(2.5, dtype=np.float32),
        "e.half": np.random.randn(2, 2).astype(np.float16),
    }
    path = tmp_path / "m.onnx"
    onnx_writer.write_onnx(str(path), tensors)
    out = read_onnx_initializers(path)
    assert set(out) == set(tensors)
    for k, v in tensors.items():
        np.testing.assert_array_equal(out[k], v)


def test_reader_nonraw_and_constants(tmp_path):
    inits = {
        "w": np.random.randn(2, 3).astype(np.float32),
        "n": np.array([5, -1], dtype=np.int64),
    }
    consts = {"folded.weight": np.random.randn(4).astype(np.float32)}
    path = tmp_path / "m.onnx"
    onnx_writer.write_onnx(str(path), inits, constants=consts, use_raw=False)
    out = read_onnx_initializers(path)
    np.testing.assert_allclose(out["w"], inits["w"], rtol=1e-6)
    np.testing.assert_array_equal(out["n"], inits["n"])
    np.testing.assert_array_equal(
        out["folded.weight"], consts["folded.weight"]
    )


def test_reader_rejects_garbage(tmp_path):
    path = tmp_path / "bad.onnx"
    path.write_bytes(b"not a protobuf at all")
    with pytest.raises(ValueError):
        read_onnx_initializers(path)


def test_onnx_checkpoint_end_to_end(tmp_path):
    """torch weights -> ONNX file -> parser -> converter -> JAX == torch."""
    torch.manual_seed(3)
    tm = oracle.SynthesizerTrn(
        30,
        inter_channels=16,
        hidden=16,
        filter_channels=32,
        n_heads=2,
        n_layers=1,
        initial_channel=32,
        rates=(4, 4),
        up_kernels=(8, 8),
    )
    tm.eval()

    # fold weight norm the way real exports do, then write "generator.onnx"
    sd = oracle.state_dict_numpy(tm)
    onnx_path = tmp_path / "generator.onnx"
    onnx_writer.write_onnx(str(onnx_path), sd)

    params = onnx_to_pytree(onnx_path)
    # folded: no weight_g/_v anywhere
    def no_wn(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                no_wn(v)
            else:
                assert "weight_g" not in k and "weight_v" not in k
    no_wn(params)

    # npz round-trip (the voice cache format)
    npz = tmp_path / "generator.npz"
    save_pytree_npz(npz, params)
    params = jax.tree_util.tree_map(jnp.asarray, load_pytree_npz(npz))

    cfg = ModelConfig(
        num_symbols=30,
        inter_channels=16,
        hidden_channels=16,
        filter_channels=32,
        n_heads=2,
        n_layers=1,
        upsample_initial_channel=32,
        upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
    )
    model = VitsModel(cfg, decoder_dtype=jnp.float32)

    ids = np.random.RandomState(0).randint(1, 30, size=(1, 7))
    lengths = np.array([7])
    with torch.no_grad():
        audio_t, ylen_t, w_t = tm.infer(
            torch.tensor(ids), torch.tensor(lengths),
            noise_scale=0.0, length_scale=1.0, noise_w=0.0,
        )

    rng = jax.random.PRNGKey(0)
    durs, totals = model.infer_durations(
        params, jnp.array(ids), jnp.array(lengths), rng,
        jnp.float32(1.0), jnp.float32(0.0),
    )
    np.testing.assert_array_equal(
        np.asarray(durs)[0], w_t.numpy()[0, 0].astype(np.int32)
    )
    audio_j, alen_j = model.decode_frames(
        params, jnp.array(ids), jnp.array(lengths), durs,
        int(totals[0]), rng, jnp.float32(0.0),
    )
    n = int(alen_j[0])
    ref = audio_t.numpy()[0][:n]
    got = np.asarray(audio_j)[0, :n]
    corr = np.corrcoef(got, ref)[0, 1]
    assert corr > 0.9999, corr
    np.testing.assert_allclose(got, ref, atol=5e-5)


def test_convert_cli(tmp_path):
    """mimic3-convert CLI converts a voice dir's generator.onnx."""
    import json
    import subprocess
    import sys
    from pathlib import Path

    voice_dir = tmp_path / "en_XX" / "conv_low"
    voice_dir.mkdir(parents=True)
    tensors = {
        "enc_p.emb.weight": np.random.randn(10, 8).astype(np.float32),
        "dec.conv_pre.weight": np.random.randn(16, 8, 7).astype(
            np.float32
        ),
        "dec.conv_pre.bias": np.random.randn(16).astype(np.float32),
    }
    onnx_writer.write_onnx(str(voice_dir / "generator.onnx"), tensors)

    result = subprocess.run(
        [
            sys.executable, "-m", "mimic3_tpu.runtime.convert",
            str(voice_dir),
        ],
        capture_output=True,
        timeout=60,
        cwd=Path(__file__).parent.parent,
        env={"PATH": "/usr/bin:/bin", "HOME": "/tmp"},
    )
    assert result.returncode == 0, result.stderr.decode()[-1500:]
    info = json.loads(result.stdout)
    assert info["tensors"] == 3
    npz = voice_dir / "generator.npz"
    assert npz.is_file()
    tree = load_pytree_npz(npz)
    # conv weight transposed into [K, Cin, Cout]
    assert tree["dec"]["conv_pre"]["weight"].shape == (7, 8, 16)
    assert tree["enc_p"]["emb"]["weight"].shape == (10, 8)


def test_state_dict_conversion_parity_vs_parametrized():
    """Old-style (weight_g/weight_v) and new-style (parametrizations)
    state dicts must convert identically."""
    torch.manual_seed(4)
    conv = torch.nn.utils.parametrizations.weight_norm(
        torch.nn.Conv1d(4, 6, 3)
    )
    sd_new = {
        f"m.{k}": v.detach().numpy() for k, v in conv.state_dict().items()
    }
    # synthesize old-style names from the same tensors
    sd_old = {
        "m.bias": sd_new["m.bias"],
        "m.weight_g": sd_new["m.parametrizations.weight.original0"],
        "m.weight_v": sd_new["m.parametrizations.weight.original1"],
    }
    t_new = state_dict_to_pytree(sd_new)
    t_old = state_dict_to_pytree(sd_old)
    np.testing.assert_allclose(
        t_new["m"]["weight"], t_old["m"]["weight"], atol=0
    )
    # and the fold matches torch's own computed weight
    w_torch = conv.weight.detach().numpy()  # [Cout, Cin, K]
    np.testing.assert_allclose(
        t_new["m"]["weight"], w_torch.transpose(2, 1, 0), atol=1e-6
    )
