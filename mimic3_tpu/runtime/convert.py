"""Checkpoint conversion: torch/ONNX VITS weights -> JAX parameter pytree.

The reference executes a black-box ``generator.onnx``
(reference: mimic3_tts/voice.py:403-405); here that file is just a weight
container.  Conversion maps tensors by their canonical VITS module names
into our nested-dict pytree, transposing into TPU-friendly layouts:

- conv weights  torch ``[Cout, Cin/g, K]``   -> ``[K, Cin/g, Cout]``
- transposed conv  torch ``[Cin, Cout, K]``  -> ``[K, Cin, Cout]``
- weight-norm ``weight_g`` ``[Cout, 1, 1]``   -> ``[1, 1, Cout]``
- ``ElementwiseAffine`` m/logs ``[C, 1]``      -> ``[C]``
- embeddings/norms/biases unchanged.

Also exposes the ``mimic3-convert`` CLI: convert a voice directory's
``generator.onnx`` into the native ``generator.npz`` the TPU runtime
loads.
"""

from __future__ import annotations

import json
import re
import typing
from pathlib import Path

import numpy as np

Pytree = typing.Dict[str, typing.Any]

# torch module paths whose 3-D "weight"/"weight_v" is a ConvTranspose1d
_TRANSPOSED_RE = re.compile(r"(^|\.)(ups)\.\d+($|\.)")

# parameters that are [C, 1] column vectors in torch but [C] here
_SQUEEZE_KEYS = ("m", "logs")


def _assign(tree: Pytree, path: typing.Sequence[str], value: np.ndarray):
    node = tree
    for part in path[:-1]:
        node = node.setdefault(part, {})
    node[path[-1]] = value


def convert_tensor(name: str, tensor: np.ndarray) -> np.ndarray:
    """Convert a single named torch tensor into our layout."""
    parts = name.split(".")
    leaf = parts[-1]
    arr = np.asarray(tensor, dtype=np.float32)

    if leaf == "weight" and arr.ndim == 3:
        if _TRANSPOSED_RE.search(name):
            return arr.transpose(2, 0, 1)  # [Cin,Cout,K] -> [K,Cin,Cout]
        return arr.transpose(2, 1, 0)  # [Cout,Cin,K] -> [K,Cin,Cout]
    if leaf in _SQUEEZE_KEYS and arr.ndim == 2 and arr.shape[1] == 1:
        return arr[:, 0]
    return arr


def _fold_weight_norm_flat(
    flat: typing.Dict[str, np.ndarray],
) -> typing.Dict[str, np.ndarray]:
    """Fold torch weight-norm pairs (still in torch layout).

    torch's ``weight_norm`` (dim=0) norms over all axes except axis 0, so
    folding here — before any transposition — is correct for both Conv1d
    ([Cout, Cin, K]) and ConvTranspose1d ([Cin, Cout, K]).
    """
    out: typing.Dict[str, np.ndarray] = {}
    for name, arr in flat.items():
        if name.endswith(".weight_g"):
            base = name[: -len(".weight_g")]
            v = np.asarray(flat[base + ".weight_v"], np.float32)
            g = np.asarray(arr, np.float32)
            axes = tuple(range(1, v.ndim))
            norm = np.sqrt(np.sum(np.square(v), axis=axes, keepdims=True))
            out[base + ".weight"] = g * v / norm
        elif name.endswith(".weight_v"):
            continue
        else:
            out[name] = arr
    return out


def normalize_param_name(name: str) -> typing.Optional[str]:
    """Normalize a torch state-dict key.

    Handles new-style parametrized weight norm
    (``...parametrizations.weight.original0/1`` -> ``weight_g``/``weight_v``)
    and drops buffers that have no meaning here.
    """
    name = name.replace(".parametrizations.weight.original0", ".weight_g")
    name = name.replace(".parametrizations.weight.original1", ".weight_v")
    if name.endswith("num_batches_tracked"):
        return None
    return name


def state_dict_to_pytree(
    state_dict: typing.Mapping[str, np.ndarray],
    *,
    strip_prefixes: typing.Sequence[str] = ("model.", "generator."),
) -> Pytree:
    """Convert a flat name->tensor mapping into the nested JAX pytree.

    Weight-norm pairs are folded (inference checkpoints don't train), so
    the resulting pytree always carries plain ``weight`` tensors.
    """
    flat: typing.Dict[str, np.ndarray] = {}
    for raw_name, tensor in state_dict.items():
        name = normalize_param_name(raw_name)
        if name is None:
            continue
        for prefix in strip_prefixes:
            if name.startswith(prefix):
                name = name[len(prefix):]
                break
        flat[name] = np.asarray(tensor)

    flat = _fold_weight_norm_flat(flat)

    tree: Pytree = {}
    for name, arr in flat.items():
        _assign(tree, name.split("."), convert_tensor(name, arr))
    return tree


# ---------------------------------------------------------------------------
# Pytree <-> flat dict (for npz storage)
# ---------------------------------------------------------------------------


def flatten_pytree(
    tree: Pytree, prefix: str = ""
) -> typing.Dict[str, np.ndarray]:
    flat: typing.Dict[str, np.ndarray] = {}
    for key, value in tree.items():
        path = f"{prefix}.{key}" if prefix else key
        if isinstance(value, dict):
            flat.update(flatten_pytree(value, path))
        else:
            flat[path] = np.asarray(value)
    return flat


def unflatten_pytree(
    flat: typing.Mapping[str, np.ndarray],
) -> Pytree:
    tree: Pytree = {}
    for name, value in flat.items():
        _assign(tree, name.split("."), np.asarray(value))
    return tree


def save_pytree_npz(path: typing.Union[str, Path], tree: Pytree) -> None:
    np.savez(path, **flatten_pytree(tree))


def load_pytree_npz(path: typing.Union[str, Path]) -> Pytree:
    with np.load(path) as data:
        return unflatten_pytree({k: data[k] for k in data.files})


# ---------------------------------------------------------------------------
# ONNX entry point
# ---------------------------------------------------------------------------


def onnx_to_pytree(onnx_path: typing.Union[str, Path]) -> Pytree:
    """Read ``generator.onnx`` initializers into a parameter pytree.

    Works without the ``onnx`` package — the protobuf wire format is
    parsed directly (see :mod:`mimic3_tpu.runtime.onnx_reader`).
    """
    from .onnx_reader import read_onnx_initializers

    initializers = read_onnx_initializers(onnx_path)
    return state_dict_to_pytree(initializers)


def convert_voice_directory(
    voice_dir: typing.Union[str, Path], force: bool = False
) -> Path:
    """Convert ``<voice_dir>/generator.onnx`` to ``generator.npz``.

    The npz (plus ``config.json``/``phonemes.txt`` already in the
    directory) is everything the TPU runtime needs.  Returns the npz path.
    """
    voice_dir = Path(voice_dir)
    npz_path = voice_dir / "generator.npz"
    onnx_path = voice_dir / "generator.onnx"
    if npz_path.is_file() and not force:
        return npz_path
    if not onnx_path.is_file():
        raise FileNotFoundError(f"No generator.onnx in {voice_dir}")
    tree = onnx_to_pytree(onnx_path)
    save_pytree_npz(npz_path, tree)
    return npz_path


def main(argv: typing.Optional[typing.Sequence[str]] = None) -> int:
    """``mimic3-convert <voice_dir> [...]`` CLI."""
    import argparse

    parser = argparse.ArgumentParser(
        prog="mimic3-convert",
        description="Convert a Mimic 3 voice's generator.onnx into the "
        "native generator.npz weight file",
    )
    parser.add_argument("voice_dir", nargs="+")
    parser.add_argument(
        "--force", action="store_true", help="Overwrite existing npz"
    )
    args = parser.parse_args(argv)
    for voice_dir in args.voice_dir:
        npz = convert_voice_directory(voice_dir, force=args.force)
        flat = flatten_pytree(load_pytree_npz(npz))
        n_params = int(sum(int(np.prod(v.shape)) for v in flat.values()))
        print(
            json.dumps(
                {
                    "voice_dir": str(voice_dir),
                    "npz": str(npz),
                    "tensors": len(flat),
                    "parameters": n_params,
                }
            )
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
