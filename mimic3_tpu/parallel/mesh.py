"""Mesh construction and sharding rules.

The reference scales by running N Python threads against one ONNX
session on one host (reference: mimic3_http/__main__.py:53-61); here
scaling is a ``jax.sharding.Mesh`` over TPU chips with XLA inserting the
collectives:

- **dp** (data parallel): batch dimension of requests/training examples.
  VITS-low is ~20M params, so pure DP is the efficient layout — params
  replicated, activations sharded on batch, zero inter-chip traffic at
  inference.
- **tp** (tensor parallel): hooks provided for the wide matmuls (FFN
  filter channels, HiFi-GAN channels) — useful only for much larger
  models; rules ship so scaled-up configs work unchanged.

Training gradients are averaged across dp by jit itself (params have a
replicated sharding, so XLA emits the psum; no hand-written collectives).
"""

from __future__ import annotations

import typing

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-name suffix -> PartitionSpec rules for tensor parallelism.
# Our conv layout is [K, Cin, Cout]; shard the wide output channels.
_TP_RULES: typing.Tuple[typing.Tuple[str, P], ...] = (
    ("ffn_layers/*/conv_1/weight", P(None, None, "tp")),
    ("ffn_layers/*/conv_1/bias", P("tp")),
    ("ffn_layers/*/conv_2/weight", P(None, "tp", None)),
    ("dec/ups/*/weight", P(None, None, "tp")),
    ("dec/ups/*/bias", P("tp")),
)


def make_mesh(
    n_devices: typing.Optional[int] = None,
    dp: typing.Optional[int] = None,
    tp: int = 1,
    devices: typing.Optional[typing.Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ``(dp, tp)`` mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != devices({n})")
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def _match(path: str, pattern: str) -> bool:
    """Suffix match: the pattern matches the trailing path segments."""
    p_parts = pattern.split("/")
    parts = path.split("/")
    if len(parts) < len(p_parts):
        return False
    tail = parts[-len(p_parts):]
    return all(pp == "*" or pp == part for pp, part in zip(p_parts, tail))


def param_sharding(
    mesh: Mesh, params: typing.Any, use_tp: bool = False
) -> typing.Any:
    """Sharding pytree for params: replicated, or TP-sharded where rules
    match (only meaningful when the mesh has a nontrivial tp axis)."""

    def spec_for(path: typing.Tuple, leaf) -> NamedSharding:
        del leaf
        if use_tp and mesh.shape.get("tp", 1) > 1:
            path_str = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in path
            )
            for pattern, spec in _TP_RULES:
                if _match(path_str, pattern):
                    return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dimension sharding over dp for inputs/activations."""
    return NamedSharding(mesh, P("dp"))


def shard_params(mesh: Mesh, params, use_tp: bool = False):
    """Place params on the mesh per :func:`param_sharding`."""
    shardings = param_sharding(mesh, params, use_tp=use_tp)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def shard_batch(mesh: Mesh, batch):
    """Place a batch pytree with its leading dim sharded over dp."""
    sharding = batch_sharding(mesh)

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, batch)
