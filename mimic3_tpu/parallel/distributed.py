"""Multi-host / multi-slice initialization and mesh construction.

The reference has no distributed execution at all — its "comm layer"
is an in-process queue (reference: mimic3_http/synthesis.py:116-133,
SURVEY.md §2.4).  The TPU-native equivalents here:

- one **slice** (chips joined by ICI): a plain local `make_mesh` — XLA
  collectives ride ICI with no extra setup;
- several **hosts/slices** (DCN between them): `jax.distributed`
  coordination, then a mesh whose outer ``dp`` axis spans slices and
  whose inner axes stay intra-slice, so parameter-sized collectives
  stay on ICI and only batch-level traffic crosses DCN.

Serving keeps per-host schedulers; training shards the batch over all
hosts' devices (data parallel) — VITS-low (~20M params) never needs
cross-DCN tensor parallelism.
"""

from __future__ import annotations

import logging
import os
import typing

_LOGGER = logging.getLogger(__name__)


def initialize_distributed(
    coordinator_address: typing.Optional[str] = None,
    num_processes: typing.Optional[int] = None,
    process_id: typing.Optional[int] = None,
) -> bool:
    """Initialize `jax.distributed` when running multi-process.

    Two activation paths:

    - explicit coordinates, via arguments or the
      ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
      ``JAX_PROCESS_ID`` env vars (manual launches, tests);
    - ``MIMIC3_MULTIHOST=1`` with NO coordinates: defer to
      ``jax.distributed.initialize()``'s own cluster auto-detection
      (Cloud TPU pod metadata, Slurm, GKE, ...).  Pod runtimes do not
      set the JAX_* env vars above, so auto-detection is the normal
      path on a real pod; it is opt-in here because on a non-cluster
      machine it fails rather than no-op.

    Returns True when a multi-process runtime is active, False for the
    ordinary single-process case (no-op).  Idempotent.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    auto_detect = os.environ.get("MIMIC3_MULTIHOST", "").strip() in (
        "1", "true", "yes",
    )
    if (
        coordinator_address is None
        and num_processes in (None, 1)
        and not auto_detect
    ):
        return False  # single process: nothing to do

    # pass only what we have; with no kwargs jax auto-detects the
    # cluster environment
    kwargs = {
        key: value
        for key, value in dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        ).items()
        if value is not None
    }
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as err:
        if "already initialized" not in str(err).lower():
            raise
    _LOGGER.info(
        "jax.distributed initialized: process %s/%s",
        jax.process_index(), jax.process_count(),
    )
    return jax.process_count() > 1


def make_global_mesh(
    tp: int = 1,
    dp_outer: typing.Optional[int] = None,
):
    """Mesh over EVERY process's devices for multi-slice training.

    Layout: ``(dp, tp)`` where ``dp`` is ordered so that devices of one
    process/slice are contiguous — with replicated params the only
    cross-slice (DCN) traffic is the gradient psum, and XLA's
    hierarchical reductions do the intra-slice (ICI) part first.

    ``dp_outer`` overrides the data-parallel size; defaults to
    ``total_devices // tp``.
    """
    import jax

    from .mesh import make_mesh

    devices = jax.devices()  # global: all processes' devices, ordered
    # by (process_index, local id) — the contiguity we want
    dp = dp_outer if dp_outer is not None else len(devices) // tp
    return make_mesh(n_devices=dp * tp, dp=dp, tp=tp, devices=devices)


def process_local_batch_slice(
    global_batch: int,
) -> typing.Tuple[int, int]:
    """(start, size) of this process's shard of a global batch.

    Data loaders on each host feed only their slice;
    ``jax.make_array_from_process_local_data`` assembles the global
    array (used by the training CLI when running multi-host).
    """
    import jax

    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return start, per
