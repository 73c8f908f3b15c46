"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests must not touch TPU hardware (the axon TPU tunnel makes eager
dispatch pathologically slow); multi-chip sharding is validated on
host-platform virtual devices.

Note: this machine's sitecustomize registers the axon TPU backend at
interpreter start and pins ``jax_platforms=axon``, so the env var alone
is not enough — we override via ``jax.config`` after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
