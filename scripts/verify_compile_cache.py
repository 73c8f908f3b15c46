#!/usr/bin/env python3
"""Verify the persistent XLA compile cache: cold vs warm process timing.

Round-1 flagged the cache read path as only "suspected" healthy
(docs/STATUS.md).  This measures the same fixed jit compile in two
fresh subprocesses sharing one cache directory and reports both times.

Usage: nohup python -u scripts/verify_compile_cache.py > /tmp/cache.log 2>&1 &
"""

import json
import os
import subprocess
import sys
import tempfile
import time

INNER = "_MIMIC3_CACHE_INNER"


def inner() -> None:
    import jax
    import jax.numpy as jnp

    from mimic3_tpu.config import ModelConfig
    from mimic3_tpu.models.vits import VitsModel, init_vits_params
    from mimic3_tpu.runtime.session import enable_compilation_cache

    enable_compilation_cache()
    config = ModelConfig(num_symbols=130)
    model = VitsModel(config, decoder_dtype=jnp.bfloat16)
    params = jax.device_put(
        init_vits_params(jax.random.PRNGKey(0), config)
    )
    ids = jnp.ones((2, 64), jnp.int32)
    lengths = jnp.full((2,), 64, jnp.int32)

    @jax.jit
    def dur(params, ids, lengths, rng):
        return model.infer_durations(
            params, ids, lengths, rng, jnp.float32(1.0),
            jnp.float32(0.8),
        )

    t0 = time.perf_counter()
    durations, totals = dur(params, ids, lengths, jax.random.PRNGKey(1))
    float(jnp.sum(totals))  # force completion (block is unreliable)
    print(
        json.dumps(
            {"compile_plus_run_s": round(time.perf_counter() - t0, 2)}
        ),
        flush=True,
    )


def main() -> None:
    cache_dir = os.environ.get(
        "MIMIC3_COMPILE_CACHE",
        tempfile.mkdtemp(prefix="mimic3_cache_probe_"),
    )
    env = dict(os.environ)
    env["MIMIC3_COMPILE_CACHE"] = cache_dir
    env[INNER] = "1"
    times = []
    for label in ("cold", "warm"):
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        wall = time.perf_counter() - t0
        print(f"{label}: rc={out.returncode} wall={wall:.1f}s "
              f"inner={out.stdout.strip().splitlines()[-1:]}",
              flush=True)
        if out.returncode != 0:
            print(out.stderr[-2000:], flush=True)
            return
        times.append(wall)
        n_entries = len(os.listdir(cache_dir))
        print(f"cache entries after {label}: {n_entries}", flush=True)
    print(
        json.dumps(
            {
                "cache_dir": cache_dir,
                "cold_s": round(times[0], 1),
                "warm_s": round(times[1], 1),
                "speedup": round(times[0] / max(times[1], 0.1), 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    if os.environ.get(INNER) == "1":
        inner()
    else:
        main()
