#!/usr/bin/env python3
"""Focused TPU comparison: fused Pallas resblock sub-block vs plain XLA.

Small executables (fast remote compiles) on HiFi-GAN stage-2 shapes —
the decode stack's dominant cost.  In-graph loops isolate chip time from
tunnel latency.

Usage: nohup python -u scripts/profile_resblock.py > /tmp/resblock.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mimic3_tpu.models.vits.hifigan import resblock1
from mimic3_tpu.models.vits.layers import init_conv1d
from mimic3_tpu.ops.resblock import fused_resblock_subblock
from mimic3_tpu.runtime.session import enable_compilation_cache

LOOP_N = 16


def main():
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)

    # HiFi-GAN stage-2 shape for batch 16 x 1024 frames
    B, T, C, K, D = 16, 65536, 128, 3, 5
    rng = np.random.RandomState(0)
    x = jax.device_put(
        jnp.asarray(rng.randn(B, T, C).astype(np.float32)).astype(
            jnp.bfloat16
        )
    )
    key = jax.random.PRNGKey(0)
    p1 = jax.device_put(init_conv1d(key, C, C, K))
    p2 = jax.device_put(init_conv1d(jax.random.fold_in(key, 1), C, C, K))
    params = {"convs1": {"0": p1}, "convs2": {"0": p2}}
    print("inputs placed", flush=True)

    flops = 2 * 2 * B * T * C * C * K * LOOP_N  # 2 convs per subblock

    @jax.jit
    def xla_loop(x):
        def body(i, acc):
            out = resblock1(params, x + acc * 0.0, K, [D])
            return jnp.sum(out[:, :: 4096].astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, LOOP_N, body, 0.0)

    @jax.jit
    def pallas_loop(x):
        def body(i, acc):
            out = fused_resblock_subblock(
                x + acc * 0.0,
                p1["weight"], p1["bias"], p2["weight"], p2["bias"],
                kernel_size=K, dilation=D,
            )
            return jnp.sum(out[:, :: 4096].astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, LOOP_N, body, 0.0)

    for name, fn in (("xla", xla_loop), ("pallas", pallas_loop)):
        try:
            t0 = time.perf_counter()
            float(fn(x))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                float(fn(x))
            dt = (time.perf_counter() - t0) / reps
            per_block = dt / LOOP_N * 1000
            print(
                json.dumps(
                    {
                        name: {
                            "compile_s": round(compile_s, 1),
                            "ms_per_subblock": round(per_block, 2),
                            "tflops": round(flops / dt / 1e12, 1),
                        }
                    }
                ),
                flush=True,
            )
        except Exception as err:
            print(json.dumps({name: {"error": str(err)[:400]}}),
                  flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
