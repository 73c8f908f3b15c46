#!/usr/bin/env python3
"""TPU comparison: monolithic folded Pallas stage kernel vs plain XLA.

Measures a full HiFi-GAN MRF stage (3 resblocks, kernels 3/7/11,
dilations 1/3/5, mean) at the small-channel late-stage shapes where XLA
is bandwidth-bound through padded lanes (round-1 measurement: stage3
C=32 at ~16 TF/s effective, docs/STATUS.md).

In-graph fori_loops isolate chip time from the tunnel round trip.

Usage: nohup python -u scripts/profile_stage.py > /tmp/stage.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mimic3_tpu.models.vits.hifigan import resblock1
from mimic3_tpu.models.vits.layers import init_conv1d
from mimic3_tpu.ops.stage import hifigan_stage_fused
from mimic3_tpu.runtime.session import enable_compilation_cache

LOOP_N = 8
KERNELS = (3, 7, 11)
DILATIONS = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
B = 16


def make_stage_params(c):
    key = jax.random.PRNGKey(c)
    out = []
    for r, k in enumerate(KERNELS):
        rp = {"convs1": {}, "convs2": {}}
        for j in range(3):
            for s, name in enumerate(("convs1", "convs2")):
                key = jax.random.fold_in(key, r * 16 + j * 2 + s)
                rp[name][str(j)] = init_conv1d(key, c, c, k)
        out.append(rp)
    return jax.device_put(out)


def bench(name, fn, x, ideal_flops):
    try:
        t0 = time.perf_counter()
        float(fn(x))
        compile_s = time.perf_counter() - t0
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            float(fn(x))
        dt = (time.perf_counter() - t0) / reps
        per_stage_ms = dt / LOOP_N * 1000
        print(
            json.dumps(
                {
                    name: {
                        "per_stage_ms": round(per_stage_ms, 2),
                        "effective_tfs": round(
                            ideal_flops / (dt / LOOP_N) / 1e12, 1
                        ),
                        "compile_s": round(compile_s, 1),
                    }
                }
            ),
            flush=True,
        )
        return per_stage_ms
    except Exception as err:  # noqa: BLE001 — record and continue
        print(f"{name} FAILED: {type(err).__name__}: {err}", flush=True)
        return None


def run_shape(c, t):
    print(f"=== stage shape B={B} T={t} C={c} ===", flush=True)
    params = make_stage_params(c)
    rng = np.random.RandomState(0)
    x = jax.device_put(
        jnp.asarray(rng.randn(B, t, c).astype(np.float32)).astype(
            jnp.bfloat16
        )
    )
    taps = sum(2 * 3 * k for k in KERNELS)  # 126
    ideal = 2 * B * t * c * c * taps  # per stage (bench divides by loop)

    @jax.jit
    def xla_loop(x):
        def body(i, acc):
            xi = x + acc * 0.0
            xs = None
            for r, (k, d) in enumerate(zip(KERNELS, DILATIONS)):
                out = resblock1(params[r], xi, k, d)
                xs = out if xs is None else xs + out
            out = xs / len(KERNELS)
            return jnp.sum(out[:, ::4096].astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, LOOP_N, body, 0.0)

    @jax.jit
    def pallas_loop(x):
        def body(i, acc):
            out = hifigan_stage_fused(
                params, x + acc * 0.0, KERNELS, DILATIONS
            )
            return jnp.sum(out[:, ::4096].astype(jnp.float32)) * 1e-9

        return jax.lax.fori_loop(0, LOOP_N, body, 0.0)

    ms_x = bench(f"xla_c{c}", xla_loop, x, ideal)
    ms_p = bench(f"pallas_c{c}", pallas_loop, x, ideal)
    if ms_x and ms_p:
        print(
            f"speedup C={c}: {ms_x / ms_p:.2f}x "
            f"({ms_x:.1f} -> {ms_p:.1f} ms)",
            flush=True,
        )


def main():
    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    # stage3 (the bandwidth-bound one), then stage2
    run_shape(32, 262144)
    run_shape(64, 131072)


if __name__ == "__main__":
    main()
