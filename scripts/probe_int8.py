#!/usr/bin/env python3
"""Probe: does int8 matmul beat bf16 on this chip at HiFi-GAN shapes?

v5e's MXU advertises 2x int8 throughput vs bf16. If XLA lowers
s8 x s8 -> s32 dot_general to that mode, quantized decoder stages could
roughly halve the compute-bound early-stage time. This probe measures
raw dot_general rates at the stage shapes before any framework work.

Usage: nohup python -u scripts/probe_int8.py > /tmp/int8.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mimic3_tpu.runtime.session import enable_compilation_cache

LOOP_N = 16


def bench(name, m, k, n, dtype, acc_dtype):
    rng = np.random.RandomState(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.randint(-127, 127, (m, k)), jnp.int8)
        b = jnp.asarray(rng.randint(-127, 127, (k, n)), jnp.int8)
    else:
        a = jnp.asarray(rng.randn(m, k), dtype)
        b = jnp.asarray(rng.randn(k, n), dtype)

    @jax.jit
    def loop(a, b):
        def body(i, acc):
            # i-dependent operand so XLA cannot hoist the dot out of
            # the loop (first probe run measured identical times for
            # every shape/dtype — the matmul had been loop-hoisted)
            a_i = jax.lax.dynamic_update_index_in_dim(
                a, a[0] + i.astype(a.dtype), 0, axis=0
            )
            c = jax.lax.dot_general(
                a_i, b,
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            return acc + jnp.sum(c[::4096, ::128].astype(jnp.float32))

        return jax.lax.fori_loop(0, LOOP_N, body, 0.0)

    t0 = time.perf_counter()
    float(loop(a, b))
    compile_s = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(loop(a, b))
    ms = (time.perf_counter() - t0) / (reps * LOOP_N) * 1000
    tf_s = 2 * m * k * n / (ms / 1000) / 1e12
    print(
        json.dumps(
            {
                name: {
                    "ms": round(ms, 3),
                    "tops": round(tf_s, 1),
                    "compile_s": round(compile_s, 1),
                }
            }
        ),
        flush=True,
    )


def main() -> int:
    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)
    # stage1-ish shape: 65k positions x 128 channels (one conv tap)
    for m, k, n in ((65536, 128, 128), (8192, 256, 256), (4096, 512, 512)):
        bench(f"bf16_{m}x{k}x{n}", m, k, n, jnp.bfloat16, jnp.float32)
        bench(f"int8_{m}x{k}x{n}", m, k, n, jnp.int8, jnp.int32)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
