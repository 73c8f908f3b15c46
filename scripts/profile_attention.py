#!/usr/bin/env python3
"""TPU decision run for the fused Pallas relative attention kernel.

VERDICT r02 weak #3: ops/attention.py was parity-tested (interpret
mode) but default-off and never profiled on-chip.  The decision run
settled it as a NEGATIVE, two ways:

1. The kernel does not even lower for real TPU hardware at serving
   shapes: Mosaic rejects the (1, T) mask block specs for T<128
   ("last two dimensions of your block shape [must be] divisible by
   8 and 128") — the kernel only ever ran in interpret mode.
2. The XLA encoder is a tiny share of the pipeline anyway — this
   script measures it (6 layers, *_low dims, serving buckets,
   in-graph loops): even an infinitely fast attention cannot move
   end-to-end throughput by more than the encoder's ~5% share.

So the serving flag and kernel were removed (docs/STATUS.md round-3
"Pallas attention: negative").  This script keeps the XLA-side
measurement reproducible.

In-graph fori_loops with index-dependent inputs isolate chip time from
the ~25ms tunnel round trip (and stop XLA constant-folding the body).

Usage: nohup python -u scripts/profile_attention.py > /tmp/attn.log 2>&1 &
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from mimic3_tpu.config import ModelConfig
from mimic3_tpu.models.vits.encoder import text_encoder
from mimic3_tpu.models.vits.model import VitsHyperparams, _init_encoder
from mimic3_tpu.models.vits.layers import sequence_mask
from mimic3_tpu.runtime.session import enable_compilation_cache

LOOP_N = 16
B = 16
BUCKETS = (64, 128, 256, 512)


def main() -> int:
    enable_compilation_cache()
    print("device:", jax.devices()[0], flush=True)

    config = ModelConfig(num_symbols=130)  # *_low dims
    hp = VitsHyperparams.from_config(config)
    params = jax.device_put(
        _init_encoder(jax.random.PRNGKey(0), hp)
    )

    results = {}
    for t in BUCKETS:
        rng_np = np.random.RandomState(t)
        ids = jnp.asarray(
            rng_np.randint(1, 130, (B, t)), jnp.int32
        )
        lengths = jnp.asarray(
            rng_np.randint(t // 2, t + 1, (B,)), jnp.int32
        )
        x_mask = sequence_mask(lengths, t)

        def run():
            @jax.jit
            def loop(params, ids, x_mask):
                def body(i, acc):
                    # index-dependent input: fold i into the ids so XLA
                    # cannot hoist the body out of the loop
                    ids_i = jnp.where(ids > 0, (ids + i) % 129 + 1, 0)
                    x, m_p, logs_p = text_encoder(
                        params, ids_i, x_mask,
                        n_layers=hp.n_layers, n_heads=hp.n_heads,
                        kernel_size=hp.kernel_size,
                    )
                    return acc + jnp.sum(m_p[:, :: 64, :: 8])

                return jax.lax.fori_loop(0, LOOP_N, body, 0.0)

            t0 = time.perf_counter()
            float(loop(params, ids, x_mask))
            compile_s = time.perf_counter() - t0
            reps = 3
            t0 = time.perf_counter()
            for _ in range(reps):
                float(loop(params, ids, x_mask))
            dt = (time.perf_counter() - t0) / reps
            return dt / LOOP_N * 1000, compile_s

        xla_ms, xla_c = run()
        results[f"T{t}"] = {
            "xla_ms": round(xla_ms, 3),
            "compile_s": round(xla_c, 1),
        }
        print(json.dumps({f"T{t}": results[f"T{t}"]}), flush=True)

    print(json.dumps({"batch": B, "encoder": results}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
