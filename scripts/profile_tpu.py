#!/usr/bin/env python3
"""One-process TPU profiling suite for mimic3-tpu.

Runs the measurements that matter in priority order, logging each result
as soon as it lands (the axon remote-compile service can be minutes-slow
per executable, so order matters and partial output is still useful):

1. decode stage (the FLOPs hot spot), XLA vs Pallas resblocks
2. duration stage
3. batch scaling of the decode
4. conv lowering microbenchmarks (NWC conv vs per-tap matmul)

Timing is forced by fetching a small on-device reduction per call —
``block_until_ready`` is unreliable over the axon tunnel.

Usage: nohup python -u scripts/profile_tpu.py > /tmp/profile_tpu.log 2>&1 &
"""

import argparse
import json
import time

RESULTS = {}


def log(name, **kw):
    RESULTS[name] = kw
    print(json.dumps({name: kw}), flush=True)


def timed(fn, *args, n=5):
    t0 = time.perf_counter()
    fn(*args)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        fn(*args)
    return compile_s, (time.perf_counter() - t0) / n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=1024)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--phonemes", type=int, default=128)
    parser.add_argument("--skip-pallas", action="store_true")
    parser.add_argument("--skip-micro", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mimic3_tpu.config import ModelConfig
    from mimic3_tpu.models.vits import VitsModel, init_vits_params
    from mimic3_tpu.runtime.session import enable_compilation_cache

    enable_compilation_cache()
    print("devices:", jax.devices(), flush=True)
    rng_np = np.random.RandomState(0)

    config = ModelConfig(num_symbols=130)
    params = jax.device_put(
        init_vits_params(jax.random.PRNGKey(0), config)
    )
    B, P, F = args.batch, args.phonemes, args.frames
    hop = 256
    ids = jax.device_put(
        jnp.asarray(rng_np.randint(1, 130, (B, P)), jnp.int32)
    )
    lengths = jax.device_put(jnp.full((B,), P, jnp.int32))
    durations = jax.device_put(
        jnp.full((B, P), F // P, jnp.int32)
    )
    rng = jax.random.PRNGKey(1)
    print("inputs placed", flush=True)

    def make_decode(stage_max_channels):
        model = VitsModel(
            config, decoder_dtype=jnp.bfloat16,
            pallas_stage_max_channels=stage_max_channels,
        )

        @jax.jit
        def dec(params, ids, lengths, durations, rng):
            audio, alen = model.decode_frames(
                params, ids, lengths, durations, F, rng,
                jnp.float32(0.667),
            )
            return jnp.sum(audio[:, ::4096].astype(jnp.float32)), alen

        return lambda *a: float(dec(*a)[0])

    # 1. decode XLA
    dec_xla = make_decode(0)
    compile_s, dt = timed(dec_xla, params, ids, lengths, durations, rng)
    audio_sec = B * F * hop / 22050
    log(
        "decode_xla",
        compile_s=round(compile_s, 1),
        ms=round(dt * 1000, 2),
        audio_sec_per_sec=round(audio_sec / dt, 1),
    )

    # 2. decode with the fused stage kernel (ops/stage.py)
    if not args.skip_pallas:
        try:
            dec_pl = make_decode(32)
            compile_s, dt = timed(
                dec_pl, params, ids, lengths, durations, rng
            )
            log(
                "decode_pallas",
                compile_s=round(compile_s, 1),
                ms=round(dt * 1000, 2),
                audio_sec_per_sec=round(audio_sec / dt, 1),
            )
        except Exception as err:
            log("decode_pallas", error=str(err)[:500])

    # 3. duration stage
    model = VitsModel(config, decoder_dtype=jnp.bfloat16)

    @jax.jit
    def dur(params, ids, lengths, rng):
        d, totals = model.infer_durations(
            params, ids, lengths, rng, jnp.float32(1.0),
            jnp.float32(0.8),
        )
        return jnp.sum(totals)

    compile_s, dt = timed(
        lambda *a: float(dur(*a)), params, ids, lengths, rng
    )
    log("durations", compile_s=round(compile_s, 1),
        ms=round(dt * 1000, 2))

    # 4. batch scaling (reuse decode executable shapes where possible)
    for b2 in (1, 4, 16):
        if b2 == B:
            continue
        ids2 = jax.device_put(
            jnp.asarray(rng_np.randint(1, 130, (b2, P)), jnp.int32)
        )
        lengths2 = jax.device_put(jnp.full((b2,), P, jnp.int32))
        dur2 = jax.device_put(jnp.full((b2, P), F // P, jnp.int32))
        try:
            compile_s, dt = timed(
                dec_xla, params, ids2, lengths2, dur2, rng, n=3
            )
            log(
                f"decode_xla_b{b2}",
                compile_s=round(compile_s, 1),
                ms=round(dt * 1000, 2),
                audio_sec_per_sec=round(b2 * F * hop / 22050 / dt, 1),
            )
        except Exception as err:
            log(f"decode_xla_b{b2}", error=str(err)[:300])

    # 5. conv lowering microbenchmarks
    if not args.skip_micro:
        Bc, Tc, Cc, Kc = 4, 65536, 128, 3
        x = jax.device_put(
            jnp.asarray(
                rng_np.randn(Bc, Tc, Cc).astype(np.float32)
            ).astype(jnp.bfloat16)
        )
        w = jax.device_put(
            jnp.asarray(
                rng_np.randn(Kc, Cc, Cc).astype(np.float32)
            ).astype(jnp.bfloat16)
        )
        flops = 2 * Bc * Tc * Cc * Cc * Kc

        @jax.jit
        def conv_nwc(x, w):
            out = jax.lax.conv_general_dilated(
                x, w, (1,), [(1, 1)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            return jnp.sum(out[:, ::997].astype(jnp.float32))

        @jax.jit
        def conv_taps(x, w):
            xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
            acc = jnp.zeros((Bc, Tc, Cc), jnp.float32)
            for j in range(Kc):
                acc += jnp.dot(
                    xp[:, j : j + Tc], w[j],
                    preferred_element_type=jnp.float32,
                )
            return jnp.sum(acc[:, ::997])

        for name, fn in (("conv_nwc", conv_nwc), ("conv_taps", conv_taps)):
            compile_s, dt = timed(lambda *a: float(fn(*a)), x, w)
            log(
                name,
                compile_s=round(compile_s, 1),
                ms=round(dt * 1000, 2),
                tflops=round(flops / dt / 1e12, 1),
            )

    print("ALL RESULTS:", json.dumps(RESULTS), flush=True)


if __name__ == "__main__":
    main()
