#!/usr/bin/env python3
"""Current-state pipeline breakdown at serving shapes (batch 16).

Times each pipeline component in an in-graph fori_loop (isolates chip
time from the ~25 ms/call tunnel round trip; completion is forced by
fetching a tiny on-device reduction — ``block_until_ready`` is
unreliable over the axon tunnel):

  dur      duration pass (encoder + SDP reverse)  — the host-sync stage
  enc      text encoder alone
  decode   full decode_frames (expand + flow inverse + HiFi-GAN)
  vocoder  HiFi-GAN generator alone from a fixed latent
  flowpart decode minus vocoder (expand + prior sample + flow inverse)

Usage: nohup python -u scripts/profile_pipeline.py > /tmp/pipe.log 2>&1 &
"""

import argparse
import json
import time

LOOP_N = 8


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--phonemes", type=int, default=128)
    parser.add_argument("--frames", type=int, default=1024)
    parser.add_argument("--no-pallas-stage", action="store_true")
    parser.add_argument("--reps", type=int, default=3)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mimic3_tpu.config import ModelConfig
    from mimic3_tpu.models.vits import VitsModel, init_vits_params
    from mimic3_tpu.models.vits.hifigan import hifigan_generator
    from mimic3_tpu.runtime.session import enable_compilation_cache

    enable_compilation_cache()
    print(f"device: {jax.devices()[0]}", flush=True)

    config = ModelConfig(num_symbols=130)
    pallas_stage = (
        0
        if args.no_pallas_stage or jax.default_backend() != "tpu"
        else 32
    )
    model = VitsModel(
        config,
        decoder_dtype=jnp.bfloat16,
        pallas_stage_max_channels=pallas_stage,
    )
    params = jax.device_put(
        init_vits_params(jax.random.PRNGKey(0), config)
    )
    hp = model.hp

    rng_np = np.random.RandomState(0)
    ids = jnp.asarray(
        rng_np.randint(1, 130, (args.batch, args.phonemes)), jnp.int32
    )
    lengths = jnp.full((args.batch,), args.phonemes, jnp.int32)
    rng = jax.random.PRNGKey(1)
    length_scale = float(args.frames) / args.phonemes

    def loop(body):
        # params pass through the jit boundary as a real argument so
        # weights are runtime parameters, not embedded constants
        @jax.jit
        def run(params, key):
            def step(i, acc):
                return acc + body(params, jax.random.fold_in(key, i))

            return jax.lax.fori_loop(0, LOOP_N, step, 0.0)

        return run

    def bench(name, run, flops=None):
        t0 = time.perf_counter()
        float(run(params, rng))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for r in range(args.reps):
            float(run(params, jax.random.fold_in(rng, 100 + r)))
        ms = (
            (time.perf_counter() - t0) / (args.reps * LOOP_N) * 1000
        )
        entry = {"ms": round(ms, 2), "compile_s": round(compile_s, 1)}
        if flops:
            entry["tf_s"] = round(flops / (ms / 1000) / 1e12, 1)
        print(json.dumps({name: entry}), flush=True)
        return ms

    # 1. duration pass
    def dur_body(params, key):
        durations, totals = model.infer_durations(
            params, ids, lengths, key,
            jnp.float32(length_scale), jnp.float32(0.8),
        )
        return jnp.sum(totals.astype(jnp.float32))

    dur_ms = bench("dur_pass", loop(dur_body))

    # 2. encoder alone
    from mimic3_tpu.models.vits.layers import sequence_mask

    x_mask = sequence_mask(lengths, ids.shape[1])

    def enc_body(params, key):
        # key-dependent input so XLA cannot hoist the body out of the
        # timing loop (a constant-input encoder is loop-invariant)
        shift = jax.random.randint(key, (), 0, args.phonemes)
        ids_i = jnp.roll(ids, shift, axis=1)
        _x, m_p, logs_p = model.encode(params, ids_i, x_mask)
        return jnp.sum(m_p[:, ::64, 0].astype(jnp.float32))

    bench("encoder", loop(enc_body))

    # fixed durations for the decode benchmarks
    durations, _tot = jax.jit(model.infer_durations)(
        params, ids, lengths, rng,
        jnp.float32(length_scale), jnp.float32(0.8),
    )
    durations = jax.block_until_ready(durations)

    # 3. full decode
    def dec_body(params, key):
        audio, sl = model.decode_frames(
            params, ids, lengths, durations, args.frames, key,
            jnp.float32(0.667),
        )
        return jnp.sum(audio[:, ::4096].astype(jnp.float32))

    dec_ms = bench("decode_full", loop(dec_body))

    # 4. vocoder alone from a per-iteration latent (keeps the body
    # loop-variant; the normal() is ~free next to the vocoder)
    def voc_body(params, key):
        z = jax.random.normal(
            key,
            (args.batch, args.frames, hp.inter_channels),
            jnp.float32,
        )
        audio = hifigan_generator(
            params["dec"], z,
            resblock_type=hp.resblock,
            resblock_kernel_sizes=hp.resblock_kernel_sizes,
            resblock_dilation_sizes=hp.resblock_dilation_sizes,
            upsample_rates=hp.upsample_rates,
            upsample_kernel_sizes=hp.upsample_kernel_sizes,
            compute_dtype=jnp.bfloat16,
            pallas_stage_max_channels=pallas_stage,
        )
        return jnp.sum(audio[:, ::4096].astype(jnp.float32))

    voc_ms = bench("vocoder", loop(voc_body))

    # 5. combined step exactly like bench.py's pipeline_loop (dur pass
    # feeding decode) — cross-checks the standalone components
    def step_body(params, key):
        durs, totals = model.infer_durations(
            params, ids, lengths, key,
            jnp.float32(length_scale), jnp.float32(0.8),
        )
        audio, sl = model.decode_frames(
            params, ids, lengths, durs, args.frames, key,
            jnp.float32(0.667),
        )
        return jnp.sum(audio[:, ::4096].astype(jnp.float32))

    step_ms = bench("full_step", loop(step_body))

    print(
        json.dumps(
            {
                "summary": {
                    "dur_pass_ms": round(dur_ms, 2),
                    "decode_ms": round(dec_ms, 2),
                    "vocoder_ms": round(voc_ms, 2),
                    "expand_flow_sample_ms": round(dec_ms - voc_ms, 2),
                    "full_step_ms": round(step_ms, 2),
                    "component_sum_ms": round(dur_ms + dec_ms, 2),
                    "pallas_stage": pallas_stage,
                }
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
