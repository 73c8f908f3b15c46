"""``mimic3-train``: train or fine-tune a VITS voice on TPU.

The reference ecosystem trained voices in a separate repo (mimic3-train);
here training is part of the framework.  A voice directory provides
``config.json`` + ``phonemes.txt`` (and optionally ``generator.npz`` to
fine-tune); data is LJSpeech-style ``metadata.csv`` + WAVs.

Runs data-parallel over all visible devices via a (dp, tp) mesh; params
replicated, batch sharded (XLA inserts the gradient psum).  Checkpoints
are orbax pytrees; ``--export`` writes inference weights back to the
voice directory as ``generator.npz``.
"""

from __future__ import annotations

import argparse
import json
import logging
import time
import typing
from pathlib import Path

_LOGGER = logging.getLogger(__name__)


def merge_pretrained(init_params, pretrained):
    """Overlay inference weights onto freshly-initialized training params,
    PRESERVING the training tree's structure.

    generator.npz stores folded conv weights (``weight``), while training
    params are weight-normed (``weight_v``/``weight_g``) — a wholesale
    replace would change the pytree structure and crash the first
    optimizer update.  Where the init tree uses weight norm and the
    pretrained dict has a folded ``weight`` W, re-expand it as
    ``v = W, g = ||W||`` (norm over all axes but the output channel,
    matching layers.conv_weight) so ``g * v / ||v|| == W`` exactly.
    """
    import jax.numpy as jnp

    if not isinstance(init_params, dict) or not isinstance(
        pretrained, dict
    ):
        return pretrained  # leaf (or structure novelty): take pretrained
    out = dict(init_params)
    if "weight_v" in init_params and "weight" in pretrained:
        w = jnp.asarray(pretrained["weight"])
        norm = jnp.sqrt(
            jnp.sum(jnp.square(w), axis=(0, 1), keepdims=True)
        )
        out["weight_v"] = w
        out["weight_g"] = norm
        pretrained = {
            k: v for k, v in pretrained.items() if k != "weight"
        }
    for key, value in pretrained.items():
        out[key] = (
            merge_pretrained(init_params[key], value)
            if key in init_params
            else value
        )
    return out


def main(argv: typing.Optional[typing.Sequence[str]] = None) -> int:
    parser = argparse.ArgumentParser(
        prog="mimic3-train",
        description="Train/fine-tune a VITS voice TPU-natively",
    )
    parser.add_argument(
        "voice_dir",
        help="Voice directory with config.json + phonemes.txt "
        "(+ generator.npz to fine-tune)",
    )
    parser.add_argument("--metadata", required=True,
                        help="metadata.csv (id|text per row)")
    parser.add_argument("--audio-dir", required=True,
                        help="Directory of <id>.wav files")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="Global batch (default: config batch_size)")
    parser.add_argument("--steps", type=int, default=1000)
    parser.add_argument("--checkpoint-dir", default=None)
    parser.add_argument("--checkpoint-every", type=int, default=500)
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the latest checkpoint")
    parser.add_argument("--learning-rate", type=float, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--export", action="store_true",
                        help="Write generator.npz after training")
    parser.add_argument("--log-every", type=int, default=10)
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=logging.DEBUG if args.debug else logging.INFO
    )

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .config import TrainingConfig
    from .models.vits.train import (
        init_train_state,
        make_train_step,
    )
    from .parallel import (
        batch_sharding,
        initialize_distributed,
        make_global_mesh,
        make_mesh,
    )
    from .runtime.dataset import batches, load_metadata, make_frontend

    # multi-host / multi-slice: coordination via jax.distributed when
    # the standard env vars are present (no-op single-process); the
    # mesh then spans every process's devices with slices contiguous
    # on dp, so gradient psums reduce over ICI first and only the
    # cross-slice step rides DCN (SURVEY.md §2.4 comm-backend plan)
    multi_process = initialize_distributed()

    voice_dir = Path(args.voice_dir)
    config = TrainingConfig.load_path(voice_dir / "config.json")
    if args.learning_rate:
        config.learning_rate = args.learning_rate
    if args.seed is not None:
        config.seed = args.seed
    batch_size = args.batch_size or config.batch_size

    n_devices = len(jax.devices())
    if batch_size % n_devices:
        batch_size += n_devices - batch_size % n_devices
        _LOGGER.info("Rounded batch size to %d (devices=%d)",
                     batch_size, n_devices)
    mesh = make_global_mesh() if multi_process else make_mesh()

    _LOGGER.info("Phonemizing dataset...")
    frontend = make_frontend(voice_dir)
    utterances = load_metadata(
        args.metadata,
        args.audio_dir,
        frontend,
        multispeaker=config.model.is_multispeaker,
    )
    if not utterances:
        _LOGGER.error("No usable utterances")
        return 1

    rng = jax.random.PRNGKey(config.seed)
    state = init_train_state(rng, config)

    # fine-tune: overlay existing generator weights
    npz = voice_dir / "generator.npz"
    if npz.is_file():
        from .runtime.convert import load_pytree_npz

        pretrained = jax.tree_util.tree_map(
            jnp.asarray, load_pytree_npz(npz)
        )
        merged = merge_pretrained(dict(state.params), pretrained)
        state = type(state)(
            params=merged,
            disc_params=state.disc_params,
            opt_g=state.opt_g,
            opt_d=state.opt_d,
            step=state.step,
        )
        _LOGGER.info("Fine-tuning from %s", npz)

    ckpt_dir = Path(
        args.checkpoint_dir or (voice_dir / "checkpoints")
    ).absolute()
    ckptr = None
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
    except ImportError:
        _LOGGER.warning("orbax unavailable; checkpointing disabled")

    start_step = 0
    if args.resume and ckptr is not None and ckpt_dir.is_dir():
        steps = sorted(
            int(p.name) for p in ckpt_dir.iterdir()
            if p.name.isdigit()
        )
        if steps:
            start_step = steps[-1]
            restored = ckptr.restore(
                str(ckpt_dir / str(start_step)),
                item=jax.tree_util.tree_map(
                    lambda x: x, state
                ),
            )
            state = restored
            _LOGGER.info("Resumed from step %d", start_step)

    # placement: replicate state, shard batch on dp
    replicated = NamedSharding(mesh, P())
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, replicated), state
    )
    bs = batch_sharding(mesh)

    steps_per_epoch = max(1, len(utterances) // batch_size)
    train_step = jax.jit(
        make_train_step(config, steps_per_epoch=steps_per_epoch)
    )

    data = batches(
        utterances, config, batch_size, seed=config.seed
    )
    _LOGGER.info(
        "Training: %d steps, batch %d, %d device(s)",
        args.steps, batch_size, n_devices,
    )

    if multi_process:
        # every process iterates the SAME deterministic batch stream
        # (same seed) but feeds the device mesh only its own slice;
        # the global array is assembled across hosts
        from .parallel import process_local_batch_slice

        local_start, local_size = process_local_batch_slice(batch_size)

        def place_batch(batch):
            def put(x):
                if hasattr(x, "ndim") and x.ndim >= 1:
                    return jax.make_array_from_process_local_data(
                        bs,
                        np.asarray(
                            x[local_start : local_start + local_size]
                        ),
                        (batch_size,) + tuple(x.shape[1:]),
                    )
                return jax.device_put(x, replicated)

            return jax.tree_util.tree_map(put, batch)
    else:

        def place_batch(batch):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, bs), batch
            )

    t_start = time.time()
    step_rng = jax.random.PRNGKey(config.seed + 1)
    with mesh:
        for step_num in range(start_step, start_step + args.steps):
            batch = place_batch(next(data))
            state, metrics = train_step(
                state, batch, jax.random.fold_in(step_rng, step_num)
            )
            if (step_num + 1) % args.log_every == 0:
                vals = {k: round(float(v), 4) for k, v in metrics.items()}
                rate = (step_num + 1 - start_step) / (
                    time.time() - t_start
                )
                _LOGGER.info(
                    "step %d %s (%.2f steps/s)", step_num + 1, vals, rate
                )
            if (
                ckptr is not None
                and (step_num + 1) % args.checkpoint_every == 0
            ):
                path = ckpt_dir / str(step_num + 1)
                ckptr.save(str(path), state)
                _LOGGER.info("Checkpoint: %s", path)

    # always checkpoint the FINAL step: when the run length isn't a
    # multiple of --checkpoint-every, a later --resume would otherwise
    # silently restart from an earlier step and under-train any segment
    # that builds on this one (fidelity-vs-steps milestones mislabeled)
    final_step = start_step + args.steps
    if ckptr is not None and final_step % args.checkpoint_every != 0:
        path = ckpt_dir / str(final_step)
        ckptr.save(str(path), state)
        _LOGGER.info("Final checkpoint: %s", path)

    if args.export:
        from .runtime.convert import save_pytree_npz
        from .models.vits.layers import fold_weight_norm

        def fold_tree(p):
            if isinstance(p, dict):
                if "weight_v" in p:
                    return fold_weight_norm(p)
                return {k: fold_tree(v) for k, v in p.items()}
            return p

        export_params = {
            k: fold_tree(v)
            for k, v in state.params.items()
            if k != "enc_q"  # posterior encoder is training-only
        }
        import numpy as np

        export_params = jax.tree_util.tree_map(
            lambda x: np.asarray(x), export_params
        )
        save_pytree_npz(voice_dir / "generator.npz", export_params)
        _LOGGER.info("Exported %s", voice_dir / "generator.npz")

    print(json.dumps({"steps": args.steps, "final_step": int(state.step)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
