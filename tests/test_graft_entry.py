"""Graft entry points: trace-level validation (no compiles — the full
compile check is the driver's job; eval_shape catches signature/shape
bugs in seconds)."""

import sys
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_entry_traces():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    audio_shape, lengths_shape = out
    assert audio_shape.shape == (1, 256 * 256)  # max_frames * hop
    assert lengths_shape.shape == (1,)


def test_dryrun_multichip_2dev_executes():
    """Run the driver's REAL multi-chip entry point at n=2 (cheap: no
    8-way rendezvous, two staged subprocesses) so a regression in the
    orchestration or the staged inner paths is caught inside the suite
    instead of at round end (VERDICT r04 item 8)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(2)


def test_dryrun_builds_state():
    """The dry run's pieces assemble on a tiny mesh without running the
    step (the driver executes the real one)."""
    from mimic3_tpu.config import ModelConfig, TrainingConfig
    from mimic3_tpu.models.vits.train import (
        init_train_state,
        make_train_step,
    )
    from mimic3_tpu.parallel import make_mesh

    mesh = make_mesh(n_devices=8, tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}

    config = TrainingConfig()
    config.model = ModelConfig(
        num_symbols=40, n_layers=1, hidden_channels=32,
        inter_channels=32, filter_channels=64,
        upsample_initial_channel=64,
    )
    config.segment_size = 2048
    state = init_train_state(jax.random.PRNGKey(0), config)
    step = make_train_step(config)
    assert callable(step)
    assert int(state.step) == 0
