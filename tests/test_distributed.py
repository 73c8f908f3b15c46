"""Multi-host initialization glue (parallel/distributed.py).

The two-process test runs REAL `jax.distributed` coordination over
localhost with CPU devices — the same code path a TPU pod/multi-slice
deployment takes over DCN (SURVEY.md §2.4 comm-backend plan).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

from mimic3_tpu.parallel import (
    initialize_distributed,
    make_global_mesh,
    process_local_batch_slice,
)


def test_single_process_is_noop():
    for var in (
        "JAX_COORDINATOR_ADDRESS", "JAX_NUM_PROCESSES", "JAX_PROCESS_ID"
    ):
        assert os.environ.get(var) is None
    assert initialize_distributed() is False


def test_global_mesh_single_process():
    mesh = make_global_mesh()
    assert mesh.shape["dp"] == 8  # conftest: 8 virtual cpu devices
    assert mesh.shape["tp"] == 1


def test_local_batch_slice_single_process():
    assert process_local_batch_slice(16) == (0, 16)


_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=4"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from mimic3_tpu.parallel import (
        initialize_distributed, make_global_mesh,
        process_local_batch_slice, batch_sharding,
    )

    assert initialize_distributed() is True
    assert jax.process_count() == 2
    mesh = make_global_mesh()
    assert mesh.shape["dp"] == 8  # 2 processes x 4 devices

    # global batch assembled from process-local shards; psum-style
    # global reduction must see every shard
    start, size = process_local_batch_slice(8)
    local = np.arange(start, start + size, dtype=np.float32)
    arr = jax.make_array_from_process_local_data(
        batch_sharding(mesh), local.reshape(size), (8,)
    )
    total = jax.jit(
        lambda x: jnp.sum(x), out_shardings=None
    )(arr)
    np.testing.assert_allclose(float(total), sum(range(8)))
    print(f"proc {jax.process_index()} ok", flush=True)
    """
)


_INFER_WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=1"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from mimic3_tpu.config import TrainingConfig
    from mimic3_tpu.parallel import (
        initialize_distributed, make_global_mesh,
    )
    from mimic3_tpu.runtime.session import VitsSession
    from mimic3_tpu.runtime.voice import _load_voice_params

    voice_dir, ref_npz = sys.argv[1], sys.argv[2]
    assert initialize_distributed() is True
    assert jax.process_count() == 2
    mesh = make_global_mesh()  # 2 processes x 1 device -> dp=2
    assert mesh.shape["dp"] == 2

    tc = TrainingConfig.load_path(voice_dir + "/config.json")
    tc.tpu.text_buckets = (16,)
    tc.tpu.frame_buckets = (64,)
    tc.tpu.batch_buckets = (4,)
    tc.tpu.speculative_decode = False
    session = VitsSession(
        tc, _load_voice_params(__import__("pathlib").Path(voice_dir)),
        deterministic=True, mesh=mesh,
    )
    seqs = [[1, 5, 9, 2, 7, 3], [4, 4, 8, 1], [2, 9, 9, 9, 5], [7, 1]]
    out = session.synthesize_ids_batch(
        seqs, noise_scale=0.667, noise_w=0.8, seed=3
    )
    ref = np.load(ref_npz)
    for i, audio in enumerate(out):
        expected = ref[f"ref_{i}"]
        assert audio.shape == expected.shape, (
            f"seq {i}: {audio.shape} != {expected.shape}"
        )
        np.testing.assert_allclose(
            audio, expected, atol=2e-5, rtol=0,
            err_msg=f"seq {i} diverged from single-process audio",
        )
    print(f"proc {jax.process_index()} infer ok", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_dp2_inference(tmp_path):
    """An ACTUAL dp=2 sharded infer across two ``jax.distributed`` CPU
    processes produces the same audio as a plain single-process run —
    the comm backend carries real synthesis, not just coordination
    (SURVEY.md §2.4 comm-backend row)."""
    import numpy as np

    from mimic3_tpu.config import TrainingConfig
    from mimic3_tpu.runtime.session import VitsSession
    from mimic3_tpu.runtime.testvoice import create_test_voice
    from mimic3_tpu.runtime.voice import _load_voice_params

    voice_dir = tmp_path / "en_US" / "test_low"
    create_test_voice(voice_dir, full_size=False)
    tc = TrainingConfig.load_path(voice_dir / "config.json")
    tc.tpu.text_buckets = (16,)
    tc.tpu.frame_buckets = (64,)
    tc.tpu.batch_buckets = (4,)
    tc.tpu.speculative_decode = False
    single = VitsSession(
        tc, _load_voice_params(voice_dir), deterministic=True
    )
    seqs = [[1, 5, 9, 2, 7, 3], [4, 4, 8, 1], [2, 9, 9, 9, 5], [7, 1]]
    ref = single.synthesize_ids_batch(
        seqs, noise_scale=0.667, noise_w=0.8, seed=3
    )
    ref_npz = tmp_path / "ref.npz"
    np.savez(ref_npz, **{f"ref_{i}": a for i, a in enumerate(ref)})

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    worker = tmp_path / "infer_worker.py"
    worker.write_text(_INFER_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=os.pathsep.join(
                [os.path.dirname(os.path.dirname(__file__))]
                + env.get("PYTHONPATH", "").split(os.pathsep)
            ),
        )
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, str(worker),
                    str(voice_dir), str(ref_npz),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} infer ok" in out


@pytest.mark.slow
def test_two_process_coordination(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=os.pathsep.join(
                [os.path.dirname(os.path.dirname(__file__))]
                + env.get("PYTHONPATH", "").split(os.pathsep)
            ),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(worker)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} ok" in out
