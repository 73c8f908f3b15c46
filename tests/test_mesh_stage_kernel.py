"""dp-sharded decode with the fused Pallas stage kernel via shard_map.

The fused MRF-stage kernel (ops/stage.py) cannot be partitioned by
XLA's SPMD partitioner, so it used to auto-disable under any dp>1 mesh
— multi-chip serving lost the headline vocoder win.  The session now
routes the batched decode through ``jax.shard_map`` over the dp axis:
prior noise is generated GLOBALLY (frame-indexed, XLA-partitioned) and
sliced per shard, params are replicated, and each device executes the
kernel on its local batch rows exactly as a single chip would
(runtime/session.py dec_fn_sharded).

These tests run that path on the 8 virtual CPU devices (Pallas
interpret mode — no TPU needed) and require agreement with both the
unsharded kernel path and the mesh XLA (no-kernel) path, plus proof the
kernel actually engaged (a silent fallback would pass any parity test).

The reference has no multi-device analog (it scales with Python worker
threads, mimic3_http/__main__.py:53-61); this is TPU-native extension
territory per SURVEY.md §2.4.
"""

import copy

import numpy as np
import pytest

from mimic3_tpu.config import TrainingConfig
from mimic3_tpu.parallel import make_mesh
from mimic3_tpu.runtime.session import VitsSession
from mimic3_tpu.runtime.testvoice import create_test_voice
from mimic3_tpu.runtime.voice import _load_voice_params

# 32 sequences -> local batch 4 on dp=8, enough to clear the kernel's
# batch>=4 engagement gate inside each shard
RNG = np.random.RandomState(5)
SEQS = [
    [int(v) for v in RNG.randint(1, 40, RNG.randint(3, 12))]
    for _ in range(32)
]
SYNTH_KW = dict(noise_scale=0.667, noise_w=0.8, seed=17)


@pytest.fixture(scope="module")
def voice(tmp_path_factory):
    d = tmp_path_factory.mktemp("kern_voices") / "en_US" / "test_low"
    create_test_voice(d, full_size=False)
    tc = TrainingConfig.load_path(d / "config.json")
    params = _load_voice_params(d)
    return tc, params


def _make_session(voice, *, dp=None, tp=1, pallas=0):
    tc_base, params = voice
    tc = copy.deepcopy(tc_base)
    tc.tpu.pallas_stage_max_channels = pallas
    tc.tpu.text_buckets = (16,)
    tc.tpu.frame_buckets = (64,)
    tc.tpu.batch_buckets = (32,)
    tc.tpu.speculative_decode = False
    mesh = make_mesh(dp=dp, tp=tp) if dp else None
    # deterministic=True -> f32 decoder: comparisons are not
    # confounded by bf16 rounding
    return VitsSession(tc, params, deterministic=True, mesh=mesh)


def test_mesh_kernel_engages_and_matches(voice, monkeypatch):
    import mimic3_tpu.ops.stage as stage_mod

    calls = []
    real = stage_mod.hifigan_stage_fused

    def counting(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(stage_mod, "hifigan_stage_fused", counting)

    kernel8 = _make_session(voice, dp=8, pallas=32)
    assert kernel8._kernel_model is not None
    out_k8 = kernel8.synthesize_ids_batch(SEQS, **SYNTH_KW)
    n_mesh_calls = len(calls)
    # 128-initial-channel voice: stages 32/16/8 fuse (64 does not)
    assert n_mesh_calls >= 3, "kernel never engaged under the dp mesh"

    kernel1 = _make_session(voice, pallas=32)
    out_k1 = kernel1.synthesize_ids_batch(SEQS, **SYNTH_KW)
    assert len(calls) > n_mesh_calls

    plain8 = _make_session(voice, dp=8, pallas=0)
    out_p8 = plain8.synthesize_ids_batch(SEQS, **SYNTH_KW)
    assert len(out_k8) == len(out_k1) == len(out_p8) == len(SEQS)

    for k8, k1, p8 in zip(out_k8, out_k1, out_p8):
        # sharding must not change the kernel path: global noise is
        # sliced per shard, so dp=8 and single-device agree to float
        # tolerance (durations pass through XLA partitioning)
        assert k8.shape == k1.shape == p8.shape
        np.testing.assert_allclose(k8, k1, atol=2e-5, rtol=0)
        # kernel vs plain-XLA tolerance as in test_stage_kernel.py
        np.testing.assert_allclose(k8, p8, atol=2e-4, rtol=1e-3)


def test_tp_mesh_keeps_kernel_off(voice):
    """tp shards the wide weights, which the folded kernel does not
    support — the capability gate must refuse, even when the config
    explicitly requests the kernel."""
    session = _make_session(voice, dp=4, tp=2, pallas=32)
    assert session._kernel_model is None
    # plain model under a mesh must never reach pallas_call either
    assert session.model.pallas_stage_max_channels == 0
