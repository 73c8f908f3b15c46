"""Batched continuation decode (one device call per window per GROUP).

Streams that started in one fused ``stream_start_batch`` call decode
their continuation windows through a shared demand-paced driver thread
instead of per-stream batch-1 calls — under sustained concurrent
streaming, batch-1 continuations serialize on the device (the round-3
c16 latency cliff).  Audio must be bit-identical to the per-row path.
"""

import time

import numpy as np
import pytest

import mimic3_tpu.runtime.session as rt_session
from mimic3_tpu.runtime.testvoice import create_test_voice
from mimic3_tpu.runtime.voice import TpuVoice


@pytest.fixture(scope="module")
def voice(tmp_path_factory):
    d = tmp_path_factory.mktemp("cont_voices") / "en_US" / "test_low"
    create_test_voice(d, full_size=False)
    return TpuVoice.load_from_directory(d)


KW = dict(
    noise_scale=0.667, noise_w=0.8, seed=11,
    chunk_frames=16, overlap=8, first_chunk_frames=8,
)


def _seqs(voice):
    return [
        voice.phonemes_to_ids(
            [list(w) for w in "a considerably longer first stream".split()]
        ),
        voice.phonemes_to_ids([list("short"), list("one")]),
    ]


def test_continuations_dispatch_batched(voice):
    """Every continuation window of a batched start runs at the group's
    batch size — no batch-1 dispatches."""
    session = voice.session
    seqs = _seqs(voice)
    orig = session._dec_chunk_fn
    batch_dims = []

    def spy(params, ids, *args, **kwargs):
        batch_dims.append(int(ids.shape[0]))
        return orig(params, ids, *args, **kwargs)

    session._dec_chunk_fn = spy
    try:
        gens = session.stream_start_batch(seqs, **KW)
        outs = [np.concatenate(list(g)) for g in gens]
    finally:
        session._dec_chunk_fn = orig
    assert batch_dims, "no continuation windows decoded"
    assert all(b >= 2 for b in batch_dims), batch_dims
    # windows cover the longest row exactly once each
    totals = [len(o) // session.model.hp.hop_length for o in outs]
    longest = max(totals)
    expected = -(-(longest - KW["first_chunk_frames"]) // KW["chunk_frames"])
    assert len(batch_dims) == expected, (batch_dims, totals)


def test_batched_continuations_match_solo(voice):
    session = voice.session
    seqs = _seqs(voice)
    gens = session.stream_start_batch(seqs, **KW)
    batched = [np.concatenate(list(g)) for g in gens]
    for seq, got in zip(seqs, batched):
        solo = np.concatenate(
            list(session.synthesize_ids_chunked(seq, **KW))
        )
        assert len(solo) == len(got)
        np.testing.assert_allclose(got, solo, atol=2e-5)


def test_abandoned_stream_does_not_stall_group(voice):
    """Closing one stream's generator (client disconnect) must not
    block the other streams in its group."""
    session = voice.session
    seqs = _seqs(voice)
    gens = session.stream_start_batch(seqs, **KW)
    next(gens[1])
    gens[1].close()  # row 1's client disconnects
    out0 = np.concatenate(list(gens[0]))  # must complete
    solo = np.concatenate(
        list(session.synthesize_ids_chunked(seqs[0], **KW))
    )
    np.testing.assert_allclose(out0, solo, atol=2e-5)


def test_driver_is_demand_paced(voice, monkeypatch):
    """With no consumer pulling, the driver stays PREFETCH windows
    ahead instead of decoding the whole utterance eagerly (keeps the
    device free for new stream starts)."""
    created = []
    orig_init = rt_session._ContinuationDriver.__init__

    def spy_init(self, *args, **kwargs):
        orig_init(self, *args, **kwargs)
        created.append(self)

    monkeypatch.setattr(
        rt_session._ContinuationDriver, "__init__", spy_init
    )
    session = voice.session
    seqs = _seqs(voice)
    gens = session.stream_start_batch(seqs, **KW)
    assert len(created) == 1
    driver = created[0]
    prefetch = rt_session._ContinuationDriver.PREFETCH
    deadline = time.time() + 300
    while driver.windows_produced < prefetch and time.time() < deadline:
        time.sleep(0.1)
    assert driver.windows_produced == prefetch
    time.sleep(1.0)  # nobody consuming: production must have stopped
    assert driver.windows_produced == prefetch
    # consuming resumes production and the streams complete
    outs = [np.concatenate(list(g)) for g in gens]
    assert all(len(o) for o in outs)
    assert driver.windows_produced > prefetch
