"""Traffic-profile warmup pruning (VERDICT r03 #4).

A deployment saves /api/stats' ``executable_hits`` table and restarts
with ``--warmup-profile``: warmup then compiles only the executables
the traffic actually dispatches (the full grid is ~175 executables;
the b=1 f=2048/4096 decodes alone compile for minutes each and short-
text traffic never hits them).  The zero-hot-path-compile property of
a profiled warmup is asserted live on hardware by
scripts/serve_load_test.py; these tests pin the key format and the
parsing/expansion plumbing.
"""

import importlib.util
import json
import sys
from pathlib import Path

from mimic3_tpu.runtime.session import hit_key

REPO = Path(__file__).resolve().parents[1]


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "serve_load_test", REPO / "scripts" / "serve_load_test.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_hit_key_format():
    assert hit_key("duration", 4, 64) == "duration:b4:t64"
    assert hit_key("decode", 16, 128, 1024) == "decode:b16:t128:f1024"
    # numpy ints must not leak reprs into keys
    import numpy as np

    assert (
        hit_key("chunk", np.int64(2), np.int32(64), np.int64(90))
        == "chunk:b2:t64:f90"
    )


def test_expand_profile_closes_batch_ladder():
    mod = _load_script()
    out = mod.expand_profile({"decode:b8:t64:f512": 3})
    assert set(out) == {
        f"decode:b{b}:t64:f512" for b in mod.BATCH_LADDER
    }
    # no-frame kinds expand the same way
    out = mod.expand_profile({"duration:b1:t64": 1})
    assert f"duration:b16:t64" in out
    assert len(out) == len(mod.BATCH_LADDER)


def test_expand_profile_batches_closes_next_frame_bucket():
    """The decode frame bucket is bucket(max frames in batch): the
    stochastic duration predictor jitters per-row totals and the batch
    max is monotone in batch size, so the same traffic near a boundary
    crosses into the NEXT frame bucket under different packing
    (observed live: phase-0 saw decode:*:f128, the measurement run
    dispatched decode:b8:t64:f256 and paid a hot-path compile)."""
    from mimic3_tpu.runtime.session import expand_profile_batches

    out = expand_profile_batches(
        {"decode:b2:t64:f128"},
        batch_buckets=(1, 2, 4, 8),
        frame_buckets=(128, 256, 512),
    )
    for b in (1, 2, 4, 8):
        assert f"decode:b{b}:t64:f128" in out
        assert f"decode:b{b}:t64:f256" in out  # next-f closure
        assert f"decode:b{b}:t64:f512" not in out  # only ONE bucket up

    # top of the ladder: nothing above to close over
    out = expand_profile_batches(
        {"decode:b1:t64:f512"},
        batch_buckets=(1, 2),
        frame_buckets=(128, 256, 512),
    )
    assert set(out) == {"decode:b1:t64:f512", "decode:b2:t64:f512"}

    # no frame ladder given -> plain batch closure (back-compat)
    out = expand_profile_batches(
        {"duration:b1:t64"}, batch_buckets=(1, 4)
    )
    assert set(out) == {"duration:b1:t64", "duration:b4:t64"}


def test_expand_profile_batches_rejects_malformed_keys():
    """A profile key that is not 'kind:bN:tN[:fN]' raises a ValueError
    naming the key — found live: a single-voice stats object passed as
    --warmup-profile leaked its metric names ('executable_hits') into
    the profile and crashed mid-warmup with a bare IndexError."""
    import pytest

    from mimic3_tpu.runtime.session import expand_profile_batches

    for bad in ("executable_hits", "duration:bx:t64", "decode:b1",
                "decode:b1:t64:fx"):
        with pytest.raises(ValueError, match="Malformed"):
            expand_profile_batches({bad}, batch_buckets=(1, 2))


def test_load_warmup_profile_shapes(tmp_path):
    """--warmup-profile accepts a full /api/stats payload, a single
    voice's stats object, or a bare {hit_key: count} mapping — and
    rejects anything else loudly at startup."""
    import pytest

    from mimic3_tpu.server.__main__ import ServerConfig
    from mimic3_tpu.server.app import TtsApp

    def load(payload):
        p = tmp_path / "profile.json"
        p.write_text(json.dumps(payload))
        app = TtsApp(ServerConfig(warmup_profile=str(p)))
        return app._load_warmup_profile()

    hits = {"duration:b1:t64": 5, "decode:b1:t64:f128": 5}
    full = {"voices": {"en_UK/test_low": {"executable_hits": hits}}}
    single = {"executable_hits": hits, "latency_p50_ms": 12.0}
    assert load(full) == frozenset(hits)
    assert load(single) == frozenset(hits)
    assert load(hits) == frozenset(hits)
    with pytest.raises(ValueError, match="not an executable signature"):
        load({"latency_p50_ms": 12.0, "utterances": 5})


def test_warmed_bucket_fallback(tmp_path):
    """Traffic escaping the warmed profile rounds UP to the nearest
    warmed bucket (padding) instead of compiling on the hot path —
    executable count stays flat, the fallback is counted for /api/stats,
    and the audio is identical to the natural-bucket result (buckets
    only change masked padding)."""
    import numpy as np

    from mimic3_tpu.runtime.testvoice import create_test_voice
    from mimic3_tpu.runtime.voice import TpuVoice

    d = tmp_path / "en_US" / "test_low"
    create_test_voice(d, full_size=False)
    session = TpuVoice.load_from_directory(
        d, share_sessions=False
    ).session

    # warm ONLY t=64 signatures at b=1 (a stale profile that never saw
    # short texts)
    session.warmup(
        batch_sizes=[1],
        profile={"duration:b1:t64", "decode:b1:t64:f128"},
    )
    n_exec = session.jit_executable_count()

    ids = [3, 7, 1, 9, 4]  # natural bucket t=32 — NOT warmed
    audio = session.synthesize_ids(ids, noise_scale=0.0, noise_w=0.0)

    assert session.jit_executable_count() == n_exec  # no compile
    assert session.hot_path_compiles() == 0
    fb = session.stats.fallbacks_snapshot()
    assert fb.get("duration:b1:t32->duration:b1:t64") == 1

    # identical audio to a natural-bucket synthesis (fresh session, no
    # warmup -> no fallback)
    session2 = TpuVoice.load_from_directory(
        d, share_sessions=False
    ).session
    audio2 = session2.synthesize_ids(ids, noise_scale=0.0, noise_w=0.0)
    np.testing.assert_array_equal(audio, audio2)

    # helper unit behavior on a hand-built warmed set
    with session._lock:
        session._warmed_keys = {
            "duration:b1:t128",
            "decode:b1:t128:f512",
        }
    assert session._fallback_t("duration", 1, 32) == 128
    # batch mismatch: natural
    assert session._fallback_t("duration", 2, 32) == 32
    assert session._fallback_f(1, 128, 128) == 512
    assert session._fallback_f(1, 128, 1024) == 1024  # none larger
    # compiled-on-hot-path keys count as warmed for decode
    with session._lock:
        session._compiled_decode_keys.add("decode:b1:t128:f256")
    assert session._fallback_f(1, 128, 256) == 256


def test_warmed_bucket_fallback_streaming(tmp_path):
    """The streaming path has the same guard: a stream whose natural
    text bucket escaped the warmed profile starts at the nearest warmed
    stream_start signature (window0 is config-fixed, so only the text
    axis can miss) and its continuations inherit the rounded-up bucket,
    staying inside the warmed chunk grid."""
    import numpy as np

    from mimic3_tpu.runtime.testvoice import create_test_voice
    from mimic3_tpu.runtime.voice import TpuVoice

    d = tmp_path / "en_US" / "test_low"
    create_test_voice(d, full_size=False)
    session = TpuVoice.load_from_directory(
        d, share_sessions=False
    ).session

    # stale profile: only t=64 streaming signatures
    # (window0 = first_cf 128 + 2*overlap 64 = 256 at the defaults)
    session.warmup(
        batch_sizes=[1],
        chunk_windows=(256,),
        profile={"stream_start:b1:t64:f256", "chunk:b1:t64:f256"},
    )
    n_exec = session.jit_executable_count()

    ids = [3, 7, 1, 9, 4]  # natural bucket t=32 — NOT warmed
    audio = np.concatenate(
        list(
            session.synthesize_ids_chunked(
                ids, seed=7, noise_scale=0.0, noise_w=0.0
            )
        )
    )

    assert session.jit_executable_count() == n_exec  # no compile
    assert session.hot_path_compiles() == 0
    fb = session.stats.fallbacks_snapshot()
    assert (
        fb.get("stream_start:b1:t32:f256->stream_start:b1:t64:f256")
        == 1
    )

    # bucket-invariant: identical to a natural-bucket stream
    session2 = TpuVoice.load_from_directory(
        d, share_sessions=False
    ).session
    audio2 = np.concatenate(
        list(
            session2.synthesize_ids_chunked(
                ids, seed=7, noise_scale=0.0, noise_w=0.0
            )
        )
    )
    np.testing.assert_array_equal(audio, audio2)


def test_hot_path_compile_guard(tmp_path, caplog):
    """The runtime guard behind /api/stats ``hot_path_compiles``: zero
    while traffic stays inside the warmed set, counts (and warns once
    per new count) when a request dispatches an unwarmed signature —
    the deployment signal that a --warmup-profile capture went stale."""
    import logging

    from mimic3_tpu.runtime.testvoice import create_test_voice
    from mimic3_tpu.runtime.voice import TpuVoice

    d = tmp_path / "en_US" / "test_low"
    create_test_voice(d, full_size=False)
    session = TpuVoice.load_from_directory(
        d, share_sessions=False
    ).session

    # before any warmup every compile is a first-dispatch compile by
    # design — the counter must stay 0, not blame cold starts on traffic
    session.synthesize_ids([3, 7, 1], noise_scale=0.0, noise_w=0.0)
    assert session.hot_path_compiles() == 0

    # warm the smallest text bucket only (t=32, b=1, all frame buckets)
    session.warmup(text_buckets=[32], batch_sizes=[1], parallel=2)
    assert session.hot_path_compiles() == 0

    # in-profile traffic: same t-bucket, warmed -> still zero
    session.synthesize_ids(
        [3, 7, 1, 9, 4], noise_scale=0.0, noise_w=0.0
    )
    assert session.hot_path_compiles() == 0

    # out-of-profile traffic: 40 ids -> t-bucket 64, never warmed
    with caplog.at_level(
        logging.WARNING, logger="mimic3_tpu.runtime.session"
    ):
        session.synthesize_ids(
            list(range(1, 11)) * 4, noise_scale=0.0, noise_w=0.0
        )
        n = session.hot_path_compiles()
        assert n >= 1
        hits = [
            r for r in caplog.records if "serving hot path" in r.message
        ]
        assert len(hits) == 1
        # re-reading the counter must not re-log
        assert session.hot_path_compiles() == n
        assert (
            len(
                [
                    r
                    for r in caplog.records
                    if "serving hot path" in r.message
                ]
            )
            == 1
        )


def test_server_profile_parsing(tmp_path):
    from mimic3_tpu.server.app import TtsApp

    # full /api/stats payload form
    stats_payload = {
        "scheduler": {},
        "voices": {
            "en_US/a": {"executable_hits": {"duration:b1:t64": 9}},
            "en_US/b": {"executable_hits": {"decode:b1:t64:f256": 2}},
        },
    }
    p = tmp_path / "profile.json"
    p.write_text(json.dumps(stats_payload))

    class Cfg:
        warmup_profile = str(p)

    app = TtsApp.__new__(TtsApp)
    app.config = Cfg()
    keys = TtsApp._load_warmup_profile(app)
    assert keys == {"duration:b1:t64", "decode:b1:t64:f256"}

    # bare hit-table form
    p.write_text(json.dumps({"chunk:b1:t64:f90": 1}))
    assert TtsApp._load_warmup_profile(app) == {"chunk:b1:t64:f90"}

    # unset -> no pruning
    app.config.warmup_profile = None
    assert TtsApp._load_warmup_profile(app) is None


def test_warmup_parallel_passthrough():
    """--warmup-parallel reaches VitsSession.warmup(parallel=...).

    Executable loads through a remote compile service are
    latency-bound, so the overlap width is the startup-time knob; a
    deployment raising the flag must actually get the wider pool."""
    from mimic3_tpu.server.__main__ import (
        ServerConfig,
        build_arg_parser,
        config_from_args,
    )
    from mimic3_tpu.server.app import TtsApp

    args = build_arg_parser().parse_args(
        ["--warmup", "--warmup-parallel", "9",
         "--preload-voice", "en_US/fake_low"]
    )
    config = config_from_args(args)
    assert config.warmup_parallel == 9

    calls = {}

    class FakeSession:
        dp = 1
        batch_buckets = (1, 2, 4)

        def warmup(self, **kw):
            calls.update(kw)

    class FakeVoice:
        session = FakeSession()

    app = TtsApp.__new__(TtsApp)
    app.config = config

    class FakeCatalog:
        def _get_or_load_voice(self, key):
            return FakeVoice()

    app._catalog = FakeCatalog()
    app._wire_session = lambda key, voice: None
    app.preload()
    assert calls["parallel"] == 9
    assert calls["batch_sizes"] == [1, 2, 4]

    # default stays at the historical 4 when the flag is absent
    defaults = config_from_args(build_arg_parser().parse_args([]))
    assert defaults.warmup_parallel == 4
    assert ServerConfig().warmup_parallel == 4
