"""Compiled VITS session: static-shape buckets, jit cache, RTF tracking.

This is the TPU replacement for the reference's ONNX Runtime
``InferenceSession`` (reference: mimic3_tts/voice.py:378-407).  Where ORT
interprets a graph per call, here XLA compiles one executable per
(text-bucket, frame-bucket) pair; inputs are padded up to the nearest
bucket so the serving hot path never recompiles
(reference contract being replaced: mimic3_tts/voice.py:154-243).

Synthesis is two device calls:
1. duration pass over the text bucket (cheap) — the only host sync,
2. decode pass over a frame bucket sized to the actual output length.

Sessions are shared per weight file like the reference's shared ONNX
models (reference: mimic3_tts/voice.py:71-72, 277-292).
"""

from __future__ import annotations

import bisect
import logging
import queue
import threading
import time
import typing
from dataclasses import dataclass, field

import numpy as np

from ..config import TrainingConfig

_LOGGER = logging.getLogger(__name__)


def _jax():
    import jax

    return jax


_CACHE_ENABLED = False


def resolve_compile_cache_dir(
    environ: typing.Optional[typing.Mapping[str, str]] = None,
) -> str:
    """Pick the persistent compile-cache directory.

    Precedence: $MIMIC3_COMPILE_CACHE, then a repo-local ``.xla_cache/``
    when running from a development checkout, then XDG.  The repo-local
    preference exists because working trees routinely outlive the
    machine image they run on (CI runners, rebuilt dev VMs) — a cache
    that dies with $HOME turns every fresh environment into a full cold
    start (observed: ~150-executable serving grid through a remote
    compile service).
    """
    import os
    from pathlib import Path

    env = os.environ if environ is None else environ
    cache_dir = env.get("MIMIC3_COMPILE_CACHE")
    if cache_dir:
        return cache_dir
    repo_root = Path(__file__).resolve().parents[2]
    if (repo_root / ".git").exists() and (
        repo_root / "bench.py"
    ).is_file():
        return str(repo_root / ".xla_cache")
    return str(
        Path(env.get("XDG_CACHE_HOME") or str(Path.home() / ".cache"))
        / "mimic3_tpu"
        / "xla"
    )


def enable_compilation_cache() -> None:
    """Persist compiled XLA executables across processes.

    The analog of the reference's shared ONNX sessions + voice artifact
    cache (reference: mimic3_tts/voice.py:277-292, download.py:108-117):
    a server restart re-loads executables from disk instead of
    recompiling every bucket.  Directory override: $MIMIC3_COMPILE_CACHE.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    _CACHE_ENABLED = True
    from pathlib import Path

    jax = _jax()
    if jax.default_backend() == "cpu":
        # CPU AOT artifacts embed exact machine features; a cache entry
        # compiled elsewhere (e.g. the remote compile service) can SIGILL
        # on this host. Only accelerator executables are cached.
        _LOGGER.debug("compilation cache skipped on CPU backend")
        return
    cache_dir = resolve_compile_cache_dir()
    try:
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache EVERYTHING: compiles here go through a remote compile
        # service, so even sub-second executables cost a network round
        # trip (measured: 126 tiny eager compiles at ~0.5s each
        # dominate cold start once the big executables hit the cache —
        # scripts/verify_compile_cache.py)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0
        )
        _LOGGER.debug("XLA compilation cache: %s", cache_dir)
    except Exception as err:  # cache is best-effort
        _LOGGER.debug("compilation cache unavailable: %s", err)


# -- device-call / compile in-flight tracking --------------------------------
#
# Operational root cause (round 3, docs/STATUS.md): SIGTERM-ing a process
# while an XLA compile is in flight wedges this environment's TPU relay
# for hours.  Every jit dispatch below therefore registers itself here, so
# (a) the server's SIGTERM handler can DEFER exit until compiles drain,
# (b) tooling can poll /api/stats for compile-idle before terminating,
# (c) warmup can be cancelled between executables instead of mid-compile.

_DEVICE_CALLS = 0
_DEVICE_CALLS_COND = threading.Condition()
_SHUTDOWN_EVENT = threading.Event()


class _device_call:
    """Marks one device dispatch (possibly an XLA compile) in flight."""

    def __enter__(self) -> "_device_call":
        global _DEVICE_CALLS
        with _DEVICE_CALLS_COND:
            _DEVICE_CALLS += 1
        return self

    def __exit__(self, *exc) -> None:
        global _DEVICE_CALLS
        with _DEVICE_CALLS_COND:
            _DEVICE_CALLS -= 1
            if _DEVICE_CALLS == 0:
                _DEVICE_CALLS_COND.notify_all()


def device_calls_in_flight() -> int:
    """Number of jit dispatches (compiles included) currently running."""
    with _DEVICE_CALLS_COND:
        return _DEVICE_CALLS


def wait_device_idle(timeout: typing.Optional[float] = None) -> bool:
    """Block until no device call is in flight; True if idle reached."""
    deadline = None if timeout is None else time.monotonic() + timeout
    with _DEVICE_CALLS_COND:
        while _DEVICE_CALLS > 0:
            remaining = (
                None if deadline is None else deadline - time.monotonic()
            )
            if remaining is not None and remaining <= 0:
                return False
            _DEVICE_CALLS_COND.wait(timeout=remaining)
    return True


def request_graceful_shutdown() -> None:
    """Ask long device loops (warmup grids) to stop at the next safe
    point — between executables, never mid-compile."""
    _SHUTDOWN_EVENT.set()


def graceful_shutdown_requested() -> bool:
    return _SHUTDOWN_EVENT.is_set()


def reset_graceful_shutdown() -> None:
    """Clear the shutdown request (tests / long-lived embedders)."""
    _SHUTDOWN_EVENT.clear()


def install_kill_safe_sigterm() -> None:
    """SIGTERM defers while an XLA compile/device call is in flight.

    Root cause this guards against (round-3 incident, docs/STATUS.md):
    dying mid-compile wedges this environment's TPU relay for hours.
    First SIGTERM: cancel warmup grids at the next executable boundary,
    wait for in-flight calls to drain, then raise KeyboardInterrupt in
    the main thread.  Second SIGTERM: force immediate KeyboardInterrupt
    (operator escape hatch).  Call from the main thread of any
    device-owning process (server, trainer, bench).
    """
    import _thread
    import signal

    # Delivery acknowledgment for the drain thread below.  CPython race
    # (reproduced deterministically while developing
    # tests/test_kill_safety.py): a signal tripped in the window around
    # entry into a blocking call (time.sleep, lock wait) is NOT
    # processed until that call returns on its own — blocking calls
    # only re-check signals on EINTR, and a signal whose C-level
    # handler already ran won't EINTR the syscall again.  One
    # pthread_kill is therefore not enough; the drain thread retries
    # until the Python-level handler actually ran.  Retries are safe:
    # pending deliveries coalesce at the CPython trip-flag level, and
    # we stop as soon as the handler acknowledges.
    sigint_seen = threading.Event()

    def _sigint(signum, frame):
        sigint_seen.set()
        raise KeyboardInterrupt  # same semantics as the default handler

    def _sigterm(signum, frame):
        if graceful_shutdown_requested():
            raise KeyboardInterrupt  # second SIGTERM: force
        request_graceful_shutdown()  # cancel any warmup grid
        if device_calls_in_flight() == 0:
            raise KeyboardInterrupt
        _LOGGER.warning(
            "SIGTERM deferred: %d device call(s)/compile(s) in "
            "flight; exiting when they drain (SIGTERM again to force)",
            device_calls_in_flight(),
        )

        def _exit_when_idle():
            wait_device_idle(timeout=7200)
            main = threading.main_thread()
            sigint_seen.clear()
            for _ in range(600):  # bounded: ~10 min of retries
                try:
                    # pthread_kill targets the main thread directly so
                    # a blocked syscall gets EINTR; interrupt_main()
                    # alone only fires at the next bytecode boundary.
                    signal.pthread_kill(main.ident, signal.SIGINT)
                except (ProcessLookupError, ValueError, RuntimeError):
                    _thread.interrupt_main()
                    return
                if sigint_seen.wait(timeout=1.0) or not main.is_alive():
                    return
            _thread.interrupt_main()  # last resort

        threading.Thread(target=_exit_when_idle, daemon=True).start()

    signal.signal(signal.SIGTERM, _sigterm)
    signal.signal(signal.SIGINT, _sigint)


class _GuardedJit:
    """Wrap a jit function so every dispatch registers in the
    device-call tracker (see module docstring above)."""

    def __init__(self, fn: typing.Any):
        self._fn = fn

    def __call__(self, *args, **kwargs):
        with _device_call():
            return self._fn(*args, **kwargs)

    def lower(self, *args, **kwargs):
        return self._fn.lower(*args, **kwargs)

    def _cache_size(self) -> int:
        return self._fn._cache_size()


@dataclass
class SessionStats:
    """Rolling synthesis statistics (RTF = infer_sec / audio_sec).

    Recorded from scheduler and direct-caller threads and read by
    /api/stats; all mutation and history reads go through ``_lock``.
    """

    utterances: int = 0
    infer_sec: float = 0.0
    audio_sec: float = 0.0
    compile_count: int = 0
    last_rtf: float = 0.0
    rtf_history: typing.List[float] = field(default_factory=list)
    latency_history: typing.List[float] = field(default_factory=list)
    executable_hits: typing.Dict[str, int] = field(default_factory=dict)
    bucket_fallbacks: typing.Dict[str, int] = field(default_factory=dict)
    _lock: threading.Lock = field(
        default_factory=threading.Lock, repr=False, compare=False
    )

    def record_hit(self, key: str) -> None:
        """Count a dispatch of one compiled executable signature.

        Keys come from :func:`hit_key`.  /api/stats exposes the table so
        a deployment can save its real traffic profile and restart with
        ``--warmup-profile``, warming only the executables its requests
        actually dispatch instead of the full bucket grid (the grid is
        ~175 executables; a single-voice deployment typically hits a
        dozen).
        """
        with self._lock:
            self.executable_hits[key] = (
                self.executable_hits.get(key, 0) + 1
            )

    def hits_snapshot(self) -> typing.Dict[str, int]:
        """Copy of ``executable_hits`` taken under ``_lock`` — request
        threads mutate the dict through :meth:`record_hit`, and a
        resize during an unlocked ``dict()`` copy raises RuntimeError."""
        with self._lock:
            return dict(self.executable_hits)

    def record_bucket_fallback(self, natural: str, used: str) -> int:
        """Count one warmed-bucket fallback (``natural`` signature was
        not compiled; the request dispatched ``used`` instead).  Returns
        the new count for this mapping so the caller can log first
        occurrences only."""
        key = f"{natural}->{used}"
        with self._lock:
            n = self.bucket_fallbacks.get(key, 0) + 1
            self.bucket_fallbacks[key] = n
            return n

    def fallbacks_snapshot(self) -> typing.Dict[str, int]:
        with self._lock:
            return dict(self.bucket_fallbacks)

    def record(self, infer_sec: float, audio_sec: float) -> None:
        with self._lock:
            self.utterances += 1
            self.infer_sec += infer_sec
            self.audio_sec += audio_sec
            self.last_rtf = (
                infer_sec / audio_sec if audio_sec > 0 else 0.0
            )
            self.rtf_history.append(self.last_rtf)
            self.latency_history.append(infer_sec)
            if len(self.rtf_history) > 1000:
                del self.rtf_history[:-1000]
            if len(self.latency_history) > 1000:
                del self.latency_history[:-1000]

    @property
    def mean_rtf(self) -> float:
        return self.infer_sec / self.audio_sec if self.audio_sec else 0.0

    def latency_percentile(self, pct: float) -> float:
        """Synthesis-call latency percentile over the recent window."""
        with self._lock:
            ordered = sorted(self.latency_history)
        if not ordered:
            return 0.0
        idx = min(
            len(ordered) - 1, int(pct / 100.0 * len(ordered))
        )
        return ordered[idx]


def hit_key(
    kind: str, b: int, t: int, f: typing.Optional[int] = None
) -> str:
    """Stable name of one compiled executable signature.

    (kind, batch bucket, text bucket[, frame/window bucket]) — exactly
    the static-shape tuple XLA specializes on, so one key == one
    executable.  Used by SessionStats.record_hit and warmup profiles.
    """
    key = f"{kind}:b{int(b)}:t{int(t)}"
    return key if f is None else f"{key}:f{int(f)}"


def expand_profile_batches(
    profile: typing.Collection[str],
    batch_buckets: typing.Sequence[int],
    frame_buckets: typing.Optional[typing.Sequence[int]] = None,
) -> typing.FrozenSet[str]:
    """Close a captured traffic profile over the batch-bucket ladder.

    A raw /api/stats ``executable_hits`` capture records only the batch
    buckets that request ARRIVAL TIMING happened to realize (the
    scheduler packs whatever is queued); a later run with the same
    traffic content WILL hit other buckets.  Text buckets stay exactly
    as observed — they are functions of the traffic's content.

    Frame buckets are NOT purely content-derived for batched decode:
    the decode executable's frame bucket is ``bucket(max frames in
    batch)``, the stochastic duration predictor jitters per-row totals,
    and the batch max is monotone in batch size — so the same traffic
    near a bucket boundary crosses into the NEXT frame bucket when the
    scheduler packs a bigger batch (observed live: phase-0 saw
    ``decode:*:f128``, the measurement run dispatched
    ``decode:b8:*:f256`` and paid a hot-path compile).  Each f-keyed
    signature is therefore also closed over the next-larger frame
    bucket when ``frame_buckets`` is given.

    ``VitsSession.warmup`` applies this closure itself, so raw
    /api/stats captures are safe to pass to ``--warmup-profile``.
    """
    fb = sorted(int(f) for f in frame_buckets) if frame_buckets else []

    def next_f(f: int) -> typing.Optional[int]:
        for cand in fb:
            if cand > f:
                return cand
        return None

    keys: typing.Set[str] = set()
    for key in profile:
        parts = key.split(":")  # kind : bN : tN [: fN]
        if (
            len(parts) < 3
            or not parts[1][:1] == "b"
            or not parts[1][1:].isdigit()
            or not parts[2][:1] == "t"
            or not parts[2][1:].isdigit()
            or (len(parts) > 3 and not parts[3][1:].isdigit())
        ):
            raise ValueError(
                f"Malformed warmup-profile signature {key!r} — expected "
                "'kind:bN:tN[:fN]' hit keys as recorded in /api/stats "
                "executable_hits"
            )
        frames = (
            [parts[3]] if len(parts) > 3 else [None]
        )
        if len(parts) > 3:
            up = next_f(int(parts[3][1:]))
            if up is not None:
                frames.append(f"f{up}")
        for b in batch_buckets:
            parts[1] = f"b{int(b)}"
            for f_part in frames:
                if f_part is not None:
                    parts[3] = f_part
                keys.add(":".join(parts))
    return frozenset(keys)


class _LazyHostRows:
    """Device arrays fetched to host ONCE, lazily, shared by the row
    generators of one batched stream start.  The fetch happens after
    first chunks are already yielded — off the first-chunk latency
    path — and only if some stream actually needs a continuation."""

    def __init__(self, *arrays: typing.Any):
        self._dev: typing.Optional[typing.Tuple] = arrays
        self._np: typing.Optional[typing.Tuple[np.ndarray, ...]] = None
        self._lock = threading.Lock()

    def host(self) -> typing.Tuple[np.ndarray, ...]:
        with self._lock:
            if self._np is None:
                assert self._dev is not None
                self._np = tuple(np.asarray(a) for a in self._dev)
                self._dev = None
            return self._np


class _ContinuationDriver:
    """Batched continuation decode for one fused stream start.

    Streams that started together in :meth:`VitsSession.stream_start_batch`
    share a chunk grid, rng, and padded device arrays — so their
    continuation windows can run as ONE batched device call per window
    instead of a batch-1 call per stream (which serialize on the device
    under sustained concurrent streaming).  A daemon thread decodes
    window k for the whole padded batch, slices each row's valid frames
    to its queue, and is DEMAND-PACED: it stays at most ``PREFETCH``
    windows ahead of the fastest still-consuming row, so an idle group
    stops occupying the device.  Audio is bit-identical to the batch-1
    path (prior noise is frame-indexed and shared across batch rows —
    models/vits/model.py frame-indexed noise docstring).
    """

    PREFETCH = 2
    # no live row advanced while production was blocked for this long:
    # every consumer is gone or wedged — fail their queues and release
    # the device arrays instead of leaking the thread forever
    STALL_TIMEOUT = 600.0

    def __init__(
        self,
        session: "VitsSession",
        dev_args: typing.Tuple,
        rng: typing.Any,
        noise_scale: float,
        totals: typing.Sequence[int],
        first_cf: int,
        chunk_frames: int,
        overlap: int,
    ):
        self._session = session
        self._dev_args = dev_args  # ids, lengths, sid, durations, m_p, logs_p
        self._rng = rng
        self._noise_scale = noise_scale
        self._totals = [int(t) for t in totals]
        self._batch = len(self._totals)
        self._first_cf = first_cf
        self._chunk_frames = chunk_frames
        self._overlap = overlap
        self._queues: typing.List[queue.SimpleQueue] = [
            queue.SimpleQueue() for _ in range(self._batch)
        ]
        # consumed[i]: highest window index row i's consumer has pulled
        # (0 = only the fused first chunk); alive[i] goes False when the
        # row's generator finishes or is closed (client disconnect)
        self._consumed = [0] * self._batch
        self._alive = [True] * self._batch
        self._cond = threading.Condition()
        self.windows_produced = 0  # introspection for tests
        threading.Thread(
            target=self._run, daemon=True, name="tts-continuation-driver"
        ).start()

    # -- producer --------------------------------------------------------------

    def _may_produce(self, k: int) -> typing.Optional[bool]:
        """True = produce window k now; False = wait; None = abort."""
        live = [
            self._consumed[i]
            for i in range(self._batch)
            if self._alive[i]
        ]
        if not live:
            return None
        return k <= max(live) + self.PREFETCH

    def _run(self) -> None:
        import jax.numpy as jnp

        session = self._session
        hop = session.model.hp.hop_length
        cf = self._chunk_frames
        ids, lengths, sid, durations, m_p, logs_p = self._dev_args
        try:
            start = self._first_cf
            k = 1
            while True:
                rows = [
                    i
                    for i in range(self._batch)
                    if start < self._totals[i]
                ]
                if not rows:
                    return
                deadline = time.monotonic() + self.STALL_TIMEOUT
                with self._cond:
                    while True:
                        state = self._may_produce(k)
                        if state is None:
                            return  # every consumer is gone
                        if state:
                            break
                        if graceful_shutdown_requested():
                            raise RuntimeError(
                                "continuation decode cancelled: "
                                "shutdown requested"
                            )
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            raise RuntimeError(
                                "continuation consumers stalled for "
                                f"{self.STALL_TIMEOUT:.0f}s"
                            )
                        self._cond.wait(timeout=min(remaining, 5.0))
                left = min(self._overlap, start)
                session.stats.record_hit(
                    hit_key(
                        "chunk",
                        ids.shape[0],
                        ids.shape[1],
                        cf + 2 * self._overlap,
                    )
                )
                audio, _ = session._dec_chunk_fn(
                    session.params,
                    ids,
                    lengths,
                    durations,
                    self._rng,
                    jnp.float32(self._noise_scale),
                    sid,
                    jnp.int32(start - left),
                    m_p,
                    logs_p,
                    num_frames=cf + 2 * self._overlap,
                )
                audio_np = np.asarray(audio)  # one D2H for the batch
                self.windows_produced += 1
                for i in rows:
                    valid = min(cf, self._totals[i] - start)
                    self._queues[i].put(
                        np.asarray(
                            audio_np[i, left * hop : (left + valid) * hop],
                            dtype=np.float32,
                        )
                    )
                start += cf
                k += 1
        except BaseException as err:  # noqa: BLE001 — forwarded to rows
            for q in self._queues:
                q.put(err)
        finally:
            self._dev_args = None  # release device arrays promptly

    # -- consumers -------------------------------------------------------------

    def row(
        self, i: int, first_chunk: np.ndarray
    ) -> typing.Iterator[np.ndarray]:
        """Yield row ``i``'s chunks (first one from the fused start)."""
        session = self._session
        hop = session.model.hp.hop_length
        sample_rate = session.config.audio.sample_rate
        t0 = time.perf_counter()
        emitted = 0
        try:
            total = self._totals[i]
            valid0 = min(self._first_cf, total)
            yield np.asarray(
                first_chunk[: valid0 * hop], dtype=np.float32
            )
            emitted += valid0
            start = self._first_cf
            k = 1
            while start < total:
                item = self._queues[i].get()
                if isinstance(item, BaseException):
                    raise item
                yield item
                emitted += min(self._chunk_frames, total - start)
                start += self._chunk_frames
                with self._cond:
                    self._consumed[i] = k
                    self._cond.notify_all()
                k += 1
        finally:
            with self._cond:
                self._alive[i] = False
                self._cond.notify_all()
            session.stats.record(
                time.perf_counter() - t0, emitted * hop / sample_rate
            )


def pick_bucket(
    n: int, buckets: typing.Sequence[int], grow: bool = False
) -> int:
    """Smallest bucket >= n.

    By default inputs past the largest bucket are CLAMPED to it (the
    caller truncates): the serving hot path must never trigger a fresh
    XLA compile — through this environment's remote-compile tunnel one
    executable costs minutes (SURVEY.md §7 static-shape discipline).
    Pass ``grow=True`` to instead extend the ladder geometrically
    (offline/bench use, where a compile is acceptable).
    """
    idx = bisect.bisect_left(buckets, n)
    if idx < len(buckets):
        return buckets[idx]
    if not grow:
        return buckets[-1]
    cap = buckets[-1]
    while cap < n:
        cap *= 2
    return cap


class VitsSession:
    """A voice's compiled synthesis engine on one device (or mesh).

    With ``mesh`` set, inference runs data-parallel across the mesh's
    ``dp`` axis: params are replicated (TP-sharded where rules match
    when the mesh has a nontrivial ``tp`` axis), the batch dimension is
    sharded over ``dp``, and XLA partitions every executable — the
    TPU-native answer to the reference's N worker threads
    (reference: mimic3_http/__main__.py:53-61, per SURVEY.md §2.4).
    """

    _SHARED: typing.Dict[str, "VitsSession"] = {}
    _SHARED_LOCK = threading.Lock()

    def __init__(
        self,
        config: TrainingConfig,
        params: typing.Mapping[str, typing.Any],
        *,
        deterministic: bool = False,
        seed: int = 0,
        allow_bucket_growth: bool = False,
        mesh: typing.Optional[typing.Any] = None,
        use_tp: bool = False,
    ):
        import jax
        import jax.numpy as jnp

        from ..models.vits import VitsModel

        enable_compilation_cache()
        self.config = config
        self.deterministic = deterministic
        compute_dtype = jnp.dtype(config.tpu.compute_dtype)
        decoder_dtype = (
            jnp.float32 if deterministic
            else jnp.dtype(config.tpu.decoder_dtype)
        )
        pallas_stage = config.tpu.pallas_stage_max_channels
        if pallas_stage is None:
            # auto: on-TPU only (measured 2.2x on the C=32 stage;
            # interpret-mode on CPU would be slow)
            on_tpu = jax.default_backend() == "tpu"
            pallas_stage = 32 if on_tpu else 0
        # Capability gate, not a single-device gate: XLA's SPMD
        # partitioner cannot shard pallas_call, so under a mesh the
        # batched decode runs through a dp shard_map wrapper (each
        # shard executes the kernel on its local batch rows).  tp
        # shards the wide weights, which the folded kernel does not
        # support — kernel off only in that case.
        tp_size = 1 if mesh is None else int(mesh.shape.get("tp", 1))
        mesh_kernel = (
            mesh is not None and tp_size == 1 and pallas_stage > 0
        )
        self.model = VitsModel(
            config.model,
            compute_dtype=compute_dtype,
            decoder_dtype=decoder_dtype,
            # under a mesh the plain (XLA-partitioned) executables must
            # never reach pallas_call; kernel decodes go via shard_map
            pallas_stage_max_channels=pallas_stage if mesh is None else 0,
        )
        self._kernel_model = (
            VitsModel(
                config.model,
                compute_dtype=compute_dtype,
                decoder_dtype=decoder_dtype,
                pallas_stage_max_channels=pallas_stage,
            )
            if mesh_kernel
            else None
        )
        self.params = jax.tree_util.tree_map(jnp.asarray, dict(params))
        self.mesh = mesh
        # multi-controller (jax.distributed) run: the mesh spans devices
        # this process cannot address, so arrays are assembled with
        # make_array_from_callback (every process holds the full host
        # value) and jit outputs are forced replicated so every process
        # can fetch them (SURVEY.md §2.4 comm-backend plan)
        self._multiprocess = (
            mesh is not None and jax.process_count() > 1
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import batch_sharding, param_sharding

            self.dp = int(mesh.shape.get("dp", 1))
            self._replicated = NamedSharding(mesh, P())
            self._batch_sharding = batch_sharding(mesh)
            shardings = param_sharding(self.mesh, self.params, use_tp=use_tp)
            place = (
                self._make_global_array
                if self._multiprocess
                else jax.device_put
            )
            self.params = jax.tree_util.tree_map(
                place, self.params, shardings
            )
        else:
            self.dp = 1
            self._replicated = None
            self._batch_sharding = None
        self.text_buckets = tuple(config.tpu.text_buckets)
        self.frame_buckets = tuple(config.tpu.frame_buckets)
        # batch buckets: variable scheduler batches pad up to these so
        # the batch dimension never triggers a request-path compile; on
        # a dp mesh every bucket is rounded up to a multiple of dp
        raw_bb = tuple(config.tpu.batch_buckets) or (1,)
        self.batch_buckets = tuple(
            sorted({-(-b // self.dp) * self.dp for b in raw_bb})
        )
        # False (serving default): inputs past the largest bucket are
        # truncated so the request path can never trigger an XLA compile
        self.allow_bucket_growth = allow_bucket_growth
        self.stats = SessionStats()
        self._base_key = jax.random.PRNGKey(seed)
        self._call_counter = 0
        self._lock = threading.Lock()
        self.batcher = None  # optional server-side BatchScheduler
        # speculative decode: running estimate of frames per phoneme at
        # unit length_scale, None until the first observation
        self.speculative_decode = bool(
            getattr(config.tpu, "speculative_decode", True)
        )
        self.batched_continuations = bool(
            getattr(config.tpu, "batched_continuations", True)
        )
        self._ema_frames_per_phoneme: typing.Optional[float] = None
        # decode signatures known to be compiled (warmup + past
        # dispatches).  Speculation exists to hide a host round trip
        # (~ms); speculating into an uncompiled signature pays an XLA
        # compile (~tens of seconds here) ON the request path — a
        # strict loss, and the one way a profiled warmup could still
        # see hot-path compiles.  Mandatory (fallback) decodes are
        # unrestricted: their first dispatch compiles by necessity.
        self._compiled_decode_keys: typing.Set[str] = set()
        # executable count at the moment warmup finished; any growth
        # past it is an XLA compile ON the serving hot path (a profile
        # miss).  None until a warmup has run.
        self._warmup_executable_baseline: typing.Optional[int] = None
        self._hot_path_compiles_logged = 0
        # signatures known compiled (populated by warmup, extended by
        # hot-path compiles); once set, requests whose natural bucket
        # is NOT in it round up to the nearest warmed bucket instead of
        # compiling on the request path — buckets only change padding,
        # so the audio is identical (tests/test_warmup_profile.py)
        self._warmed_keys: typing.Optional[typing.Set[str]] = None

        multispeaker = config.model.is_multispeaker

        def dur_fn(params, ids, lengths, rng, length_scale, noise_w, sid):
            return self.model.infer_durations(
                params, ids, lengths, rng, length_scale, noise_w,
                sid=sid if multispeaker else None,
            )

        def dec_fn(
            params, ids, lengths, durations, rng, noise_scale, sid,
            *, num_frames,
        ):
            return self.model.decode_frames(
                params, ids, lengths, durations, num_frames, rng,
                noise_scale, sid=sid if multispeaker else None,
            )

        def dec_chunk_fn(
            params, ids, lengths, durations, rng, noise_scale, sid,
            frame_offset, m_p, logs_p, *, num_frames,
        ):
            # noise is frame-indexed inside decode_frames, so windows
            # at different offsets/sizes agree on shared frames
            return self.model.decode_frames(
                params, ids, lengths, durations, num_frames, rng,
                noise_scale,
                sid=sid if multispeaker else None,
                frame_offset=frame_offset,
                enc_stats=(m_p, logs_p),
            )

        def stream_start_fn(
            params, ids, lengths, rng, length_scale, noise_w,
            noise_scale, sid, *, num_frames,
        ):
            # fused encoder + durations + first decode window: a batch
            # of concurrent streams reaches first audio in ONE device
            # dispatch (the encoder also runs once instead of twice)
            return self.model.stream_start(
                params, ids, lengths, rng, length_scale, noise_w,
                noise_scale, num_frames,
                sid=sid if multispeaker else None,
            )

        # multi-controller runs force replicated outputs so every
        # process can fetch results (and np.asarray host syncs on
        # durations/totals work); single-process meshes keep XLA's
        # layout choice
        out_rep = (
            {"out_shardings": self._replicated}
            if self._multiprocess
            else {}
        )
        if self._kernel_model is not None:
            # dp-sharded decode with the fused Pallas stage kernel:
            # noise is generated GLOBALLY (frame-indexed, XLA-
            # partitioned) so per-shard rows see exactly the values the
            # unsharded path would — then shard_map hands each device
            # its local batch rows and the kernel runs as on one chip.
            import functools

            from jax.sharding import PartitionSpec as P

            from ..models.vits.model import frame_indexed_prior_noise

            kernel_model = self._kernel_model
            inter = config.model.inter_channels

            def dec_local(
                params, ids, lengths, durations, rng, noise_scale,
                sid, noise, *, num_frames,
            ):
                return kernel_model.decode_frames(
                    params, ids, lengths, durations, num_frames, rng,
                    noise_scale,
                    sid=sid if multispeaker else None,
                    prior_noise=noise,
                )

            def dec_fn_sharded(
                params, ids, lengths, durations, rng, noise_scale,
                sid, *, num_frames,
            ):
                noise = frame_indexed_prior_noise(
                    rng, num_frames, 0, ids.shape[0], inter
                )
                return jax.shard_map(
                    functools.partial(dec_local, num_frames=num_frames),
                    mesh=mesh,
                    in_specs=(
                        P(), P("dp"), P("dp"), P("dp"), P(), P(),
                        P("dp"), P("dp"),
                    ),
                    out_specs=(P("dp"), P("dp")),
                    check_vma=False,
                )(
                    params, ids, lengths, durations, rng,
                    noise_scale, sid, noise,
                )

            self._dec_fn = _GuardedJit(jax.jit(
                dec_fn_sharded, static_argnames=("num_frames",),
                **out_rep,
            ))
        else:
            self._dec_fn = _GuardedJit(jax.jit(
                dec_fn, static_argnames=("num_frames",), **out_rep
            ))
        self._dur_fn = _GuardedJit(jax.jit(dur_fn, **out_rep))
        self._dec_chunk_fn = _GuardedJit(jax.jit(
            dec_chunk_fn, static_argnames=("num_frames",), **out_rep
        ))
        self._stream_start_fn = _GuardedJit(jax.jit(
            stream_start_fn, static_argnames=("num_frames",), **out_rep
        ))

    def jit_executable_count(self) -> int:
        """Total compiled executables across the session's jit entry
        points.  Serving reads this via /api/stats before and after a
        load phase to assert no XLA compile happened on the hot path
        (BASELINE.md: "no recompilation on hot path")."""
        return int(
            sum(
                f._cache_size()
                for f in (
                    self._dur_fn,
                    self._dec_fn,
                    self._dec_chunk_fn,
                    self._stream_start_fn,
                )
            )
        )

    def hot_path_compiles(self) -> int:
        """Executables compiled AFTER warmup completed.

        Zero until a warmup has run (without one, every compile is a
        first-dispatch compile by design, not an SLO violation).  Logs
        each newly-detected hot-path compile once — a deployment running
        off a ``--warmup-profile`` capture uses this (via /api/stats)
        to learn that live traffic escaped the profiled set and the
        profile needs re-capturing.
        """
        with self._lock:
            if self._warmup_executable_baseline is None:
                return 0
            n = max(
                0,
                self.jit_executable_count()
                - self._warmup_executable_baseline,
            )
            if n > self._hot_path_compiles_logged:
                _LOGGER.warning(
                    "%d XLA compile(s) on the serving hot path — live "
                    "traffic dispatched signatures outside the warmed "
                    "set; re-capture the warmup profile from "
                    "/api/stats executable_hits",
                    n,
                )
                self._hot_path_compiles_logged = n
            return n

    def _note_compiled(self, key: str) -> None:
        """Record a signature as compiled so later requests with the
        same natural bucket dispatch it directly instead of falling
        back to a larger warmed bucket forever."""
        with self._lock:
            if self._warmed_keys is not None:
                self._warmed_keys.add(key)

    def _fallback_t(
        self,
        kind: str,
        b_bucket: int,
        t_bucket: int,
        f: typing.Optional[int] = None,
    ) -> int:
        """Nearest warmed text bucket >= the natural one for ``kind``.

        Engages only after a warmup recorded the compiled set: a
        request whose natural signature (``duration`` on the batch
        path, ``stream_start`` on the streaming path) was never warmed
        (live traffic escaped a ``--warmup-profile`` capture) pays a
        few extra padding columns at a larger warmed bucket instead of
        a multi-minute XLA compile on the serving path.  Padding never
        changes the audio (masked throughout; pinned by tests).  If no
        larger bucket is warmed either, the natural bucket compiles as
        before and ``hot_path_compiles`` counts it.
        """
        with self._lock:
            warmed = self._warmed_keys
        if warmed is None or self.allow_bucket_growth:
            return t_bucket
        natural = hit_key(kind, b_bucket, t_bucket, f)
        if natural in warmed:
            return t_bucket
        for t in self.text_buckets:
            if t <= t_bucket:
                continue
            used = hit_key(kind, b_bucket, t, f)
            if used in warmed:
                if self.stats.record_bucket_fallback(natural, used) == 1:
                    _LOGGER.warning(
                        "Warmed-bucket fallback: %s not compiled, "
                        "dispatching %s (padded) — live traffic escaped "
                        "the warmup profile; re-capture it from "
                        "/api/stats executable_hits",
                        natural, used,
                    )
                return t
        return t_bucket

    def _fallback_f(
        self, b_bucket: int, t_bucket: int, f_bucket: int
    ) -> int:
        """Nearest warmed decode frame bucket >= the natural one
        (same contract as :meth:`_fallback_t`)."""
        with self._lock:
            warmed = self._warmed_keys
        if warmed is None or self.allow_bucket_growth:
            return f_bucket
        natural = hit_key("decode", b_bucket, t_bucket, f_bucket)
        if natural in warmed or natural in self._compiled_decode_keys:
            return f_bucket
        for f in self.frame_buckets:
            if f <= f_bucket:
                continue
            used = hit_key("decode", b_bucket, t_bucket, f)
            if used in warmed or used in self._compiled_decode_keys:
                if self.stats.record_bucket_fallback(natural, used) == 1:
                    _LOGGER.warning(
                        "Warmed-bucket fallback: %s not compiled, "
                        "dispatching %s (padded) — live traffic escaped "
                        "the warmup profile; re-capture it from "
                        "/api/stats executable_hits",
                        natural, used,
                    )
                return f
        return f_bucket

    # -- shared sessions -----------------------------------------------------

    @classmethod
    def get_shared(
        cls,
        key: str,
        factory: typing.Callable[[], "VitsSession"],
    ) -> "VitsSession":
        with cls._SHARED_LOCK:
            session = cls._SHARED.get(key)
            if session is None:
                session = factory()
                cls._SHARED[key] = session
            return session

    # -- device placement -------------------------------------------------------

    def _make_global_array(self, x, sharding):
        """Host value -> global array on a multi-process mesh.

        ``jax.device_put`` cannot target shardings with non-addressable
        devices; every process holds the identical full host value, so
        each shard is materialized by slicing it locally.
        """
        import jax

        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: x[idx]
        )

    def _put(self, x, *, sharded: bool):
        """Place an array on the device/mesh.

        ``sharded=True`` shards the leading (batch) dimension over the
        mesh's dp axis; otherwise the value is replicated.  Without a
        mesh this is a plain transfer.
        """
        import jax
        import jax.numpy as jnp

        x = jnp.asarray(x)
        if self.mesh is None:
            return x
        use_batch = (
            sharded and x.ndim >= 1 and x.shape[0] % self.dp == 0
        )
        sharding = self._batch_sharding if use_batch else self._replicated
        if self._multiprocess:
            return self._make_global_array(x, sharding)
        return jax.device_put(x, sharding)

    # -- rng -------------------------------------------------------------------

    def _next_key(self, seed: typing.Optional[int] = None):
        jax = _jax()
        if seed is not None:
            return jax.random.PRNGKey(seed)
        if self.deterministic:
            return self._base_key
        with self._lock:
            self._call_counter += 1
            counter = self._call_counter
        return jax.random.fold_in(self._base_key, counter)

    # -- synthesis ---------------------------------------------------------------

    def synthesize_ids_batch(
        self,
        id_sequences: typing.Sequence[typing.Sequence[int]],
        *,
        speaker_ids: typing.Optional[typing.Sequence[int]] = None,
        length_scale: float = 1.0,
        noise_scale: float = 0.667,
        noise_w: float = 0.8,
        seed: typing.Optional[int] = None,
        max_frames_cap: int = 32768,
    ) -> typing.List[np.ndarray]:
        """Synthesize a batch of phoneme-id sequences -> float32 waveforms.

        Sequences are padded to a shared text bucket; the decode stage runs
        at the frame bucket covering the longest output in the batch.
        """
        import jax.numpy as jnp

        start = time.perf_counter()
        batch = len(id_sequences)
        max_bb = self.batch_buckets[-1]
        if not self.allow_bucket_growth and batch > max_bb:
            # split oversized direct-caller batches across the warmed
            # largest batch bucket instead of compiling a new one
            out: typing.List[np.ndarray] = []
            for i in range(0, batch, max_bb):
                out.extend(
                    self.synthesize_ids_batch(
                        id_sequences[i : i + max_bb],
                        speaker_ids=(
                            None
                            if speaker_ids is None
                            else speaker_ids[i : i + max_bb]
                        ),
                        length_scale=length_scale,
                        noise_scale=noise_scale,
                        noise_w=noise_w,
                        seed=seed,
                        max_frames_cap=max_frames_cap,
                    )
                )
            return out
        max_text = self.text_buckets[-1]
        if not self.allow_bucket_growth and any(
            len(s) > max_text for s in id_sequences
        ):
            # never compile on the request path: clamp to the largest
            # warmed bucket (segmentation makes >512-phoneme sentences
            # pathological inputs, not real speech)
            _LOGGER.warning(
                "Truncating %d phoneme sequence(s) to the largest "
                "warmed text bucket (%d)",
                sum(1 for s in id_sequences if len(s) > max_text),
                max_text,
            )
            id_sequences = [list(s)[:max_text] for s in id_sequences]
        # batch bucket: pad the batch dimension up so variable scheduler
        # batches reuse one executable, and so the batch divides dp
        b_bucket = pick_bucket(
            batch, self.batch_buckets, grow=self.allow_bucket_growth
        )
        if b_bucket % self.dp:
            b_bucket = -(-b_bucket // self.dp) * self.dp
        lengths = np.ones((b_bucket,), np.int32)  # pad rows: 1 phoneme
        lengths[:batch] = [len(s) for s in id_sequences]
        t_bucket = pick_bucket(
            int(lengths[:batch].max()),
            self.text_buckets,
            grow=self.allow_bucket_growth,
        )
        t_bucket = self._fallback_t("duration", b_bucket, t_bucket)
        ids = np.zeros((b_bucket, t_bucket), np.int32)
        for i, seq in enumerate(id_sequences):
            ids[i, : len(seq)] = np.asarray(seq, np.int32)

        sid = np.zeros((b_bucket,), np.int32)
        if speaker_ids is not None:
            sid[:batch] = np.asarray(speaker_ids, np.int32)

        rng = self._put(self._next_key(seed), sharded=False)
        ids_j = self._put(ids, sharded=True)
        lengths_j = self._put(lengths, sharded=True)
        sid_j = self._put(sid, sharded=True)

        self.stats.record_hit(hit_key("duration", b_bucket, t_bucket))
        self._note_compiled(hit_key("duration", b_bucket, t_bucket))
        durations, totals = self._dur_fn(
            self.params,
            ids_j,
            lengths_j,
            rng,
            jnp.float32(length_scale),
            jnp.float32(noise_w),
            sid_j,
        )

        # Speculative decode: dispatch the decode at a PREDICTED frame
        # bucket before the totals host sync, so the device starts the
        # expensive stage while the round trip is in flight.  Safe
        # because prior noise is frame-indexed (decode_frames): a
        # decode at any bucket >= the true frame count yields identical
        # valid samples.  A mispredicted (too-small) bucket just falls
        # back to a normal decode.
        spec_bucket = None
        spec_result = None
        with self._lock:
            est_fpp = self._ema_frames_per_phoneme
        if (
            self.speculative_decode
            and not self.allow_bucket_growth
            and est_fpp is not None
        ):
            est = (
                est_fpp * float(lengths[:batch].max())
                * float(length_scale) * 1.15
            )
            spec_bucket = pick_bucket(
                min(int(est) + 1, self.frame_buckets[-1]),
                self.frame_buckets,
            )
            spec_key = hit_key(
                "decode", b_bucket, t_bucket, spec_bucket
            )
            with self._lock:
                spec_compiled = spec_key in self._compiled_decode_keys
            if not spec_compiled:
                # speculating into an uncompiled signature would put
                # an XLA compile on the request path to save a ~ms
                # host round trip — strictly worse; skip
                spec_bucket = None
            else:
                self.stats.record_hit(spec_key)
                spec_result = self._dec_fn(
                    self.params,
                    ids_j,
                    lengths_j,
                    durations,
                    rng,
                    jnp.float32(noise_scale),
                    sid_j,
                    num_frames=spec_bucket,
                )

        totals_np = np.asarray(totals)  # host sync (tiny transfer)
        needed = int(totals_np[:batch].max())
        if not self.allow_bucket_growth:
            max_frames_cap = min(max_frames_cap, self.frame_buckets[-1])
        truncated = needed > max_frames_cap
        if needed > max_frames_cap:
            _LOGGER.warning(
                "Output of %d frames exceeds cap %d; truncating",
                needed,
                max_frames_cap,
            )
            needed = max_frames_cap
            # clamp the durations themselves so decode_frames reports
            # sample lengths consistent with the truncated audio
            dur_np = np.asarray(durations)
            cum = np.minimum(np.cumsum(dur_np, axis=1), max_frames_cap)
            dur_np = np.concatenate(
                [cum[:, :1], np.diff(cum, axis=1)], axis=1
            )
            durations = self._put(dur_np, sharded=True)
        f_bucket = pick_bucket(
            needed, self.frame_buckets, grow=self.allow_bucket_growth
        )

        # update the frames-per-phoneme estimate (normalized to unit
        # length_scale) for the next call's speculation
        obs = float(totals_np[:batch].sum()) / max(
            1.0, float(lengths[:batch].sum()) * float(length_scale)
        )
        obs = min(max(obs, 0.25), 64.0)
        with self._lock:
            prev = self._ema_frames_per_phoneme
            self._ema_frames_per_phoneme = (
                obs if prev is None else 0.9 * prev + 0.1 * obs
            )

        if (
            spec_result is not None
            and spec_bucket >= f_bucket
            and not truncated
        ):
            audio, sample_lengths = spec_result  # prediction held
            f_bucket = spec_bucket
        else:
            # round up to the nearest warmed decode bucket (profile
            # escape -> padding, not a hot-path compile)
            f_bucket = self._fallback_f(b_bucket, t_bucket, f_bucket)
            dec_key = hit_key("decode", b_bucket, t_bucket, f_bucket)
            self.stats.record_hit(dec_key)
            audio, sample_lengths = self._dec_fn(
                self.params,
                ids_j,
                lengths_j,
                durations,
                rng,
                jnp.float32(noise_scale),
                sid_j,
                num_frames=f_bucket,
            )
            with self._lock:
                self._compiled_decode_keys.add(dec_key)
            self._note_compiled(dec_key)
        audio_np = np.asarray(audio, dtype=np.float32)
        sample_lengths_np = np.asarray(sample_lengths)

        results = [
            audio_np[i, : int(sample_lengths_np[i])] for i in range(batch)
        ]

        elapsed = time.perf_counter() - start
        audio_sec = float(sample_lengths_np[:batch].sum()) / (
            self.config.audio.sample_rate
        )
        self.stats.record(elapsed, audio_sec)
        _LOGGER.debug(
            "RTF: %s (batch=%d, t_bucket=%d, f_bucket=%d)",
            self.stats.last_rtf,
            batch,
            t_bucket,
            f_bucket,
        )
        return results

    def synthesize_ids(
        self,
        phoneme_ids: typing.Sequence[int],
        *,
        speaker_id: typing.Optional[int] = None,
        length_scale: float = 1.0,
        noise_scale: float = 0.667,
        noise_w: float = 0.8,
        seed: typing.Optional[int] = None,
    ) -> np.ndarray:
        """Single utterance; routed through the batching scheduler when
        one is attached (server mode) so concurrent callers share TPU
        batches."""
        batcher = self.batcher
        if batcher is not None and not batcher.is_scheduler_thread:
            return batcher.submit(
                self,
                phoneme_ids,
                speaker_id=speaker_id or 0,
                length_scale=length_scale,
                noise_scale=noise_scale,
                noise_w=noise_w,
                seed=seed,
            ).result()
        return self.synthesize_ids_batch(
            [phoneme_ids],
            speaker_ids=None if speaker_id is None else [speaker_id],
            length_scale=length_scale,
            noise_scale=noise_scale,
            noise_w=noise_w,
            seed=seed,
        )[0]

    def synthesize_ids_chunked(
        self,
        phoneme_ids: typing.Sequence[int],
        *,
        speaker_id: typing.Optional[int] = None,
        length_scale: float = 1.0,
        noise_scale: float = 0.667,
        noise_w: float = 0.8,
        seed: typing.Optional[int] = None,
        chunk_frames: int = 128,
        overlap: int = 64,
        max_frames_cap: int = 32768,
        first_chunk_frames: typing.Optional[int] = None,
    ) -> typing.Iterator[np.ndarray]:
        """Streaming decode: yield float32 audio in ~chunk_frames pieces.

        First-chunk latency is one small decode instead of the whole
        utterance.  Chunks are decoded with ``overlap`` frames of context
        on each side and the seams trimmed; with overlap >= the
        decoder+flow receptive field (~48 frames) chunks match the
        non-chunked output to float tolerance.  One executable serves all
        chunks (the frame offset is a traced argument).

        ``first_chunk_frames`` (< chunk_frames) shrinks only the first
        decode window, cutting time-to-first-audio further at the cost
        of one extra compiled window size; noise is indexed by global
        frame, so output is seed-stable across grid choices.

        Note: audio here is NOT peak-normalized (normalization is
        per-utterance in the batch path; a stream can't know the final
        peak) — callers apply a fixed gain.

        With a batching scheduler attached (server mode) the first
        window is computed in a SHARED fused device call with every
        other concurrently-starting stream (:meth:`stream_start_batch`)
        — first-chunk latency under load stops scaling with the number
        of concurrent streams.  Output is identical either way:
        sampling is batch-invariant (model.py noise indexing).
        """
        batcher = self.batcher
        if batcher is not None and not batcher.is_scheduler_thread:
            gen = batcher.submit_stream(
                self,
                phoneme_ids,
                speaker_id=speaker_id or 0,
                length_scale=length_scale,
                noise_scale=noise_scale,
                noise_w=noise_w,
                seed=seed,
                chunk_frames=chunk_frames,
                overlap=overlap,
                max_frames_cap=max_frames_cap,
                first_chunk_frames=first_chunk_frames,
            ).result()
            yield from gen
            return
        yield from self.stream_start_batch(
            [phoneme_ids],
            speaker_ids=None if speaker_id is None else [speaker_id],
            length_scale=length_scale,
            noise_scale=noise_scale,
            noise_w=noise_w,
            seed=seed,
            chunk_frames=chunk_frames,
            overlap=overlap,
            max_frames_cap=max_frames_cap,
            first_chunk_frames=first_chunk_frames,
        )[0]

    def stream_start_batch(
        self,
        id_sequences: typing.Sequence[typing.Sequence[int]],
        *,
        speaker_ids: typing.Optional[typing.Sequence[int]] = None,
        length_scale: float = 1.0,
        noise_scale: float = 0.667,
        noise_w: float = 0.8,
        seed: typing.Optional[int] = None,
        chunk_frames: int = 128,
        overlap: int = 64,
        max_frames_cap: int = 32768,
        first_chunk_frames: typing.Optional[int] = None,
    ) -> typing.List[typing.Iterator[np.ndarray]]:
        """Batched streaming: one fused device call starts every stream.

        A single executable (``model.stream_start``) runs the encoder
        ONCE, samples durations, and decodes the first window for the
        whole batch — so N concurrent streams reach first audio in one
        device dispatch instead of 3·N.  Returns one generator per
        sequence yielding exactly what :meth:`synthesize_ids_chunked`
        yields (prior noise is frame-indexed and batch-invariant,
        duration noise position-indexed, so batched and solo streams
        are identical).  Continuation windows run per-stream at batch 1
        — they are spread over time and reuse the batched pass's
        durations and encoder stats.
        """
        import jax.numpy as jnp

        batch = len(id_sequences)
        max_bb = self.batch_buckets[-1]
        if not self.allow_bucket_growth and batch > max_bb:
            out: typing.List[typing.Iterator[np.ndarray]] = []
            for i in range(0, batch, max_bb):
                out.extend(
                    self.stream_start_batch(
                        id_sequences[i : i + max_bb],
                        speaker_ids=(
                            None
                            if speaker_ids is None
                            else speaker_ids[i : i + max_bb]
                        ),
                        length_scale=length_scale,
                        noise_scale=noise_scale,
                        noise_w=noise_w,
                        seed=seed,
                        chunk_frames=chunk_frames,
                        overlap=overlap,
                        max_frames_cap=max_frames_cap,
                        first_chunk_frames=first_chunk_frames,
                    )
                )
            return out
        max_text = self.text_buckets[-1]
        if not self.allow_bucket_growth and any(
            len(s) > max_text for s in id_sequences
        ):
            _LOGGER.warning(
                "Truncating stream input(s) to the largest warmed "
                "text bucket (%d)",
                max_text,
            )
            id_sequences = [list(s)[:max_text] for s in id_sequences]

        b_bucket = pick_bucket(
            batch, self.batch_buckets, grow=self.allow_bucket_growth
        )
        if b_bucket % self.dp:
            b_bucket = -(-b_bucket // self.dp) * self.dp
        lengths = np.ones((b_bucket,), np.int32)
        lengths[:batch] = [len(s) for s in id_sequences]
        first_cf = min(first_chunk_frames or chunk_frames, chunk_frames)
        window0 = first_cf + 2 * overlap

        t_bucket = pick_bucket(
            max(1, int(lengths[:batch].max())),
            self.text_buckets,
            grow=self.allow_bucket_growth,
        )
        # profile escape -> padding, not a hot-path compile (window0 is
        # config-fixed, so only the text axis can miss the warmed set;
        # continuations inherit the rounded-up t so their chunk
        # signatures stay inside the warmed grid too)
        t_bucket = self._fallback_t(
            "stream_start", b_bucket, t_bucket, window0
        )
        ids = np.zeros((b_bucket, t_bucket), np.int32)
        for i, seq in enumerate(id_sequences):
            ids[i, : len(seq)] = np.asarray(seq, np.int32)
        sid = np.zeros((b_bucket,), np.int32)
        if speaker_ids is not None:
            sid[:batch] = [s or 0 for s in speaker_ids]

        rng = self._put(self._next_key(seed), sharded=False)
        ids_j = self._put(ids, sharded=True)
        lengths_j = self._put(lengths, sharded=True)
        sid_j = self._put(sid, sharded=True)

        self.stats.record_hit(
            hit_key("stream_start", b_bucket, t_bucket, window0)
        )
        self._note_compiled(
            hit_key("stream_start", b_bucket, t_bucket, window0)
        )
        durations, totals, m_p, logs_p, audio0 = self._stream_start_fn(
            self.params,
            ids_j,
            lengths_j,
            rng,
            jnp.float32(length_scale),
            jnp.float32(noise_w),
            jnp.float32(noise_scale),
            sid_j,
            num_frames=window0,
        )
        totals_np = np.asarray(totals)  # ONE host sync for the batch
        audio0_np = np.asarray(audio0)

        if not self.allow_bucket_growth:
            max_frames_cap = min(max_frames_cap, self.frame_buckets[-1])

        if (
            self.batched_continuations
            and batch >= 2
            and not any(int(t) > max_frames_cap for t in totals_np[:batch])
            and int(totals_np[:batch].max()) > first_cf
        ):
            # continuation windows decode as ONE batched call per
            # window for the whole group (demand-paced driver thread);
            # bit-identical to the per-row path below.  Truncated rows
            # (total > cap) keep the per-row path: their durations are
            # re-capped per row.
            driver = _ContinuationDriver(
                self,
                (ids_j, lengths_j, sid_j, durations, m_p, logs_p),
                rng,
                noise_scale,
                [int(t) for t in totals_np[:batch]],
                first_cf,
                chunk_frames,
                overlap,
            )
            return [
                driver.row(i, audio0_np[i]) for i in range(batch)
            ]

        shared = _LazyHostRows(durations, m_p, logs_p)
        return [
            self._stream_row(
                ids[i : i + 1],
                int(lengths[i]),
                int(sid[i]),
                rng,
                int(totals_np[i]),
                audio0_np[i],
                shared,
                i,
                noise_scale=noise_scale,
                chunk_frames=chunk_frames,
                overlap=overlap,
                first_cf=first_cf,
                max_frames_cap=max_frames_cap,
            )
            for i in range(batch)
        ]

    def _stream_row(
        self,
        ids_row: np.ndarray,
        length_row: int,
        sid_row: int,
        rng: typing.Any,
        total: int,
        audio0_row: np.ndarray,
        shared: "_LazyHostRows",
        row: int,
        *,
        noise_scale: float,
        chunk_frames: int,
        overlap: int,
        first_cf: int,
        max_frames_cap: int,
    ) -> typing.Iterator[np.ndarray]:
        """Yield one stream's chunks from a batched stream start."""
        import jax.numpy as jnp

        start_time = time.perf_counter()
        hop = self.model.hp.hop_length
        truncated = total > max_frames_cap
        if truncated:
            _LOGGER.warning(
                "Chunked output of %d frames exceeds cap %d; truncating",
                total, max_frames_cap,
            )
            total = max_frames_cap

        # chunk grid: optional smaller first chunk, then uniform
        sizes = [first_cf]
        grid_end = sizes[0]
        while grid_end < total:
            sizes.append(chunk_frames)
            grid_end += chunk_frames

        dev: typing.Optional[typing.Tuple] = None

        def row_arrays():
            # lazy: the host fetch + per-row device_put happen after
            # the first chunk is already out (off the latency path),
            # once per stream, shared batch arrays fetched once
            nonlocal dev
            if dev is None:
                dur_np, m_p_np, logs_p_np = shared.host()
                dur_row = dur_np[row : row + 1]
                if truncated:
                    cum = np.minimum(
                        np.cumsum(dur_row, axis=1), max_frames_cap
                    )
                    dur_row = np.concatenate(
                        [cum[:, :1], np.diff(cum, axis=1)], axis=1
                    )
                dev = (
                    self._put(ids_row, sharded=False),
                    self._put(
                        np.array([length_row], np.int32), sharded=False
                    ),
                    self._put(
                        np.array([sid_row], np.int32), sharded=False
                    ),
                    self._put(
                        np.ascontiguousarray(dur_row), sharded=False
                    ),
                    self._put(
                        np.ascontiguousarray(m_p_np[row : row + 1]),
                        sharded=False,
                    ),
                    self._put(
                        np.ascontiguousarray(logs_p_np[row : row + 1]),
                        sharded=False,
                    ),
                )
            return dev

        emitted = 0
        start = 0
        for n_chunk, cf in enumerate(sizes):
            valid = min(cf, total - start)
            if valid <= 0:
                break
            window = cf + 2 * overlap
            # never fabricate left context before frame 0
            left = min(overlap, start)
            off = start - left
            if n_chunk == 0 and not truncated:
                # decoded in the batched fused pass
                chunk = np.asarray(
                    audio0_row[: valid * hop], dtype=np.float32
                )
            else:
                # (truncation invalidates the batched first window:
                # its durations predate the cap)
                i_j, l_j, s_j, d_j, m_j, lg_j = row_arrays()
                self.stats.record_hit(
                    hit_key(
                        "chunk", i_j.shape[0], i_j.shape[1], window
                    )
                )
                audio, _ = self._dec_chunk_fn(
                    self.params,
                    i_j,
                    l_j,
                    d_j,
                    rng,
                    jnp.float32(noise_scale),
                    s_j,
                    jnp.int32(off),
                    m_j,
                    lg_j,
                    num_frames=window,
                )
                chunk = np.asarray(
                    audio[0, left * hop : (left + valid) * hop],
                    dtype=np.float32,
                )
            emitted += valid
            start += cf
            yield chunk

        elapsed = time.perf_counter() - start_time
        self.stats.record(
            elapsed, emitted * hop / self.config.audio.sample_rate
        )

    # -- warmup ---------------------------------------------------------------

    def warmup(
        self,
        text_buckets: typing.Optional[typing.Sequence[int]] = None,
        frame_buckets: typing.Optional[typing.Sequence[int]] = None,
        batch_sizes: typing.Optional[typing.Sequence[int]] = None,
        chunk_windows: typing.Sequence[int] = (),
        parallel: int = 4,
        profile: typing.Optional[typing.Collection[str]] = None,
    ) -> float:
        """Pre-compile executables for the given bucket grid.

        Returns total compile wall-time.  Serving calls this at startup so
        no request ever pays XLA compilation
        (the reference has the same concern with thread preloading,
        mimic3_http/synthesis.py:106-110).

        ``parallel`` overlaps independent executable compilations from a
        thread pool (JAX compiles per-signature under per-entry locks,
        so distinct shapes compile concurrently).  On this project's
        remote-compile environment the grid is large (~150+
        executables) and compile latency dominates, so overlap is the
        difference between minutes and hours of startup.

        ``profile`` prunes the grid to a measured traffic profile: a
        collection of :func:`hit_key` strings (the ``executable_hits``
        table a previous run exposed via /api/stats).  Only executables
        named in the profile — plus their dispatch dependencies (a
        wanted decode needs its duration pass) — are compiled.  A
        single-voice deployment typically dispatches a dozen signatures
        out of the ~175-executable full grid.
        """
        import jax.numpy as jnp

        start = time.perf_counter()
        tb = tuple(text_buckets or self.text_buckets)
        fb = tuple(frame_buckets or self.frame_buckets)
        profile_set = (
            None
            if profile is None
            else expand_profile_batches(
                profile, self.batch_buckets, frame_buckets=fb
            )
        )

        def _want(key: str) -> bool:
            return profile_set is None or key in profile_set
        if batch_sizes is None:
            # smallest batch bucket only (dp on a mesh); serving warms
            # its full bucket ladder explicitly (server/app.py preload)
            batch_sizes = (self.batch_buckets[0],)
        else:
            # round requested sizes onto the serving bucket grid so the
            # warmed executables are the ones requests actually hit
            batch_sizes = sorted(
                {pick_bucket(b, self.batch_buckets) for b in batch_sizes}
            )
        rng = self._put(self._next_key(0), sharded=False)

        # progress logging: on remote-compile environments a full grid
        # can take the better part of an hour — a silent warmup is
        # indistinguishable from a hang (observed operationally)
        import itertools

        def combo_fbs(b: int, t: int) -> typing.Tuple[int, ...]:
            return tuple(
                f for f in fb if _want(hit_key("decode", b, t, f))
            )

        combos = [
            (b, t)
            for b in batch_sizes
            for t in tb
            if _want(hit_key("duration", b, t)) or combo_fbs(b, t)
        ]
        n_total = len(combos) + sum(
            len(combo_fbs(b, t)) for b, t in combos
        )
        done_counter = itertools.count(1)
        # every signature this warmup compiles; installed as the
        # session's warmed set at the end so profile-escaping traffic
        # can round up to a warmed bucket (set.add is GIL-atomic; the
        # warm_* callables run from the thread pool below)
        warmed_acc: typing.Set[str] = set()

        def warm_bt(b: int, t: int):
            if _SHUTDOWN_EVENT.is_set():
                return None  # cancelled between executables
            ids = self._put(np.zeros((b, t), np.int32), sharded=True)
            lengths = self._put(
                np.full((b,), t, np.int32), sharded=True
            )
            sid = self._put(np.zeros((b,), np.int32), sharded=True)
            durations, _ = self._dur_fn(
                self.params, ids, lengths, rng,
                jnp.float32(1.0), jnp.float32(0.8), sid,
            )
            warmed_acc.add(hit_key("duration", b, t))
            _LOGGER.info(
                "warmup %d/%d: duration b=%d t=%d (%.0fs)",
                next(done_counter), n_total, b, t,
                time.perf_counter() - start,
            )
            return ids, lengths, sid, durations

        def warm_dec(args, f):
            if args is None or _SHUTDOWN_EVENT.is_set():
                return  # cancelled between executables
            ids, lengths, sid, durations = args
            self._dec_fn(
                self.params, ids, lengths, durations, rng,
                jnp.float32(0.667), sid, num_frames=f,
            )
            with self._lock:
                self._compiled_decode_keys.add(
                    hit_key(
                        "decode", ids.shape[0], ids.shape[1], f
                    )
                )
            warmed_acc.add(
                hit_key("decode", ids.shape[0], ids.shape[1], f)
            )
            _LOGGER.info(
                "warmup %d/%d: decode b=%d f=%d (%.0fs)",
                next(done_counter), n_total,
                int(ids.shape[0]), f, time.perf_counter() - start,
            )
        if parallel > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=parallel) as pool:
                bt_args = list(pool.map(lambda c: warm_bt(*c), combos))
                list(
                    pool.map(
                        lambda af: warm_dec(*af),
                        [
                            (a, f)
                            for c, a in zip(combos, bt_args)
                            for f in combo_fbs(*c)
                        ],
                    )
                )
        else:
            for c in combos:
                a = warm_bt(*c)
                for f in combo_fbs(*c):
                    warm_dec(a, f)
        # streaming executables (batch 1): encoder pass + one chunked
        # decode per window size, so the first low-latency request
        # doesn't pay XLA compilation either
        n_chunk_compiles = 0
        warmed_stream_bt: typing.List[typing.Tuple[int, int]] = []
        for t in (tb if chunk_windows else ()):
            if _SHUTDOWN_EVENT.is_set():
                break
            w0_b1 = min(chunk_windows)
            wanted_ws = [
                w
                for w in chunk_windows
                if _want(hit_key("chunk", 1, t, w))
            ]
            if not wanted_ws and not _want(
                hit_key("stream_start", 1, t, w0_b1)
            ):
                continue
            ids = self._put(np.zeros((1, t), np.int32), sharded=False)
            lengths = self._put(
                np.full((1,), t, np.int32), sharded=False
            )
            sid = self._put(np.zeros((1,), np.int32), sharded=False)
            # the fused stream-start supplies durations + encoder
            # stats (and is itself the executable the b=1 streaming
            # path dispatches first)
            durations, _totals, m_p, logs_p, _a0 = (
                self._stream_start_fn(
                    self.params, ids, lengths, rng, jnp.float32(1.0),
                    jnp.float32(0.8), jnp.float32(0.667), sid,
                    num_frames=min(chunk_windows),
                )
            )
            warmed_acc.add(hit_key("stream_start", 1, t, w0_b1))
            for w in wanted_ws:
                self._dec_chunk_fn(
                    self.params, ids, lengths, durations, rng,
                    jnp.float32(0.667), sid, jnp.int32(0),
                    m_p, logs_p, num_frames=w,
                )
                warmed_acc.add(hit_key("chunk", 1, t, w))
                n_chunk_compiles += 1
            n_chunk_compiles += 1  # stream-start (b=1)
            warmed_stream_bt.append((1, t))
        # fused stream-start executables for the batched streaming
        # path: (batch bucket x text bucket) at the FIRST stream window
        # (continuation windows are the b=1 chunk executables above)
        if chunk_windows:
            w0 = min(chunk_windows)
            # the batched continuation driver decodes every follow-up
            # window at the group's (batch, text) bucket with the
            # LARGEST chunk window (chunk_frames + 2*overlap)
            w_cont = max(chunk_windows)

            def warm_stream(b: int, t: int):
                if _SHUTDOWN_EVENT.is_set():
                    return
                ids = self._put(np.zeros((b, t), np.int32), sharded=True)
                lens = self._put(
                    np.full((b,), t, np.int32), sharded=True
                )
                s = self._put(np.zeros((b,), np.int32), sharded=True)
                durations, _totals, m_p, logs_p, _a0 = (
                    self._stream_start_fn(
                        self.params, ids, lens, rng, jnp.float32(1.0),
                        jnp.float32(0.8), jnp.float32(0.667), s,
                        num_frames=w0,
                    )
                )
                warmed_acc.add(hit_key("stream_start", b, t, w0))
                if (
                    self.batched_continuations
                    and w_cont != w0
                    and _want(hit_key("chunk", b, t, w_cont))
                ):
                    if _SHUTDOWN_EVENT.is_set():
                        return
                    self._dec_chunk_fn(
                        self.params, ids, lens, durations, rng,
                        jnp.float32(0.667), s, jnp.int32(0),
                        m_p, logs_p, num_frames=w_cont,
                    )
                    warmed_acc.add(hit_key("chunk", b, t, w_cont))
                warmed_stream_bt.append((b, t))
                _LOGGER.info(
                    "warmup stream-start b=%d t=%d (%.0fs)",
                    b, t, time.perf_counter() - start,
                )

            # b=1 stream-starts were already compiled by the chunk
            # loop above (it dispatches the fused call per text bucket)
            stream_combos = [
                (b, t)
                for b in batch_sizes
                if b != 1
                for t in tb
                if _want(hit_key("stream_start", b, t, w0))
                or (
                    self.batched_continuations
                    and w_cont != w0
                    and _want(hit_key("chunk", b, t, w_cont))
                )
            ]
            if parallel > 1:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=parallel) as pool:
                    list(
                        pool.map(lambda c: warm_stream(*c), stream_combos)
                    )
            else:
                for c in stream_combos:
                    warm_stream(*c)
            n_chunk_compiles += len(stream_combos) * (
                2 if self.batched_continuations and w_cont != w0 else 1
            )
        # Drain barrier: everything above only DISPATCHES device work —
        # executable loads and executions queue on the device and, on a
        # network-attached TPU, block_until_ready is unreliable, so the
        # first REAL request would pay minutes of queued work (observed:
        # 6m38s first request after a "complete" warmup).  The device
        # executes enqueued programs in order, so dispatching one more
        # (already-warmed) duration pass and fetching its tiny totals
        # output forces completion of the entire grid.
        if not _SHUTDOWN_EVENT.is_set():
            # use an already-warmed signature so the barrier itself
            # never adds an executable outside the (possibly pruned)
            # grid: a duration combo if any was warmed, else a warmed
            # stream-start (streaming-only profile), else nothing was
            # dispatched and no barrier is needed
            if combos:
                b_bar, t_bar = combos[0]
                ids_d = self._put(
                    np.zeros((b_bar, t_bar), np.int32), sharded=True
                )
                lengths_d = self._put(
                    np.full((b_bar,), t_bar, np.int32), sharded=True
                )
                sid_d = self._put(
                    np.zeros((b_bar,), np.int32), sharded=True
                )
                _, totals_d = self._dur_fn(
                    self.params, ids_d, lengths_d, rng,
                    jnp.float32(1.0), jnp.float32(0.8), sid_d,
                )
                np.asarray(totals_d)  # host sync = hard barrier
            elif warmed_stream_bt and chunk_windows:
                b_bar, t_bar = warmed_stream_bt[0]
                sharded = b_bar > 1
                ids_d = self._put(
                    np.zeros((b_bar, t_bar), np.int32), sharded=sharded
                )
                lengths_d = self._put(
                    np.full((b_bar,), t_bar, np.int32), sharded=sharded
                )
                sid_d = self._put(
                    np.zeros((b_bar,), np.int32), sharded=sharded
                )
                _, totals_d, _m, _ls, _a0 = self._stream_start_fn(
                    self.params, ids_d, lengths_d, rng,
                    jnp.float32(1.0), jnp.float32(0.8),
                    jnp.float32(0.667), sid_d,
                    num_frames=min(chunk_windows),
                )
                np.asarray(totals_d)  # host sync = hard barrier
        elapsed = time.perf_counter() - start
        self.stats.compile_count += n_total + n_chunk_compiles
        with self._lock:
            self._warmup_executable_baseline = self.jit_executable_count()
            if self._warmed_keys is None:
                self._warmed_keys = warmed_acc
            else:  # repeated warmups extend the known-compiled set
                self._warmed_keys |= warmed_acc
        _LOGGER.info("Warmup compiled %s buckets in %.1fs",
                     self.stats.compile_count, elapsed)
        return elapsed
