"""Device batching scheduler: packs concurrent requests into TPU batches.

The reference scales with N synthesis threads that each run batch-1 ONNX
calls (reference: mimic3_http/synthesis.py:88-136).  On TPU, batch-1
decoding leaves most of the MXU idle; this scheduler owns the device and
coalesces compatible requests (same session + scale settings; speaker ids
may differ) into one batched call, up to ``max_batch`` or ``max_delay``.

Attach a scheduler to a :class:`~mimic3_tpu.runtime.session.VitsSession`
(``session.batcher = scheduler``) and every ``synthesize_ids`` call from
any thread — CLI sentences, SSML fragments, HTTP requests — is batched
transparently.
"""

from __future__ import annotations

import logging
import queue
import threading
import time
import typing
from concurrent.futures import Future
from dataclasses import dataclass, field


_LOGGER = logging.getLogger(__name__)


@dataclass
class _BatchItem:
    session: typing.Any
    ids: typing.Sequence[int]
    speaker_id: int
    length_scale: float
    noise_scale: float
    noise_w: float
    seed: typing.Optional[int]
    # streaming request: (chunk_frames, overlap, max_frames_cap,
    # first_chunk_frames) — resolved to a chunk GENERATOR instead of
    # audio; None = regular full-utterance synthesis
    stream: typing.Optional[typing.Tuple] = None
    future: "Future" = field(default_factory=Future)

    def batch_key(self) -> typing.Tuple:
        # requests batch together when the traced scalars, session and
        # chunk grid match; per-example speaker ids ride along as an
        # array
        return (
            id(self.session),
            self.length_scale,
            self.noise_scale,
            self.noise_w,
            self.seed,
            self.stream,
        )


@dataclass
class SchedulerStats:
    batches: int = 0
    items: int = 0
    # batches whose collect window was adaptively extended past the
    # base delay because observed load promised more compatible arrivals
    adaptive_extensions: int = 0

    @property
    def mean_batch_size(self) -> float:
        return self.items / self.batches if self.batches else 0.0


class _TrackedStream:
    """Passthrough chunk iterator that reports open/closed to the
    scheduler's load estimate.  ``yield from`` propagates close() into
    it, so client disconnects decrement the open-stream count."""

    def __init__(self, scheduler: "BatchScheduler", inner):
        self._scheduler = scheduler
        self._inner = inner
        self._open = True
        scheduler._stream_opened()

    def __iter__(self):
        return self

    def __next__(self):
        try:
            return next(self._inner)
        except BaseException:
            self._finish()
            raise

    def close(self) -> None:
        try:
            self._inner.close()
        finally:
            self._finish()

    def _finish(self) -> None:
        if self._open:
            self._open = False
            self._scheduler._stream_closed()

    def __del__(self):  # unconsumed + dropped: still release the slot
        self._finish()


class BatchScheduler:
    """A single device-owning thread that drains a request queue.

    Coalescing is load-adaptive: every collect waits at least
    ``max_delay`` for compatible requests (the base window), and when
    the observed load — unresolved submissions plus open streaming
    generators — promises more arrivals than have been collected, the
    window stretches up to ``adaptive_delay`` waiting for them.  Under
    sustained concurrent streaming the clients re-arrive asynchronously
    after their first windows; the stretched window re-coalesces those
    re-arrivals into large fused stream starts instead of letting small
    batches serialize on the device (each dispatch costs a tunnel
    round-trip).  A lone client never waits past the base window: its
    load estimate is 1, already satisfied by its own request.
    """

    def __init__(
        self,
        max_batch: int = 16,
        max_delay_ms: float = 5.0,
        adaptive_delay_ms: typing.Optional[float] = 25.0,
    ):
        self.max_batch = max_batch
        self.max_delay = max_delay_ms / 1000.0
        self.adaptive_delay = max(
            self.max_delay,
            (adaptive_delay_ms or 0.0) / 1000.0,
        )
        self.stats = SchedulerStats()
        self._closed = False
        self._submit_lock = threading.Lock()
        self._load_lock = threading.Lock()
        self._unresolved = 0
        self._open_streams = 0
        self._queue: "queue.Queue[typing.Optional[_BatchItem]]" = (
            queue.Queue()
        )
        self._pending: typing.Optional[_BatchItem] = None
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="tts-batch-scheduler"
        )
        self._thread.start()

    # -- load estimate -----------------------------------------------------------

    def _stream_opened(self) -> None:
        with self._load_lock:
            self._open_streams += 1

    def _stream_closed(self) -> None:
        with self._load_lock:
            self._open_streams -= 1

    def _item_resolved(self, _future) -> None:
        with self._load_lock:
            self._unresolved -= 1

    def current_load(self) -> int:
        """Concurrency estimate: requests awaiting a device call plus
        streams currently being consumed (each will re-arrive)."""
        with self._load_lock:
            return self._unresolved + self._open_streams

    # -- client API ------------------------------------------------------------

    def submit(
        self,
        session,
        ids: typing.Sequence[int],
        *,
        speaker_id: int = 0,
        length_scale: float = 1.0,
        noise_scale: float = 0.667,
        noise_w: float = 0.8,
        seed: typing.Optional[int] = None,
    ) -> "Future[np.ndarray]":
        item = _BatchItem(
            session=session,
            ids=list(ids),
            speaker_id=speaker_id,
            length_scale=length_scale,
            noise_scale=noise_scale,
            noise_w=noise_w,
            seed=seed,
        )
        # lock closes the check-then-put race with shutdown(): no item
        # can land after the None sentinel
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("BatchScheduler is shut down")
            with self._load_lock:
                self._unresolved += 1
            item.future.add_done_callback(self._item_resolved)
            self._queue.put(item)
        return item.future

    def submit_stream(
        self,
        session,
        ids: typing.Sequence[int],
        *,
        speaker_id: int = 0,
        length_scale: float = 1.0,
        noise_scale: float = 0.667,
        noise_w: float = 0.8,
        seed: typing.Optional[int] = None,
        chunk_frames: int = 128,
        overlap: int = 64,
        max_frames_cap: int = 32768,
        first_chunk_frames: typing.Optional[int] = None,
    ) -> "Future":
        """Submit a streaming start; the future resolves to a chunk
        generator.  Concurrent stream starts with the same settings
        share ONE fused batched device call
        (session.stream_start_batch), so first-chunk latency under
        load stops scaling with the number of concurrent streams."""
        item = _BatchItem(
            session=session,
            ids=list(ids),
            speaker_id=speaker_id,
            length_scale=length_scale,
            noise_scale=noise_scale,
            noise_w=noise_w,
            seed=seed,
            stream=(
                chunk_frames, overlap, max_frames_cap,
                first_chunk_frames,
            ),
        )
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("BatchScheduler is shut down")
            with self._load_lock:
                self._unresolved += 1
            item.future.add_done_callback(self._item_resolved)
            self._queue.put(item)
        return item.future

    def shutdown(self) -> None:
        with self._submit_lock:
            self._closed = True
            self._queue.put(None)
        self._thread.join(timeout=10)

    @property
    def is_scheduler_thread(self) -> bool:
        return threading.current_thread() is self._thread

    # -- device loop ---------------------------------------------------------------

    def _collect(self, first: _BatchItem) -> typing.List[_BatchItem]:
        batch = [first]
        key = first.batch_key()
        start = time.monotonic()
        base_deadline = start + self.max_delay
        hard_deadline = start + self.adaptive_delay
        # on a dp>1 mesh, cap at a dp-divisible size so the packed batch
        # shards evenly across the data-parallel devices (the session
        # pads any remainder up to a batch bucket regardless)
        dp = int(getattr(first.session, "dp", 1))
        limit = max(dp, (self.max_batch // dp) * dp)
        # load-adaptive target: how many compatible arrivals the current
        # concurrency promises (includes this batch's own items)
        target = min(limit, max(1, self.current_load()))
        extended = False
        while len(batch) < limit:
            now = time.monotonic()
            if len(batch) >= target:
                deadline = base_deadline
            else:
                deadline = hard_deadline
                if now >= base_deadline:
                    extended = True
            timeout = deadline - now
            if timeout <= 0:
                break
            try:
                nxt = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if nxt is None:
                self._pending = None
                self._queue.put(None)  # re-signal shutdown
                break
            if nxt.batch_key() == key:
                batch.append(nxt)
            else:
                # incompatible settings: becomes the next batch's seed
                self._pending = nxt
                break
        if extended:
            self.stats.adaptive_extensions += 1
        return batch

    def _run(self) -> None:
        while True:
            if self._pending is not None:
                first, self._pending = self._pending, None
            else:
                first = self._queue.get()
            if first is None:
                return
            batch = self._collect(first)
            self.stats.batches += 1
            self.stats.items += len(batch)
            try:
                if first.stream is not None:
                    cf, ov, cap, fcf = first.stream
                    results = first.session.stream_start_batch(
                        [item.ids for item in batch],
                        speaker_ids=[
                            item.speaker_id for item in batch
                        ],
                        length_scale=first.length_scale,
                        noise_scale=first.noise_scale,
                        noise_w=first.noise_w,
                        seed=first.seed,
                        chunk_frames=cf,
                        overlap=ov,
                        max_frames_cap=cap,
                        first_chunk_frames=fcf,
                    )
                else:
                    results = first.session.synthesize_ids_batch(
                        [item.ids for item in batch],
                        speaker_ids=[item.speaker_id for item in batch],
                        length_scale=first.length_scale,
                        noise_scale=first.noise_scale,
                        noise_w=first.noise_w,
                        seed=first.seed,
                    )
                if first.stream is not None:
                    # wrap each chunk generator so the load estimate
                    # sees it until the client finishes/disconnects
                    results = [
                        _TrackedStream(self, gen) for gen in results
                    ]
                for item, audio in zip(batch, results):
                    item.future.set_result(audio)
            except Exception as err:
                _LOGGER.exception("Batch synthesis failed")
                for item in batch:
                    if not item.future.done():
                        item.future.set_exception(err)
