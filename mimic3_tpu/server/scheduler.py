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

    @property
    def mean_batch_size(self) -> float:
        return self.items / self.batches if self.batches else 0.0


class BatchScheduler:
    """A single device-owning thread that drains a request queue."""

    def __init__(
        self,
        max_batch: int = 16,
        max_delay_ms: float = 5.0,
    ):
        self.max_batch = max_batch
        self.max_delay = max_delay_ms / 1000.0
        self.stats = SchedulerStats()
        self._closed = False
        self._submit_lock = threading.Lock()
        self._queue: "queue.Queue[typing.Optional[_BatchItem]]" = (
            queue.Queue()
        )
        self._pending: typing.Optional[_BatchItem] = None
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="tts-batch-scheduler"
        )
        self._thread.start()

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
        deadline = time.monotonic() + self.max_delay
        # on a dp>1 mesh, cap at a dp-divisible size so the packed batch
        # shards evenly across the data-parallel devices (the session
        # pads any remainder up to a batch bucket regardless)
        dp = int(getattr(first.session, "dp", 1))
        limit = max(dp, (self.max_batch // dp) * dp)
        while len(batch) < limit:
            timeout = deadline - time.monotonic()
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
                for item, audio in zip(batch, results):
                    item.future.set_result(audio)
            except Exception as err:
                _LOGGER.exception("Batch synthesis failed")
                for item in batch:
                    if not item.future.done():
                        item.future.set_exception(err)
