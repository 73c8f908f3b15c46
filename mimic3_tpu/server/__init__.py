"""HTTP serving tier: asyncio server, batching scheduler, web UI.

Endpoint-compatible with the reference server
(reference: mimic3_http/app.py:157-332): ``/api/tts``, ``/api/voices``,
``/api/healthcheck``, MaryTTS ``/process`` + ``/voices``, web UI at
``/``, OpenAPI spec at ``/openapi``.

Architecture difference (TPU-first): the reference runs N threads each
owning a whole engine and an ONNX session; here concurrent requests are
packed into device batches by :class:`~mimic3_tpu.server.scheduler.
BatchScheduler`, so one chip serves many streams at batched throughput.
"""
