"""``mimic3-server`` entry point.

Flag-compatible with the reference server CLI
(reference: mimic3_http/args.py:24-111, default port 59125) plus
TPU-serving knobs (--max-batch, --batch-delay-ms, --warmup).
"""

from __future__ import annotations

import argparse
import asyncio
import logging
import typing
from dataclasses import dataclass, field

_LOGGER = logging.getLogger(__name__)

_MISSING = object()


@dataclass
class ServerConfig:
    host: str = "0.0.0.0"
    port: int = 59125
    voice: typing.Optional[str] = None
    speaker: typing.Optional[str] = None
    default_voice: typing.Optional[str] = None
    show_openapi: bool = True
    voices_dir: typing.Optional[typing.List[str]] = None
    preload_voice: typing.List[str] = field(default_factory=list)
    length_scale: typing.Optional[float] = None
    noise_scale: typing.Optional[float] = None
    noise_w: typing.Optional[float] = None
    cache_dir: typing.Optional[str] = None
    cache_dir_is_temp: bool = False  # auto-created: removed at shutdown
    max_text_length: typing.Optional[int] = None
    deterministic: bool = False
    no_download: bool = False
    play_program: str = "aplay -q -t wav"
    num_workers: int = 8
    max_batch: int = 16
    batch_delay_ms: float = 5.0
    batch_delay_max_ms: float = 25.0
    warmup: bool = False
    warmup_profile: typing.Optional[str] = None
    warmup_parallel: int = 4
    profile_dir: typing.Optional[str] = None


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="mimic3-server",
        description="TPU-native text-to-speech HTTP server "
        "(Mimic 3 API compatible)",
    )
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=59125)
    parser.add_argument("--voice", help="Default voice")
    parser.add_argument(
        "--speaker",
        help="Default speaker (name or id) appended to the default "
        "voice when it has no #speaker suffix "
        "(reference: mimic3_http/args.py:42-44)",
    )
    parser.add_argument(
        "--default-voice",
        help="Default voice key to select in the web interface "
        "(reference: mimic3_http/args.py:91-94)",
    )
    parser.add_argument(
        "--no-show-openapi",
        action="store_true",
        help="Don't show the OpenAPI link in the web interface "
        "(reference: mimic3_http/args.py:98-100)",
    )
    parser.add_argument(
        "--version",
        action="store_true",
        help="Print version to console and exit",
    )
    parser.add_argument(
        "--voices-dir", action="append", help="Extra voice directories"
    )
    parser.add_argument(
        "--preload-voice", action="append", default=[],
        help="Load voice(s) at startup",
    )
    parser.add_argument("--length-scale", type=float)
    parser.add_argument("--noise-scale", type=float)
    parser.add_argument("--noise-w", type=float)
    parser.add_argument(
        "--cache-dir",
        nargs="?",
        const=None,
        default=_MISSING,
        help="Cache WAV files (no argument = temporary dir)",
    )
    parser.add_argument("--max-text-length", type=int)
    parser.add_argument("--deterministic", action="store_true")
    parser.add_argument("--no-download", action="store_true")
    parser.add_argument(
        "--play-program",
        default="aplay -q -t wav",
        help="Program for audioTarget=server playback",
    )
    parser.add_argument(
        "--num-threads",
        "--num-workers",
        dest="num_workers",
        type=int,
        default=8,
        help="Host-side synthesis workers (phonemization etc.)",
    )
    parser.add_argument(
        "--max-batch", type=int, default=16,
        help="Max requests packed into one TPU batch",
    )
    parser.add_argument(
        "--batch-delay-ms", type=float, default=5.0,
        help="Max wait to fill a TPU batch",
    )
    parser.add_argument(
        "--batch-delay-max-ms", type=float, default=25.0,
        help="Upper bound the batch window stretches to under load "
        "(unresolved requests + open streams promise more arrivals); "
        "a lone client never waits past --batch-delay-ms",
    )
    parser.add_argument(
        "--warmup", action="store_true",
        help="Pre-compile all buckets for preloaded voices at startup",
    )
    parser.add_argument(
        "--warmup-profile",
        help="JSON traffic profile (a saved /api/stats payload, or a "
        "bare executable_hits table): --warmup compiles only the "
        "executables named in it instead of the full bucket grid",
    )
    parser.add_argument(
        "--warmup-parallel", type=int, default=4,
        help="Concurrent executable compiles/loads during --warmup "
        "(loads through a remote compile service are latency-bound, "
        "so more overlap directly shortens startup)",
    )
    parser.add_argument(
        "--profile-dir",
        help="Directory for jax.profiler traces captured via "
        "POST /api/profile (TensorBoard/xprof format)",
    )
    parser.add_argument(
        "--dp", type=int, default=None,
        help="Serve data-parallel over this many devices (batch "
        "dimension sharded across a jax mesh); -1 = all devices, "
        "0/1 = single device (and overrides $MIMIC3_DP). "
        "Default: $MIMIC3_DP, else single device.",
    )
    parser.add_argument("--debug", action="store_true")
    return parser


def config_from_args(args: argparse.Namespace) -> ServerConfig:
    import tempfile

    cache_dir: typing.Optional[str]
    cache_dir_is_temp = False
    if args.cache_dir is _MISSING:
        cache_dir = None  # caching disabled
    elif args.cache_dir is None:
        cache_dir = tempfile.mkdtemp(prefix="mimic3_tpu_cache_")
        cache_dir_is_temp = True
    else:
        cache_dir = args.cache_dir

    voice = args.voice
    if voice and args.speaker is not None and "#" not in voice:
        # ref semantics: default speaker rides on the default voice
        voice = f"{voice}#{args.speaker}"

    return ServerConfig(
        host=args.host,
        port=args.port,
        voice=voice,
        speaker=args.speaker,
        default_voice=args.default_voice,
        show_openapi=not args.no_show_openapi,
        voices_dir=args.voices_dir,
        preload_voice=args.preload_voice,
        length_scale=args.length_scale,
        noise_scale=args.noise_scale,
        noise_w=args.noise_w,
        cache_dir=cache_dir,
        cache_dir_is_temp=cache_dir_is_temp,
        max_text_length=args.max_text_length,
        deterministic=args.deterministic,
        no_download=args.no_download,
        play_program=args.play_program,
        num_workers=args.num_workers,
        max_batch=args.max_batch,
        batch_delay_ms=args.batch_delay_ms,
        batch_delay_max_ms=args.batch_delay_max_ms,
        warmup=args.warmup,
        warmup_profile=args.warmup_profile,
        warmup_parallel=args.warmup_parallel,
        profile_dir=args.profile_dir,
    )


def main(argv: typing.Optional[typing.Sequence[str]] = None) -> int:
    args = build_arg_parser().parse_args(argv)
    if args.version:
        from .. import __version__

        print(__version__)
        return 0
    logging.basicConfig(
        level=logging.DEBUG if args.debug else logging.INFO
    )
    import os

    if args.dp is not None:
        if args.dp in (0, 1):
            # explicit single-device request overrides an inherited
            # MIMIC3_DP (the flag's documented semantics win)
            os.environ.pop("MIMIC3_DP", None)
        else:
            # voice sessions read this at load time (runtime/voice.py)
            os.environ["MIMIC3_DP"] = str(args.dp)

    from .app import TtsApp, build_server

    config = config_from_args(args)
    app = TtsApp(config)

    # systemd/docker stop via SIGTERM must unwind like Ctrl-C so the
    # finally-block cleanup (scheduler, auto-created cache dir) runs.
    #
    # Kill safety: on this project's TPU environment, dying while an XLA
    # compile is in flight wedges the device relay for hours (round-3
    # incident, docs/STATUS.md).  SIGTERM therefore DEFERS while device
    # calls are in flight: warmup is cancelled at the next executable
    # boundary, in-flight compiles finish, then the process unwinds.  A
    # second SIGTERM forces immediate exit (operator escape hatch).
    from ..runtime.session import (
        graceful_shutdown_requested,
        install_kill_safe_sigterm,
        wait_device_idle,
    )

    # installed BEFORE preload: the warmup grid is exactly where a
    # mid-compile SIGTERM used to land (it runs for minutes-to-hours on
    # a cold cache)
    install_kill_safe_sigterm()
    try:
        app.preload()
        if graceful_shutdown_requested():
            return 0  # SIGTERM arrived during warmup
        server = build_server(app)
        asyncio.run(server.serve(config.host, config.port))
    except KeyboardInterrupt:
        pass
    finally:
        app.shutdown()
        # never exit with a compile still running on a daemon thread
        # (e.g. the scheduler hit a cold bucket): same relay-wedge risk
        if not wait_device_idle(timeout=1800):
            _LOGGER.error(
                "exiting with device calls still in flight after "
                "1800s — possible TPU relay hang"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
