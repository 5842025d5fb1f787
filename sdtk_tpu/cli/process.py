"""``speaker-process`` CLI: process / queue / run / status / clear-queue
(reference speaker-process:866-938)."""

from __future__ import annotations

import argparse
from pathlib import Path

from ..pipeline import process as PR
from ..store.queue import ProcessingQueue
from .common import add_quiet, emit_json, err, info


def _backends(args) -> list[str]:
    return [b.strip() for b in args.stt_backends.split(",")] if args.stt_backends else ["tpu-diarize"]


def cmd_process(args) -> int:
    paths = PR.find_audio_files(args.directory, recursive=not args.no_recursive)
    if args.limit:
        paths = paths[: args.limit]
    if not paths:
        err(f"no audio files found under {args.directory}")
        return 1
    info(args, f"Processing {len(paths)} recording(s) with {args.parallel} worker(s)")
    results = PR.process_batch(
        paths,
        parallel=args.parallel,
        stt_backends=_backends(args),
        context=args.context,
        use_llm=args.use_llm,
        embed_backend=args.backend,
    )
    info(args, f"Completed: {results['completed']}, failed: {results['failed']}")
    for path, error in results["errors"].items():
        err(f"{path}: {error}")
    return 0 if results["failed"] == 0 else 1


def cmd_queue(args) -> int:
    q = ProcessingQueue()
    if args.add:
        for p in args.add:
            q.add(p)
            info(args, f"Queued {p}")
        return 0
    for item in q.items(args.status):
        print(f"{item['status']:<12} {item['path']}")
    return 0


def cmd_run(args) -> int:
    q = ProcessingQueue()
    pending = q.items("pending")
    if not pending:
        info(args, "Queue empty.")
        return 0
    results = PR.process_batch(
        [i["path"] for i in pending],
        queue=q,
        parallel=args.parallel,
        stt_backends=_backends(args),
        use_llm=args.use_llm,
        embed_backend=args.backend,
    )
    info(args, f"Completed: {results['completed']}, failed: {results['failed']}")
    return 0 if results["failed"] == 0 else 1


def cmd_status(args) -> int:
    counts = ProcessingQueue().counts()
    if args.format == "json":
        emit_json(counts)
    else:
        for status, n in counts.items():
            print(f"{status:<12} {n}")
    return 0


def cmd_clear_queue(args) -> int:
    n = ProcessingQueue().clear(only_completed=args.completed_only)
    info(args, f"Removed {n} item(s)")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="speaker-process",
                                     description="Batch processing orchestrator")
    add_quiet(parser)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("process", help="Discover and process a directory")
    p.add_argument("directory")
    p.add_argument("--parallel", type=int, default=PR.DEFAULT_PARALLEL)
    p.add_argument("--stt-backends", help="Comma list; default tpu-diarize")
    p.add_argument("--context")
    p.add_argument("--use-llm", action="store_true")
    p.add_argument("--backend", "-b", help="Embedding backend")
    p.add_argument("--no-recursive", action="store_true")
    p.add_argument("--limit", type=int)
    p.set_defaults(func=cmd_process)

    p = sub.add_parser("queue", help="Show or add to the queue")
    p.add_argument("--add", nargs="+")
    p.add_argument("--status")
    p.set_defaults(func=cmd_queue)

    p = sub.add_parser("run", help="Run pending queue items")
    p.add_argument("--parallel", type=int, default=PR.DEFAULT_PARALLEL)
    p.add_argument("--stt-backends")
    p.add_argument("--use-llm", action="store_true")
    p.add_argument("--backend", "-b")
    p.set_defaults(func=cmd_run)

    p = sub.add_parser("status", help="Queue status")
    p.add_argument("--format", choices=["text", "json"], default="text")
    p.set_defaults(func=cmd_status)

    p = sub.add_parser("clear-queue", help="Clear the queue")
    p.add_argument("--completed-only", action="store_true")
    p.set_defaults(func=cmd_clear_queue)

    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
