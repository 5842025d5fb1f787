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


def _gather(args) -> list:
    """Resolve the `path` operand: a single audio file or a directory
    (reference speaker-process:898 takes either)."""
    target = Path(args.directory)
    if target.is_file():
        return [target]
    return PR.find_audio_files(target, recursive=not args.no_recursive)


def cmd_process(args) -> int:
    paths = _gather(args)
    if args.limit:
        paths = paths[: args.limit]
    if not paths:
        err(f"no audio files found under {args.directory}")
        return 1
    if args.dry_run:
        for p in paths:
            print(p)
        info(args, f"[dry-run] would process {len(paths)} recording(s)")
        return 0
    info(args, f"Processing {len(paths)} recording(s) with {args.parallel} worker(s)")
    results = PR.process_batch(
        paths,
        parallel=args.parallel,
        stt_backends=_backends(args),
        context=args.context,
        use_llm=args.use_llm,
        embed_backend=args.backend,
        output_dir=args.output_dir,
        skip_existing=args.skip_existing,
    )
    info(args, f"Completed: {results['completed']}, failed: {results['failed']}")
    for path, error in results["errors"].items():
        err(f"{path}: {error}")
    return 0 if results["failed"] == 0 else 1


def cmd_queue(args) -> int:
    q = ProcessingQueue()
    paths = list(args.add or [])
    if args.path:
        target = Path(args.path)
        if target.is_file():
            paths.append(target)
        else:
            paths.extend(
                PR.find_audio_files(target, recursive=args.recursive)
            )
    if paths:
        for p in paths:
            q.add(p, context=args.context)
            info(args, f"Queued {p}")
        return 0
    for item in q.items(args.status):
        print(f"{item['status']:<12} {item['path']}")
    return 0


def cmd_run(args) -> int:
    q = ProcessingQueue()
    pending = q.items("pending")
    if args.limit:
        pending = pending[: args.limit]
    if not pending:
        info(args, "Queue empty.")
        return 0
    if args.dry_run:
        for i in pending:
            print(i["path"])
        info(args, f"[dry-run] would run {len(pending)} item(s)")
        return 0
    results = PR.process_batch(
        [i["path"] for i in pending],
        queue=q,
        parallel=args.parallel,
        stt_backends=_backends(args),
        use_llm=args.use_llm,
        embed_backend=args.backend,
        output_dir=args.output_dir,
        skip_existing=args.skip_existing,
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
    n = ProcessingQueue().clear(
        only_completed=args.completed_only, status=args.status
    )
    info(args, f"Removed {n} item(s)")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="speaker-process",
                                     description="Batch processing orchestrator")
    add_quiet(parser)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("process", help="Process recording(s) immediately")
    p.add_argument("directory", metavar="path",
                   help="Path to audio file or directory")
    p.add_argument("--parallel", "-p", type=int, default=PR.DEFAULT_PARALLEL)
    p.add_argument("--stt-backends", help="Comma list; default tpu-diarize")
    p.add_argument("--backend", "-b", help="Embedding backend")
    p.add_argument("--context", "-c", help="Context name for new recordings")
    p.add_argument("--use-llm", action="store_true")
    p.add_argument("--output-dir", "-o", help="Output directory for transcripts")
    p.add_argument("--recursive", "-r", action="store_true", default=True,
                   help="Recursively scan directories (default; see --no-recursive)")
    p.add_argument("--no-recursive", action="store_true")
    p.add_argument("--skip-existing", "-s", action="store_true",
                   help="Skip already processed recordings")
    p.add_argument("--limit", type=int)
    p.add_argument("--dry-run", "-n", action="store_true",
                   help="Show what would run without executing")
    p.set_defaults(func=cmd_process)

    p = sub.add_parser("queue", help="Show or add to the queue")
    p.add_argument("path", nargs="?",
                   help="Audio file or directory to enqueue (reference form)")
    p.add_argument("--add", nargs="+")
    p.add_argument("--backend", "-b", help="(recorded only) STT backends")
    p.add_argument("--context", "-c", help="Context name for new recordings")
    p.add_argument("--recursive", "-r", action="store_true")
    p.add_argument("--status")
    p.set_defaults(func=cmd_queue)

    p = sub.add_parser("run", help="Run pending queue items")
    p.add_argument("--limit", "-l", type=int,
                   help="Maximum number of items to process")
    p.add_argument("--parallel", "-p", type=int, default=PR.DEFAULT_PARALLEL)
    p.add_argument("--stt-backends")
    p.add_argument("--use-llm", action="store_true")
    p.add_argument("--backend", "-b")
    p.add_argument("--output-dir", "-o")
    p.add_argument("--skip-existing", "-s", action="store_true")
    p.add_argument("--dry-run", "-n", action="store_true")
    p.set_defaults(func=cmd_run)

    p = sub.add_parser("status", help="Queue status")
    p.add_argument("--format", "-f", choices=["text", "json"], default="text")
    p.set_defaults(func=cmd_status)

    p = sub.add_parser("clear-queue", help="Clear the queue")
    p.add_argument("--completed-only", action="store_true")
    p.add_argument("--status", "-s",
                   choices=["pending", "processing", "completed", "failed", "skipped"],
                   help="Only clear items with this status")
    p.add_argument("--force", "-f", action="store_true", help="Skip confirmation")
    p.set_defaults(func=cmd_clear_queue)

    return parser


def main(argv: list[str] | None = None) -> int:
    from .common import parse_cli

    args = parse_cli(build_parser(), argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
