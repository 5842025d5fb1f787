"""``speaker-catalog`` CLI: recording inventory + contexts
(reference speaker-catalog command tree)."""

from __future__ import annotations

import argparse
import json

from ..store import catalog as C
from .common import add_quiet, emit_json, err, info, table


def _resolve(ref: str) -> str | None:
    return C.resolve_b3sum(ref)


def cmd_add(args) -> int:
    try:
        entry = C.add_recording(
            args.audio,
            context=args.context,
            tags=args.tags.split(",") if args.tags else None,
            force=args.force,
        )
    except FileNotFoundError:
        err(f"audio file not found: {args.audio}")
        return 1
    except FileExistsError as e:
        err(f"recording already in catalog (b3sum: {e}); use --force to update")
        return 1
    rec = entry["recording"]
    info(args, f"Added: {rec['path']}")
    info(args, f"  b3sum: {rec['b3sum']}")
    if rec.get("duration_sec"):
        info(args, f"  duration: {rec['duration_sec']:.1f}s")
    return 0


def cmd_list(args) -> int:
    entries = C.list_entries()
    if args.status:
        entries = [e for e in entries if C.compute_status(e) == args.status]
    if args.context:
        entries = [e for e in entries if e.get("context", {}).get("name") == args.context]
    if args.format == "json":
        for e in entries:
            e["status"] = C.compute_status(e)
        emit_json(entries)
    elif args.format == "ids":
        for e in entries:
            print(e["recording"]["b3sum"])
    elif args.format == "paths":
        for e in entries:
            print(e["recording"]["path"])
    else:
        rows = []
        for e in entries:
            rec = e["recording"]
            dur = rec.get("duration_sec")
            rows.append(
                [
                    rec["b3sum"][:8],
                    C.compute_status(e),
                    f"{dur:.0f}s" if dur else "?",
                    e.get("context", {}).get("name") or "-",
                    rec["path"],
                ]
            )
        print(table(rows, ["B3SUM", "STATUS", "DUR", "CONTEXT", "PATH"]))
    return 0


def cmd_show(args) -> int:
    b3 = _resolve(args.audio)
    entry = C.load_entry(b3) if b3 else None
    if not entry:
        err(f"not in catalog: {args.audio}")
        return 1
    entry["status"] = C.compute_status(entry)
    emit_json(entry)
    return 0


def cmd_status(args) -> int:
    b3 = _resolve(args.audio)
    entry = C.load_entry(b3) if b3 else None
    if not entry:
        err(f"not in catalog: {args.audio}")
        return 1
    print(C.compute_status(entry))
    return 0


def cmd_register_transcript(args) -> int:
    b3 = _resolve(args.audio)
    if not b3:
        err(f"not in catalog: {args.audio}")
        return 1
    try:
        entry = C.register_transcript(b3, args.transcript, args.backend, force=args.force)
    except KeyError:
        err(f"not in catalog: {args.audio}")
        return 1
    except FileExistsError as e:
        err(f"{e}; use --force to replace")
        return 1
    t = entry["transcriptions"][-1]
    info(args, f"Registered {args.backend} transcript ({t['speaker_count']} speakers)")
    return 0


def cmd_set_context(args) -> int:
    b3 = _resolve(args.audio)
    if not b3:
        err(f"not in catalog: {args.audio}")
        return 1
    expected = args.expected_speakers.split(",") if args.expected_speakers else None
    C.set_context(b3, args.context, expected)
    info(args, f"Context set to '{args.context}'")
    return 0


def cmd_remove(args) -> int:
    b3 = _resolve(args.audio)
    if not b3 or not C.load_entry(b3):
        err(f"not in catalog: {args.audio}")
        return 1
    if not args.force:
        err("refusing to remove without --force")
        return 1
    C.remove_recording(b3)
    info(args, f"Removed {b3}")
    return 0


def cmd_query(args) -> int:
    entries = C.list_entries()
    for e in entries:
        e["status"] = C.compute_status(e)
    from ..utils.jqlite import JqError, query_lines

    try:
        out = query_lines(args.expression, entries)
    except JqError as e:
        err(str(e))
        return 1
    if out:
        print(out)
    return 0


def cmd_create_context(args) -> int:
    try:
        ctx = C.create_context(
            args.name,
            speakers=[s.strip() for s in args.speakers.split(",")] if args.speakers else None,
            description=args.description,
            force=args.force,
        )
    except FileExistsError:
        err(f"context '{args.name}' already exists; use --force to overwrite")
        return 1
    n = len(ctx["expected_speakers"])
    info(args, f"Created context '{args.name}'" + (f" with {n} expected speaker(s)" if n else ""))
    return 0


def cmd_list_contexts(args) -> int:
    contexts = C.load_contexts()
    if args.format == "json":
        emit_json(contexts)
        return 0
    if not contexts:
        print("No contexts defined.")
        return 0
    print("Contexts:")
    for name, ctx in sorted(contexts.items()):
        speakers = ctx.get("expected_speakers", [])
        desc = f"{len(speakers)} speaker(s)"
        if speakers:
            desc += ": " + ", ".join(speakers)
        print(f"  {name:<16} {desc}")
    return 0


def cmd_show_context(args) -> int:
    ctx = C.get_context(args.name)
    if not ctx:
        err(f"context '{args.name}' not found")
        return 1
    emit_json({args.name: ctx})
    return 0


def cmd_context_add_speaker(args) -> int:
    try:
        C.context_add_speaker(args.name, args.speaker_id)
    except KeyError:
        err(f"context '{args.name}' not found")
        return 1
    info(args, f"Added '{args.speaker_id}' to context '{args.name}'")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="speaker-catalog",
                                     description="Recording inventory and processing state")
    add_quiet(parser)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("add", help="Add a recording")
    p.add_argument("audio")
    p.add_argument("--context")
    p.add_argument("--tags")
    p.add_argument("--force", action="store_true")
    p.set_defaults(func=cmd_add)

    p = sub.add_parser("list", help="List recordings")
    p.add_argument("--status", choices=C.STATUS_VALUES)
    p.add_argument("--context")
    p.add_argument("--format", choices=["table", "json", "ids", "paths"], default="table")
    p.set_defaults(func=cmd_list)

    p = sub.add_parser("show", help="Show catalog entry")
    p.add_argument("audio", help="Audio path or b3sum prefix")
    p.set_defaults(func=cmd_show)

    p = sub.add_parser("status", help="Show processing status")
    p.add_argument("audio")
    p.set_defaults(func=cmd_status)

    p = sub.add_parser("register-transcript", help="Attach a transcript")
    p.add_argument("audio")
    p.add_argument("transcript")
    p.add_argument("--backend", required=True)
    p.add_argument("--force", action="store_true")
    p.set_defaults(func=cmd_register_transcript)

    p = sub.add_parser("set-context", help="Set recording context")
    p.add_argument("audio")
    p.add_argument("context")
    p.add_argument("--expected-speakers")
    p.set_defaults(func=cmd_set_context)

    p = sub.add_parser("remove", help="Remove a recording")
    p.add_argument("audio")
    p.add_argument("--force", action="store_true")
    p.set_defaults(func=cmd_remove)

    p = sub.add_parser("query", help="Query entries with jq")
    p.add_argument("expression")
    p.set_defaults(func=cmd_query)

    p = sub.add_parser("create-context", help="Create a context")
    p.add_argument("name")
    p.add_argument("--speakers")
    p.add_argument("--description")
    p.add_argument("--force", action="store_true")
    p.set_defaults(func=cmd_create_context)

    p = sub.add_parser("list-contexts", help="List contexts")
    p.add_argument("--format", choices=["table", "json"], default="table")
    p.set_defaults(func=cmd_list_contexts)

    p = sub.add_parser("show-context", help="Show a context")
    p.add_argument("name")
    p.set_defaults(func=cmd_show_context)

    p = sub.add_parser("context-add-speaker", help="Add expected speaker to context")
    p.add_argument("name")
    p.add_argument("speaker_id")
    p.set_defaults(func=cmd_context_add_speaker)

    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
