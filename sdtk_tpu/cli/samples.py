"""``speaker_samples`` CLI: sample extraction + review state
(reference speaker_samples: extract, segments, list, info, remove,
speakers, review)."""

from __future__ import annotations

import argparse
import json

from ..store import samples as S
from ..transcripts import extract_segments_from_transcript, get_available_speakers, load_transcript
from .common import add_quiet, emit_json, err, info, table


def cmd_extract(args) -> int:
    data = load_transcript(args.transcript)
    label = args.speaker_label
    if not label:
        speakers = get_available_speakers(data)
        if len(speakers) != 1:
            err(f"--speaker-label required (transcript has: {', '.join(speakers)})")
            return 1
        label = speakers[0]
    segments = extract_segments_from_transcript(
        data, label, min_duration=args.min_duration, max_gap=args.max_gap
    )
    if not segments:
        err(f"no segments for label '{label}'")
        return 1
    written = S.extract_samples(
        args.speaker_id,
        args.audio,
        segments,
        speaker_label=label,
        transcript_path=args.transcript,
        max_segments=args.max_segments,
        max_duration=args.max_duration,
    )
    info(args, f"Extracted {len(written)} sample(s) for '{args.speaker_id}'")
    for meta in written:
        print(meta["sample_id"])
    return 0


def cmd_segments(args) -> int:
    data = load_transcript(args.transcript)
    for label in args.speaker_labels or get_available_speakers(data):
        for seg in extract_segments_from_transcript(
            data, label, min_duration=args.min_duration, max_gap=args.max_gap
        ):
            print(json.dumps({"speaker": label, **seg}))
    return 0


def cmd_list(args) -> int:
    metas = S.list_samples(args.speaker_id, review_status=args.review_status)
    if args.offset:
        metas = metas[args.offset :]
    if args.limit:
        metas = metas[: args.limit]
    if args.format == "json":
        emit_json(metas)
        return 0
    rows = [
        [
            m.get("speaker_id", "?"),
            m.get("sample_id", "?"),
            f"{m.get('segment', {}).get('duration_sec', 0):.1f}s",
            m.get("review", {}).get("status", "pending"),
            (m.get("b3sum") or "")[:8],
        ]
        for m in metas
    ]
    print(table(rows, ["SPEAKER", "SAMPLE", "DUR", "REVIEW", "B3SUM"]))
    return 0


def cmd_info(args) -> int:
    for meta in S.get_speaker_samples(args.speaker_id):
        if meta.get("sample_id") == args.sample_id:
            emit_json(meta)
            return 0
    err(f"sample '{args.sample_id}' not found for '{args.speaker_id}'")
    return 1


def cmd_remove(args) -> int:
    sdir = S.speaker_samples_dir(args.speaker_id)
    removed = 0
    for suffix in (".wav", ".mp3", ".meta.yaml"):
        p = sdir / f"{args.sample_id}{suffix}"
        if p.exists():
            p.unlink()
            removed += 1
    if not removed:
        err(f"sample '{args.sample_id}' not found")
        return 1
    info(args, f"Removed {args.sample_id}")
    return 0


def cmd_speakers(args) -> int:
    from .. import config

    root = config.samples_dir()
    if not root.exists():
        return 0
    for d in sorted(p for p in root.iterdir() if p.is_dir()):
        n = len(list(d.glob("*.meta.yaml")))
        print(f"{d.name}\t{n}")
    return 0


def cmd_review(args) -> int:
    status = "reviewed" if args.approve else "rejected" if args.reject else None
    if not status:
        err("one of --approve/--reject required")
        return 1
    updated = S.set_review_status(
        args.speaker_id,
        sample_id=args.sample_id,
        source_b3sum=args.source_b3sum,
        status=status,
        notes=args.notes,
    )
    if not updated:
        err("no matching samples")
        return 1
    # Review state feeds embedding trust (the feedback loop).
    from ..store.profiles import refresh_trust_levels

    refresh_trust_levels(args.speaker_id)
    info(args, f"Marked {len(updated)} sample(s) {status}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="speaker_samples",
                                     description="Audio sample extraction and review")
    add_quiet(parser)
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("extract", help="Extract samples from a recording")
    p.add_argument("speaker_id")
    p.add_argument("audio")
    p.add_argument("--transcript", "-t", required=True)
    p.add_argument("--speaker-label", "-l")
    p.add_argument("--max-segments", type=int)
    p.add_argument("--max-duration", type=float)
    p.add_argument("--min-duration", type=float, default=0.5)
    p.add_argument("--max-gap", type=float, default=1.0)
    p.set_defaults(func=cmd_extract)

    p = sub.add_parser("segments", help="Print segments as JSONL")
    p.add_argument("transcript")
    p.add_argument("speaker_labels", nargs="*")
    p.add_argument("--min-duration", type=float, default=0.5)
    p.add_argument("--max-gap", type=float, default=1.0)
    p.set_defaults(func=cmd_segments)

    p = sub.add_parser("list", help="List samples")
    p.add_argument("speaker_id", nargs="?")
    p.add_argument("--review-status", choices=["pending", "reviewed", "rejected"])
    p.add_argument("--format", choices=["table", "json"], default="table")
    p.add_argument("--limit", type=int)
    p.add_argument("--offset", type=int, default=0)
    p.set_defaults(func=cmd_list)

    p = sub.add_parser("info", help="Show sample metadata")
    p.add_argument("speaker_id")
    p.add_argument("sample_id")
    p.set_defaults(func=cmd_info)

    p = sub.add_parser("remove", help="Remove a sample")
    p.add_argument("speaker_id")
    p.add_argument("sample_id")
    p.set_defaults(func=cmd_remove)

    p = sub.add_parser("speakers", help="List speakers with samples")
    p.set_defaults(func=cmd_speakers)

    p = sub.add_parser("review", help="Approve/reject samples")
    p.add_argument("speaker_id")
    p.add_argument("--sample-id")
    p.add_argument("--source-b3sum")
    p.add_argument("--approve", action="store_true")
    p.add_argument("--reject", action="store_true")
    p.add_argument("--notes")
    p.set_defaults(func=cmd_review)

    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
