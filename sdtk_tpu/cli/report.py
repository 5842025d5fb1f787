"""``speaker-report`` CLI: status / coverage / confidence / stale /
speakers / contexts (reference speaker-report:921-997)."""

from __future__ import annotations

import argparse

from ..pipeline import report as R
from .common import add_quiet, emit_json


def _run(args, formatter, json_key: str | None = None) -> int:
    stats = R.compute_system_stats(
        stale_days=getattr(args, "days", None)
        or getattr(args, "stale_days", None) or R.STALE_DAYS,
        confidence_threshold=getattr(args, "below", None)
        or getattr(args, "confidence_threshold", None) or R.LOW_CONFIDENCE_CUTOFF,
    )
    if getattr(args, "context", None):
        stats.contexts = {
            k: v for k, v in stats.contexts.items() if k == args.context
        }
    if args.format == "json":
        d = stats.to_dict()
        d["recommendations"] = R.generate_recommendations(stats)
        emit_json(d if json_key is None else {json_key: d.get(json_key), "total": d.get("total_recordings")})
    else:
        print(formatter(stats))
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(prog="speaker-report",
                                     description="System health metrics and recommendations")
    add_quiet(parser)
    # Reference puts -f/--format on the root parser too and defaults the
    # subcommand to `status` when omitted (speaker-report:927-934,990).
    parser.add_argument("-f", "--format", choices=["text", "json"],
                        default="text", help="Output format (default: text)")
    sub = parser.add_subparsers(dest="command")

    for name, formatter, key in [
        ("status", R.format_status, None),
        ("coverage", R.format_coverage, None),
        ("confidence", R.format_confidence, "low_confidence"),
        ("stale", R.format_stale, "stale_recordings"),
        ("speakers", R.format_speakers, "speakers_needing_samples"),
        ("contexts", R.format_contexts, "contexts"),
    ]:
        p = sub.add_parser(name, help=f"Report: {name}")
        # SUPPRESS so an unset subcommand --format doesn't clobber the
        # root-level -f value in the shared namespace
        p.add_argument("--format", choices=["text", "json"],
                       default=argparse.SUPPRESS)
        if name == "status":
            p.add_argument("--confidence-threshold", type=int,
                           default=R.LOW_CONFIDENCE_CUTOFF,
                           help="Confidence threshold percentage")
            p.add_argument("--stale-days", type=int, default=R.STALE_DAYS,
                           help="Days threshold for stale recordings")
        elif name == "coverage":
            p.add_argument("-c", "--context", help="Filter by context name")
        elif name == "confidence":
            p.add_argument("-b", "--below", type=int,
                           default=R.LOW_CONFIDENCE_CUTOFF,
                           help="Confidence threshold percentage")
        elif name == "stale":
            p.add_argument("-d", "--days", type=int, default=R.STALE_DAYS,
                           help="Days threshold")
        p.set_defaults(func=lambda a, f=formatter, k=key: _run(a, f, k))

    return parser


def main(argv: list[str] | None = None) -> int:
    import sys

    parser = build_parser()
    argv = sys.argv[1:] if argv is None else list(argv)
    args = parser.parse_args(argv)
    if not getattr(args, "command", None):
        # default subcommand: status (reference speaker-report:990-997)
        args = parser.parse_args([*argv, "status"])
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
