"""``speaker-report`` CLI: status / coverage / confidence / stale /
speakers / contexts (reference speaker-report:921-997)."""

from __future__ import annotations

import argparse

from ..pipeline import report as R
from .common import add_quiet, emit_json


def _run(args, formatter, json_key: str | None = None) -> int:
    stats = R.compute_system_stats()
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
    sub = parser.add_subparsers(dest="command", required=True)

    for name, formatter, key in [
        ("status", R.format_status, None),
        ("coverage", R.format_coverage, None),
        ("confidence", R.format_confidence, "low_confidence"),
        ("stale", R.format_stale, "stale_recordings"),
        ("speakers", R.format_speakers, "speakers_needing_samples"),
        ("contexts", R.format_contexts, "contexts"),
    ]:
        p = sub.add_parser(name, help=f"Report: {name}")
        p.add_argument("--format", choices=["text", "json"], default="text")
        p.set_defaults(func=lambda a, f=formatter, k=key: _run(a, f, k))

    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
