"""Shared CLI plumbing."""

from __future__ import annotations

import argparse
import json
import sys
from typing import Any


def info(args: argparse.Namespace, msg: str) -> None:
    """Status to stderr unless -q (data stays on stdout)."""
    if not getattr(args, "quiet", False):
        print(msg, file=sys.stderr)


def err(msg: str) -> None:
    """Error line to stderr with the reference's 'Error: ' prefix (not
    doubled when the caller pasted a verbatim contract message)."""
    if msg.startswith(("Error:", "Warning:")):
        print(msg, file=sys.stderr)
    else:
        print(f"Error: {msg}", file=sys.stderr)


def status(msg: str) -> None:
    """Unconditional progress line to stderr (reference tools print these
    regardless of -q, e.g. speaker_detection:835,1069)."""
    print(msg, file=sys.stderr)


def emit_json(obj: Any) -> None:
    print(json.dumps(obj, indent=2, ensure_ascii=False))


def parse_kv(items: list[str] | None) -> dict[str, str]:
    out: dict[str, str] = {}
    for item in items or []:
        key, _, val = item.partition("=")
        out[key] = val
    return out


def parse_segments_arg(spec: str) -> list[tuple[float, float]]:
    """"0:5,10:15" (or legacy "0-5,10-15") → [(0,5),(10,15)] (reference
    speaker_detection:731-751 — same error messages and start<end check)."""
    segments = []
    for part in spec.split(","):
        part = part.strip()
        sep = ":" if ":" in part else "-"
        if sep not in part:
            raise ValueError(f"Invalid segment format '{part}'. Use 'start:end'.")
        a, _, b = part.partition(sep)
        try:
            start, end = float(a), float(b)
        except ValueError:
            raise ValueError(f"Invalid segment times '{part}'. Must be numeric.") from None
        if start >= end:
            raise ValueError(f"Invalid segment '{part}'. Start must be < end.")
        segments.append((start, end))
    return segments


def add_quiet(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("-q", "--quiet", action="store_true", help="Suppress status output")
    parser.add_argument("-v", "--verbose", action="store_true", help="Verbose output")
    # -V/--version on every tool (reference convention, e.g.
    # speaker-catalog:839)
    from .. import __version__

    parser.add_argument(
        "-V", "--version", action="version",
        version=f"{parser.prog} (sdtk-tpu {__version__})",
    )


def add_subcommand_flags(parser: argparse.ArgumentParser) -> None:
    """Give every subcommand its own -q/-v so reference-style invocations
    like ``speaker_detection check-validity -v`` parse (argparse does not
    let top-level flags appear after the subcommand; the reference defines
    them per-subparser)."""
    for action in parser._actions:  # noqa: SLF001 — argparse introspection
        if isinstance(action, argparse._SubParsersAction):  # noqa: SLF001
            for sp in action.choices.values():
                opts = {o for a in sp._actions for o in a.option_strings}  # noqa: SLF001
                # SUPPRESS default: an absent per-subcommand flag must not
                # clobber a top-level `-v`/`-q` given before the subcommand
                if "-q" not in opts and "--quiet" not in opts:
                    sp.add_argument("-q", "--quiet", action="store_true",
                                    default=argparse.SUPPRESS,
                                    help=argparse.SUPPRESS)
                if "-v" not in opts and "--verbose" not in opts:
                    sp.add_argument("-v", "--verbose", action="store_true",
                                    default=argparse.SUPPRESS,
                                    help=argparse.SUPPRESS)


def parse_cli(parser: argparse.ArgumentParser, argv: list[str] | None) -> argparse.Namespace:
    """Standard CLI parse: per-subcommand -q/-v plus defaulted flags."""
    add_subcommand_flags(parser)
    args = parser.parse_args(argv)
    if not hasattr(args, "quiet"):
        args.quiet = False
    if not hasattr(args, "verbose"):
        args.verbose = False
    return args


def table(rows: list[list[str]], headers: list[str]) -> str:
    widths = [len(h) for h in headers]
    for row in rows:
        for i, cell in enumerate(row):
            widths[i] = max(widths[i], len(str(cell)))
    fmt = "  ".join(f"{{:<{w}}}" for w in widths)
    lines = [fmt.format(*headers), fmt.format(*["-" * w for w in widths])]
    lines += [fmt.format(*[str(c) for c in row]) for row in rows]
    return "\n".join(lines)
