"""Umbrella dispatcher: ``python -m sdtk_tpu <tool> [...]``.

Tools: detection, catalog, samples, segments, assign, report, process,
review, llm, diarize, train.
"""

from __future__ import annotations

import sys

TOOLS = {
    "detection": "sdtk_tpu.cli.detection",
    "catalog": "sdtk_tpu.cli.catalog",
    "samples": "sdtk_tpu.cli.samples",
    "segments": "sdtk_tpu.cli.segments",
    "assign": "sdtk_tpu.cli.assign",
    "report": "sdtk_tpu.cli.report",
    "process": "sdtk_tpu.cli.process",
    "review": "sdtk_tpu.cli.review",
    "llm": "sdtk_tpu.cli.llm",
    "diarize": "sdtk_tpu.cli.diarize",
    "train": "sdtk_tpu.training",
}


def main() -> int:
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print("usage: python -m sdtk_tpu <tool> [args...]", file=sys.stderr)
        print(f"tools: {', '.join(sorted(TOOLS))}", file=sys.stderr)
        return 0 if len(sys.argv) >= 2 else 2
    tool = sys.argv[1]
    if tool not in TOOLS:
        print(f"unknown tool '{tool}' (available: {', '.join(sorted(TOOLS))})", file=sys.stderr)
        return 2
    import importlib

    module = importlib.import_module(TOOLS[tool])
    return module.main(sys.argv[2:])


if __name__ == "__main__":
    raise SystemExit(main())
