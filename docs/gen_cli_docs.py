#!/usr/bin/env python3
"""Regenerate the argparse usage blocks in docs/CLI.md and docs/tools/*.md.

Run after any CLI flag change:  python docs/gen_cli_docs.py
Only the fenced usage blocks are rewritten; surrounding prose is kept.
"""

from __future__ import annotations

import argparse
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TOOLS = [
    "detection", "samples", "segments", "catalog", "assign",
    "llm", "review", "process", "report", "diarize",
]


def usage_lines(tool: str) -> list[str]:
    import importlib

    mod = importlib.import_module(f"sdtk_tpu.cli.{tool}")
    if not hasattr(mod, "build_parser"):  # segments: flat parser in main()
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                mod.main(["--help"])
        except SystemExit:
            pass
        usage = buf.getvalue().split("\n\n")[0]
        usage = " ".join(l.strip() for l in usage.splitlines())
        return [re.sub(r"^usage:\s*", "", usage)]
    parser = mod.build_parser()
    lines = []
    for action in parser._actions:
        if isinstance(action, argparse._SubParsersAction):
            for name, sp in action.choices.items():
                u = sp.format_usage()
                u = " ".join(l.strip() for l in u.splitlines())
                u = re.sub(r"^usage:\s*", "", u).strip()
                lines.append(u)
    return lines


def replace_usage_block(text: str, header: str, lines: list[str]) -> str:
    """Replace the first fenced block after `header`, staying inside that
    section (never crossing the next `## ` heading)."""
    block = "```\n" + "\n".join(lines) + "\n```"
    start = text.find(header)
    if start < 0:
        return text
    body_start = start + len(header)
    next_section = text.find("\n## ", body_start)
    section_end = next_section if next_section >= 0 else len(text)
    section = text[body_start:section_end]
    m = re.search(r"```.*?```", section, re.DOTALL)
    if not m:
        return text
    new_section = section[: m.start()] + block + section[m.end():]
    return text[:body_start] + new_section + text[section_end:]


def main() -> int:
    cli_md = REPO / "docs" / "CLI.md"
    text = cli_md.read_text()
    for tool in TOOLS:
        lines = usage_lines(tool)
        text = replace_usage_block(text, f"\n## {tool}\n", lines)
        tool_md = REPO / "docs" / "tools" / f"{tool}.md"
        if tool_md.exists():
            t = tool_md.read_text()
            t = replace_usage_block(t, "## Usage\n", lines)
            tool_md.write_text(t)
    cli_md.write_text(text)
    print("regenerated usage blocks")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
