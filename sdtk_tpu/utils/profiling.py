"""Tracing/profiling — SURVEY.md §5.1 (the reference has none beyond
wall-clock timers in benchmarks).

- ``stage(name)``: context-manager timer; enabled with ``SDTK_PROFILE=1``
  (report printed to stderr at exit or via ``report()``).
- ``trace(dir)``: wraps ``jax.profiler.trace`` for device timelines
  (``SDTK_TRACE_DIR=/path`` to enable globally).
"""

from __future__ import annotations

import atexit
import os
import sys
import time
from collections import defaultdict
from contextlib import contextmanager

_times: dict[str, list[float]] = defaultdict(list)
_registered = False


def enabled() -> bool:
    return os.environ.get("SDTK_PROFILE") == "1"


@contextmanager
def stage(name: str):
    """Accumulating per-stage wall-clock timer (no-op unless SDTK_PROFILE=1)."""
    if not enabled():
        yield
        return
    global _registered
    if not _registered:
        atexit.register(report)
        _registered = True
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _times[name].append(time.perf_counter() - t0)


def report(out=None) -> None:
    if not _times:
        return
    out = out or sys.stderr
    print("── sdtk profile ──", file=out)
    width = max(len(k) for k in _times)
    for name, vals in sorted(_times.items(), key=lambda kv: -sum(kv[1])):
        total = sum(vals)
        print(
            f"  {name:<{width}}  {total:8.3f}s  ({len(vals)}x, avg {total / len(vals):.3f}s)",
            file=out,
        )


def reset() -> None:
    _times.clear()


@contextmanager
def trace(trace_dir: str | None = None):
    """Device-timeline trace (jax.profiler); viewable with TensorBoard or
    xprof.  Controlled by arg or $SDTK_TRACE_DIR."""
    trace_dir = trace_dir or os.environ.get("SDTK_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
