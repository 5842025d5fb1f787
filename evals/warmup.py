#!/usr/bin/env python3
"""Pre-compile the serving-shape programs (deploy-time warmup).

First compiles through the axon tunnel cost minutes per shape, and the
persistent cache (utils/jaxcache) is keyed on the traced program — so
run this once after any change to the embed path, then serving/benchmark
processes start hot.  Shapes covered:

  (W, L) embed buckets   backends/tpu.py embed_rows: W ∈ {1,4,16} ×
                         L ∈ {window/2, window} — streaming + eval paths
  (128, window/2)        pipeline/diarize.py embed_chunk batch shape

Usage: python evals/warmup.py [--shapes 1x24000,16x48000,...]
Prints one JSON line per shape with compile+first-call seconds.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default=None,
                    help="comma list of WxL (default: all serving shapes)")
    args = ap.parse_args()

    from sdtk_tpu.backends import get_backend

    t0 = time.perf_counter()
    backend = get_backend("tpu")
    eng = backend.engine
    print(json.dumps({"stage": "engine-init",
                      "seconds": round(time.perf_counter() - t0, 1)}),
          flush=True)

    L, half = eng.window_len, eng.window_len // 2
    if args.shapes:
        shapes = [tuple(int(v) for v in s.split("x"))
                  for s in args.shapes.split(",")]
    else:
        shapes = [(w, l) for l in (half, L) for w in (1, 4, 16)]
        shapes.append((128, half))
        # the diarizer's default batch shape (DiarizeConfig: 1.0 s
        # windows, embed_chunk=128)
        shapes.append((128, 16000))

    for w, l in shapes:
        arr = np.zeros((w, l), np.float32)
        lens = np.full(w, l, np.int32)
        t0 = time.perf_counter()
        np.asarray(eng._embed_jit(arr, lens))
        first = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(eng._embed_jit(arr, lens))
        warm = time.perf_counter() - t0
        print(json.dumps({
            "shape": f"{w}x{l}",
            "compile_plus_first_s": round(first, 1),
            "warm_call_ms": round(warm * 1000, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
