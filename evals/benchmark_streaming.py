#!/usr/bin/env python3
"""Streaming diarization latency benchmark.

Feeds a synthetic conversation to the OnlineDiarizer in real-time-sized
chunks and reports the real-time factor (processing time / audio time —
lower is better; < 1.0 = faster than real time) and per-chunk latency
percentiles.  This is the serving-path metric: the batch pipeline measures
throughput, this measures responsiveness.

Usage:  python evals/benchmark_streaming.py [--backend fake] [--seconds 60]
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


def conversation(seconds: float, sr: int = 16000) -> np.ndarray:
    rng = np.random.default_rng(0)
    freqs = [220, 520, 330]
    out = []
    t_turn = 4.0
    n_turns = int(seconds / t_turn)
    for i in range(n_turns):
        f = freqs[i % len(freqs)]
        t = np.arange(int(t_turn * sr)) / sr
        x = sum((0.5 / (k + 1)) * np.sin(2 * np.pi * f * (k + 1) * t)
                for k in range(4))
        out.append((0.4 * x / np.max(np.abs(x))).astype(np.float32))
    wav = np.concatenate(out)
    return wav + 0.005 * rng.standard_normal(len(wav)).astype(np.float32)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="fake")
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--chunk-seconds", type=float, default=0.5)
    args = ap.parse_args(argv)

    from sdtk_tpu.pipeline.streaming import OnlineDiarizer, StreamingConfig

    sr = 16000
    wav = conversation(args.seconds, sr)
    chunk = int(args.chunk_seconds * sr)

    d = OnlineDiarizer(args.backend, StreamingConfig())
    # warm-up (compile) on a throwaway chunk stream
    warm = OnlineDiarizer(args.backend, StreamingConfig())
    warm.feed(wav[: chunk * 4])
    warm.finalize()

    lat = []
    t_all = time.perf_counter()
    for i in range(0, len(wav), chunk):
        t0 = time.perf_counter()
        d.feed(wav[i : i + chunk])
        lat.append(time.perf_counter() - t0)
    result = d.finalize()
    total = time.perf_counter() - t_all

    lat_ms = np.array(lat) * 1000.0
    print(json.dumps({
        "metric": "streaming diarization real-time factor",
        "backend": args.backend,
        "audio_seconds": args.seconds,
        "rtf": round(total / args.seconds, 4),
        "chunk_latency_ms": {
            "p50": round(float(np.percentile(lat_ms, 50)), 2),
            "p95": round(float(np.percentile(lat_ms, 95)), 2),
            "max": round(float(lat_ms.max()), 2),
        },
        "n_speakers": result.get("n_speakers"),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
