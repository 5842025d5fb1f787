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


def der_mode(args) -> int:
    """Streaming QUALITY benchmark (r4 VERDICT weak #8): DER of the
    online path — both the LIVE greedy-assign output and the finalize()
    recluster — against the offline Diarizer on the same held-out
    meetings, at collars 0.75 and 0.25.  This is the number that
    justifies (or indicts) the greedy-assign / new-speaker-bar settings:
    the live-vs-final delta is the price of causality, the
    final-vs-offline delta is the price of the streaming window config."""
    import benchmark_der as BD

    from sdtk_tpu.cluster import diarization_error_rate
    from sdtk_tpu.pipeline.diarize import DiarizeConfig, Diarizer
    from sdtk_tpu.pipeline.streaming import OnlineDiarizer, StreamingConfig

    sr = 16000
    chunk = int(args.chunk_seconds * sr)
    collars = (0.75, 0.25)
    rows = {"live": [], "final": [], "offline": []}
    offline = Diarizer(args.backend, DiarizeConfig(vad=args.vad))
    for m in range(args.meetings):
        wav, ref = BD.build_meeting(
            m, args.speakers, 10, 3.0,
            heldout=args.heldout, tier=args.tier)
        d = OnlineDiarizer(args.backend, StreamingConfig(
            window_seconds=args.window, hop_seconds=args.hop,
            vad=args.vad if args.vad != "auto" else "auto"))
        for i in range(0, len(wav), chunk):
            d.feed(wav[i : i + chunk])
        live = d.segments()
        fin = d.finalize(recluster=True)["segments"]
        off = offline.diarize_waveform(wav)["segments"]
        for name, hyp in (("live", live), ("final", fin), ("offline", off)):
            rows[name].append({
                c: diarization_error_rate(ref, hyp, collar=c)["der"]
                for c in collars
            })
    out = {
        "benchmark": "streaming-der",
        "backend": args.backend,
        "generator": "heldout" if args.heldout else "train-family",
        "tier": args.tier if args.heldout else "clean",
        "meetings": args.meetings,
        "speakers": args.speakers,
        "window": args.window,
        "hop": args.hop,
        "vad": args.vad,
    }
    for name, per in rows.items():
        for c in collars:
            key = f"{name}_mean_der_c{int(c * 100)}"
            out[key] = round(float(np.mean([r[c] for r in per])), 4)
    for c in collars:
        out[f"causality_cost_c{int(c * 100)}"] = round(
            out[f"live_mean_der_c{int(c * 100)}"]
            - out[f"final_mean_der_c{int(c * 100)}"], 4)
        out[f"streaming_gap_c{int(c * 100)}"] = round(
            out[f"final_mean_der_c{int(c * 100)}"]
            - out[f"offline_mean_der_c{int(c * 100)}"], 4)
    print(json.dumps(out))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", default="fake")
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--chunk-seconds", type=float, default=0.5)
    ap.add_argument("--der", action="store_true",
                    help="score DER of the online path (live + finalized) "
                         "vs the offline pipeline on synthetic meetings")
    ap.add_argument("--heldout", action="store_true")
    ap.add_argument("--tier", default="clean",
                    choices=["clean", "noise", "reverb", "telephone", "music"])
    ap.add_argument("--meetings", type=int, default=3)
    ap.add_argument("--speakers", type=int, default=3)
    ap.add_argument("--window", type=float, default=1.0)
    ap.add_argument("--hop", type=float, default=0.375)
    ap.add_argument("--vad", default="energy",
                    choices=["energy", "trained", "auto"],
                    help="streaming gate (trained stays opt-in in "
                         "serving; the benchmark measures both)")
    args = ap.parse_args(argv)

    if args.der:
        return der_mode(args)

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
