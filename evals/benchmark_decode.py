#!/usr/bin/env python3
"""Host audio-decode throughput benchmark.

SURVEY.md §7 ranks "multi-host input pipeline feeding ≥1000 audio-s/s/chip"
as a hard part: host decode bandwidth becomes the bottleneck before the
chip does.  This measures the native threaded C++ loader
(native/audioio.cc) against the pure-NumPy path on a batch of WAV files
(decode + windowed-sinc resample 44.1 kHz → 16 kHz — the worst case).

Usage:  python evals/benchmark_decode.py [--files 64] [--seconds 30]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
import wave
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def make_wavs(tmp: Path, n: int, seconds: float, sr: int) -> list[Path]:
    rng = np.random.default_rng(0)
    paths = []
    t = np.arange(int(seconds * sr)) / sr
    for i in range(n):
        x = 0.3 * np.sin(2 * np.pi * (200 + 10 * i) * t)
        x += 0.01 * rng.standard_normal(len(t))
        pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
        p = tmp / f"bench{i:03d}.wav"
        with wave.open(str(p), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(pcm.tobytes())
        paths.append(p)
    return paths


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--source-sr", type=int, default=44100)
    ap.add_argument("--thread-sweep", action="store_true",
                    help="Measure throughput at 1..nproc threads — the "
                         "measured core-scaling grounds the DP roofline's "
                         "host-decode term (evals/benchmark_scaling.py), "
                         "replacing its linear-in-cores assumption")
    args = ap.parse_args(argv)

    import tempfile

    from sdtk_tpu.utils import audio
    from sdtk_tpu.utils.nativelib import get_lib

    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        paths = make_wavs(tmp, args.files, args.seconds, args.source_sr)
        audio_s = args.files * args.seconds

        results = {}
        if get_lib() is not None:
            t0 = time.perf_counter()
            batch = audio.load_audio_batch(paths, target_sr=16000)
            dt = time.perf_counter() - t0
            assert len(batch) == args.files
            results["native_threaded"] = round(audio_s / dt, 1)

            if args.thread_sweep:
                import os

                sweep = {}
                n_cores = os.cpu_count() or 1
                threads = sorted({1, 2, 4, n_cores} & set(range(1, n_cores + 1)))
                for nt in threads:
                    t0 = time.perf_counter()
                    audio.load_audio_batch(paths, target_sr=16000, n_threads=nt)
                    sweep[str(nt)] = round(audio_s / (time.perf_counter() - t0), 1)
                results["thread_sweep_audio_s_per_s"] = sweep
                base = sweep.get("1")
                if base and len(threads) > 1:
                    top = threads[-1]
                    results["core_scaling_efficiency"] = round(
                        sweep[str(top)] / (top * base), 3
                    )
                    results["per_core_audio_s_per_s"] = base

        t0 = time.perf_counter()
        for p in paths:
            # pure-python path: bypass the native decoder
            x, sr = audio._decode_wav(p)
            x = x.mean(axis=1)
            if sr != 16000:
                x = audio.resample(x, sr, 16000)
        dt = time.perf_counter() - t0
        results["numpy_serial"] = round(audio_s / dt, 1)

    out = {
        "metric": "wav decode+resample throughput",
        "unit": "audio_s_per_s",
        **results,
    }
    if "native_threaded" in results:
        out["native_speedup"] = round(
            results["native_threaded"] / results["numpy_serial"], 2
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
