#!/usr/bin/env python3
"""Diarization-error-rate benchmark on synthetic meetings.

Builds K-speaker meetings from the synthetic corpus with known reference
segmentation, runs the on-device diarizer, and reports DER (the AMI
stand-in until real corpora are mounted; BASELINE.md north-star metric).

Usage: python evals/benchmark_der.py [--backend fake|tpu] [--meetings 3]
Outputs one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_meeting(meeting_id: int, n_speakers: int, n_turns: int, turn_s: float,
                  heldout: bool = False, tier: str = "clean",
                  snr_db: float = 15.0):
    """Synthesize a meeting.  --heldout draws voices from the DISJOINT
    eval generator family (data/synth_heldout.py) and applies the channel
    tier — the non-circular quality measurement (r1 VERDICT missing #2)."""
    from sdtk_tpu.data.synth import synth_utterance

    if heldout:
        from sdtk_tpu.data.synth_heldout import apply_tier, heldout_utterance

        make = heldout_utterance
    else:
        make = synth_utterance

    rng = np.random.default_rng(500 + meeting_id)
    pieces = []
    ref = []
    t = 0.0
    prev = -1
    for turn in range(n_turns):
        spk = int(rng.integers(n_speakers))
        if spk == prev:
            spk = (spk + 1) % n_speakers
        prev = spk
        dur = float(rng.uniform(turn_s * 0.7, turn_s * 1.3))
        pieces.append(make(spk, 1000 * meeting_id + turn, dur))
        ref.append((t, t + dur, f"SPK{spk}"))
        t += dur
    wav = np.concatenate(pieces)
    if heldout and tier != "clean":
        from sdtk_tpu.data.synth_heldout import apply_tier

        wav = apply_tier(wav, tier, seed=meeting_id, snr_db=snr_db)
    return wav, ref


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default="fake")
    p.add_argument("--meetings", type=int, default=3)
    p.add_argument("--speakers", type=int, default=3)
    p.add_argument("--turns", type=int, default=10)
    p.add_argument("--turn-seconds", type=float, default=3.0)
    p.add_argument("--collar", type=float, default=0.75)
    p.add_argument("--window", type=float, default=1.5)
    p.add_argument("--hop", type=float, default=0.75)
    p.add_argument("--known-k", action="store_true", help="give the diarizer the true speaker count")
    p.add_argument("--heldout", action="store_true",
                   help="held-out generator family (non-circular eval)")
    p.add_argument("--tier", default="clean",
                   choices=["clean", "noise", "reverb", "telephone"])
    p.add_argument("--snr-db", type=float, default=15.0)
    args = p.parse_args()

    from sdtk_tpu.cluster import diarization_error_rate
    from sdtk_tpu.pipeline.diarize import DiarizeConfig, Diarizer

    cfg = DiarizeConfig(n_speakers=args.speakers if args.known_k else None,
                        max_speakers=max(8, args.speakers),
                        window_seconds=args.window, hop_seconds=args.hop)
    d = Diarizer(args.backend, cfg)

    ders = []
    audio_seconds = 0.0
    t0 = time.time()
    for m in range(args.meetings):
        wav, ref = build_meeting(m, args.speakers, args.turns, args.turn_seconds,
                                 heldout=args.heldout, tier=args.tier,
                                 snr_db=args.snr_db)
        audio_seconds += len(wav) / 16000
        result = d.diarize_waveform(wav)
        metrics = diarization_error_rate(ref, result["segments"], collar=args.collar)
        ders.append(metrics["der"])
    wall = time.time() - t0

    out = {
        "benchmark": "der",
        "backend": args.backend,
        "generator": "heldout" if args.heldout else "train-family",
        "tier": args.tier if args.heldout else "clean",
        "meetings": args.meetings,
        "speakers": args.speakers,
        "mean_der": round(float(np.mean(ders)), 4),
        "max_der": round(float(np.max(ders)), 4),
        "collar": args.collar,
        "audio_seconds": round(audio_seconds, 1),
        "wall_seconds": round(wall, 2),
        "audio_s_per_s": round(audio_seconds / wall, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
