#!/usr/bin/env python3
"""Speaker-identification accuracy benchmark.

Mirrors reference evals/speaker_detection/benchmark.py (:107-185): enroll
N synthetic speakers from enrollment utterances, then identify them in
held-out utterances and concatenated conversations; a case passes iff the
identified speaker set equals the expected set.  espeak-ng voices are
replaced by the deterministic source-filter corpus (sdtk_tpu.data.synth).

Usage: python evals/benchmark_identify.py [--backend fake|tpu] [--speakers 4]
Outputs one JSON line with pass-rate metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default="fake")
    p.add_argument("--speakers", type=int, default=4)
    p.add_argument("--utterances", type=int, default=3, help="held-out utts per speaker")
    p.add_argument("--threshold", type=float, default=0.354)
    p.add_argument("--seconds", type=float, default=4.0)
    args = p.parse_args()

    workdir = Path(tempfile.mkdtemp(prefix="sdtk_eval_"))
    os.environ["SPEAKERS_EMBEDDINGS_DIR"] = str(workdir / "db")
    os.environ["SPEAKER_DETECTION_BACKEND"] = args.backend

    from sdtk_tpu.data.synth import SR, synth_utterance
    from sdtk_tpu.pipeline import identify as ID
    from sdtk_tpu.utils.audio import save_wav

    names = [f"speaker-{i:02d}" for i in range(args.speakers)]

    # Enroll each speaker from utterance 0.
    t0 = time.time()
    for i, name in enumerate(names):
        wav_path = workdir / f"enroll_{name}.wav"
        save_wav(wav_path, synth_utterance(i, 0, args.seconds), SR)
        ID.enroll(name, wav_path, create_missing=True)
    enroll_s = time.time() - t0

    # Single-speaker identification cases.
    single_pass = 0
    single_total = 0
    t0 = time.time()
    for i, name in enumerate(names):
        for u in range(1, args.utterances + 1):
            wav_path = workdir / f"test_{name}_{u}.wav"
            save_wav(wav_path, synth_utterance(i, u, args.seconds), SR)
            results = ID.identify(wav_path, threshold=args.threshold)
            single_total += 1
            if results and results[0]["speaker_id"] == name:
                single_pass += 1

    # Conversation cases: concatenate pairs, expect both in identified set.
    conv_pass = 0
    conv_total = 0
    for i in range(args.speakers):
        j = (i + 1) % args.speakers
        conv = np.concatenate(
            [synth_utterance(i, 100 + i, args.seconds), synth_utterance(j, 200 + j, args.seconds)]
        )
        wav_path = workdir / f"conv_{i}_{j}.wav"
        save_wav(wav_path, conv, SR)
        results = ID.identify(wav_path, threshold=args.threshold)
        found = {r["speaker_id"] for r in results}
        conv_total += 1
        # pass iff identified set equals expected set (reference :167-180)
        if {names[i], names[j]} <= found:
            conv_pass += 1
    identify_s = time.time() - t0

    out = {
        "benchmark": "identify",
        "backend": args.backend,
        "speakers": args.speakers,
        "single_pass_rate": round(single_pass / max(single_total, 1), 3),
        "single_cases": single_total,
        "conversation_pass_rate": round(conv_pass / max(conv_total, 1), 3),
        "conversation_cases": conv_total,
        "enroll_seconds": round(enroll_s, 2),
        "identify_seconds": round(identify_s, 2),
    }
    print(json.dumps(out))
    return 0 if single_pass == single_total else 1


if __name__ == "__main__":
    raise SystemExit(main())
