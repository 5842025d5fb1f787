#!/usr/bin/env python3
"""Speaker-verification EER + threshold calibration on the HELD-OUT
generator family.

The reference inherits 0.354 as the verify similarity threshold
(speaker_detection:1501, base.py:136) without ever measuring it.  This
benchmark makes it a measured operating point in the trained embedding
space: N held-out speakers (data/synth_heldout.py — disjoint from the
training generator), enroll on one utterance, score genuine + impostor
trials, report:

- EER and the threshold that achieves it;
- FAR/FRR at the inherited 0.354;
- a small calibration table (threshold → FAR/FRR).

Usage: python evals/benchmark_eer.py [--backend tpu|fake] [--speakers 16]
       [--trials-per-speaker 6] [--tier clean|noise|reverb|telephone]
Outputs one JSON line (plus the calibration table on stderr).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default="tpu")
    p.add_argument("--speakers", type=int, default=16)
    p.add_argument("--trials-per-speaker", type=int, default=6)
    p.add_argument("--seconds", type=float, default=3.0)
    p.add_argument("--tier", default="clean",
                   choices=["clean", "noise", "reverb", "telephone"])
    p.add_argument("--snr-db", type=float, default=15.0)
    args = p.parse_args()

    from sdtk_tpu.backends import get_backend
    from sdtk_tpu.data.synth_heldout import apply_tier, heldout_utterance

    backend = get_backend(args.backend)

    def make(spk: int, utt: int) -> np.ndarray:
        wav = heldout_utterance(spk, utt, args.seconds)
        return apply_tier(wav, args.tier, seed=1000 * spk + utt,
                          snr_db=args.snr_db)

    def embed_all(wavs: list[np.ndarray]) -> np.ndarray:
        if hasattr(backend, "embed_batch"):  # one device call per 16
            return np.asarray(backend.embed_batch(wavs))
        return np.stack([backend.embed_waveform(w) for w in wavs])

    n_spk, n_trial = args.speakers, args.trials_per_speaker
    enroll = embed_all([make(s, 0) for s in range(n_spk)])  # (S, D)
    trials = embed_all(
        [make(s, 1 + t) for s in range(n_spk) for t in range(n_trial)]
    )  # (S*T, D)
    trial_spk = np.repeat(np.arange(n_spk), n_trial)

    scores = trials @ enroll.T  # cosine (unit rows)
    genuine = scores[np.arange(len(trials)), trial_spk]
    mask = np.ones_like(scores, dtype=bool)
    mask[np.arange(len(trials)), trial_spk] = False
    impostor = scores[mask]

    # EER via threshold sweep over the pooled score range
    thresholds = np.unique(np.concatenate([genuine, impostor]))
    far = np.array([(impostor >= th).mean() for th in thresholds])
    frr = np.array([(genuine < th).mean() for th in thresholds])
    i = int(np.argmin(np.abs(far - frr)))
    eer = float((far[i] + frr[i]) / 2)
    eer_threshold = float(thresholds[i])

    ref_th = 0.354
    far_ref = float((impostor >= ref_th).mean())
    frr_ref = float((genuine < ref_th).mean())

    # Scored operating point: when the backend carries a measured score
    # pipeline (AS-norm against its cohort sidecar + affine calibration,
    # backends/base.py score_matrix fitted by evals/calibrate_threshold.py
    # on training-family speakers), 0.354 is meant to BE the operating
    # threshold — report EER and FAR/FRR of the scored space so the
    # contract is checked end to end.
    calibrated = {}
    if hasattr(backend, "score_matrix"):
        scored_m = np.asarray(backend.score_matrix(trials, enroll))
        cal_gen = scored_m[np.arange(len(trials)), trial_spk]
        cal_imp = scored_m[mask]
        if not np.allclose(cal_gen, genuine):
            ths = np.unique(np.concatenate([cal_gen, cal_imp]))
            sfar = np.array([(cal_imp >= th).mean() for th in ths])
            sfrr = np.array([(cal_gen < th).mean() for th in ths])
            j = int(np.argmin(np.abs(sfar - sfrr)))
            calibrated = {
                "scored_eer": round(float((sfar[j] + sfrr[j]) / 2), 4),
                "scored_uses_asnorm": bool(
                    getattr(backend, "cohort", None) is not None
                ),
                "calibrated_far_at_reference": round(
                    float((cal_imp >= ref_th).mean()), 4
                ),
                "calibrated_frr_at_reference": round(
                    float((cal_gen < ref_th).mean()), 4
                ),
            }

    table = []
    for th in (0.2, 0.3, 0.354, 0.4, 0.5, 0.6, 0.7, round(eer_threshold, 3)):
        table.append(
            {
                "threshold": th,
                "far": round(float((impostor >= th).mean()), 4),
                "frr": round(float((genuine < th).mean()), 4),
            }
        )
    print("threshold  FAR     FRR", file=sys.stderr)
    for row in sorted(table, key=lambda r: r["threshold"]):
        print(f"  {row['threshold']:<8} {row['far']:<7} {row['frr']}", file=sys.stderr)

    out = {
        "benchmark": "eer",
        "backend": args.backend,
        "generator": "heldout",
        "tier": args.tier,
        "speakers": n_spk,
        "genuine_trials": int(len(genuine)),
        "impostor_trials": int(len(impostor)),
        "eer": round(eer, 4),
        "eer_threshold": round(eer_threshold, 4),
        "reference_threshold": ref_th,
        "far_at_reference": round(far_ref, 4),
        "frr_at_reference": round(frr_ref, 4),
        "genuine_mean": round(float(genuine.mean()), 4),
        "impostor_mean": round(float(impostor.mean()), 4),
        **calibrated,
        "calibration": table,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
