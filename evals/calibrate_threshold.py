#!/usr/bin/env python3
"""Fit the verify-score calibration for a local backend checkpoint.

The reference toolkit inherits 0.354 as the identify/verify similarity
threshold (speaker_detection:1501, base.py:136) from the Speechmatics
score space.  A local embedding space has its own geometry, so this
script *measures* where that operating point lives: it scores genuine and
impostor trials over training-family speakers UNSEEN in training (ids
offset far beyond the training range — the held-out eval family in
data/synth_heldout.py is never touched, it stays a pure measurement set),
finds the EER threshold t*, and writes an affine calibration

    calibrated = 0.354 + (raw - t*) * gain,   gain = (0.9-0.354)/(mu_gen - t*)

as a ``.calib.json`` sidecar next to the checkpoint.  TpuBackend picks the
sidecar up automatically (backends/tpu.py), making `identify` /` verify`
with the reference's default threshold behave like the reference intended:
accept genuine, reject impostor, at the measured equal-error point.

Usage: python evals/calibrate_threshold.py [--backend tpu] [--speakers 24]
       [--trials-per-speaker 6] [--base-id 500000] [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def eer_point(genuine: np.ndarray, impostor: np.ndarray) -> tuple[float, float]:
    """Threshold sweep → (eer, threshold at the FAR==FRR crossing)."""
    lo = float(min(genuine.min(), impostor.min()))
    hi = float(max(genuine.max(), impostor.max()))
    best = (1.0, 0.5 * (lo + hi), 0.5)
    for t in np.linspace(lo, hi, 2001):
        far = float((impostor >= t).mean())
        frr = float((genuine < t).mean())
        gap = abs(far - frr)
        if gap < best[0]:
            best = (gap, float(t), 0.5 * (far + frr))
    return best[2], best[1]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--backend", default="tpu")
    p.add_argument("--speakers", type=int, default=24)
    p.add_argument("--trials-per-speaker", type=int, default=6)
    p.add_argument("--seconds", type=float, default=3.0)
    p.add_argument("--base-id", type=int, default=500_000,
                   help="First calibration speaker id (must exceed every "
                        "training id so these voices are unseen)")
    p.add_argument("--families", default="0",
                   help="Comma list of training family ids to sample "
                        "calibration voices from (data/synth_families.py); "
                        "should match the checkpoint's training families")
    p.add_argument("--cohort-size", type=int, default=192,
                   help="AS-norm cohort size: embeddings of this many "
                        "ADDITIONAL unseen voices are written to a "
                        "<checkpoint>.cohort.npy sidecar and identify/"
                        "verify scores are adaptively normalized against "
                        "them (backends/base.py score_matrix).  0 disables.")
    p.add_argument("--augment-prob", type=float, default=0.5,
                   help="Apply the training augmentation chain (speed/"
                        "reverb/tilt/band-limit, data/augment.py) to the "
                        "calibration trials at this per-effect probability "
                        "— calibrating under the deployment channel "
                        "distribution instead of the clean generator "
                        "(whose near-perfect separation yields an over-"
                        "tight gain).  0 disables.")
    p.add_argument("--out", help="Sidecar path (default: next to the "
                                 "backend's checkpoint)")
    args = p.parse_args()

    from sdtk_tpu.backends import get_backend
    from sdtk_tpu.data.synth_families import family_utterance
    from sdtk_tpu.ops.cosine import asnorm

    backend = get_backend(args.backend)
    families = [int(x) for x in str(args.families).split(",") if x != ""]

    aug_rng = np.random.default_rng(12345)
    aug_spec = None
    if args.augment_prob > 0:
        from sdtk_tpu.data.augment import AugmentSpec, augment_batch

        aug_spec = AugmentSpec.uniform(args.augment_prob)

    def make(spk: int, utt: int) -> np.ndarray:
        fam = families[spk % len(families)]
        wav = family_utterance(fam, args.base_id + spk, utt, args.seconds)
        if aug_spec is not None:
            wav = augment_batch(wav[None, :], aug_rng, aug_spec)[0]
        return np.asarray(wav, np.float32)

    def embed_all(wavs: list[np.ndarray]) -> np.ndarray:
        if hasattr(backend, "embed_batch"):  # one device call per 16
            return np.asarray(backend.embed_batch(wavs), np.float32)
        return np.stack(
            [np.asarray(backend.embed_waveform(w), np.float32) for w in wavs]
        )

    n_spk, n_trial = args.speakers, args.trials_per_speaker
    enroll = embed_all([make(s, 0) for s in range(n_spk)])
    trials = embed_all(
        [make(s, 1 + t) for s in range(n_spk) for t in range(n_trial)]
    )
    trial_spk = np.repeat(np.arange(n_spk), n_trial)

    def unit(x):
        return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    # AS-norm cohort: further unseen voices, disjoint from the
    # calibration speakers (ids offset another 100k).
    cohort = None
    if args.cohort_size > 0:
        cohort = unit(embed_all(
            [make(100_000 + i, 0) for i in range(args.cohort_size)]
        ))

    raw = unit(trials) @ unit(enroll).T  # (S*T, S)
    idx = np.arange(len(trials))
    mask = np.ones_like(raw, bool)
    mask[idx, trial_spk] = False

    raw_gen, raw_imp = raw[idx, trial_spk], raw[mask]
    raw_eer, raw_t = eer_point(raw_gen, raw_imp)

    if cohort is not None:
        qc = unit(trials) @ cohort.T
        pc = unit(enroll) @ cohort.T
        scored = asnorm(raw, qc, pc)
        score_space = "asnorm"
    else:
        scored = raw
        score_space = "raw"
    genuine, impostor = scored[idx, trial_spk], scored[mask]

    eer, t_star = eer_point(genuine, impostor)
    mu_gen = float(genuine.mean())
    gain = (0.9 - 0.354) / max(mu_gen - t_star, 1e-3)
    calib = {
        # Affine map fitted in the space score_matrix actually scores in
        # (AS-normed when the cohort sidecar exists, raw cosine else).
        "eer_threshold": round(t_star, 4),
        "gain": round(gain, 4),
        "score_space": score_space,
        "calibration_eer": round(eer, 4),
        "genuine_mean": round(mu_gen, 4),
        "impostor_mean": round(float(impostor.mean()), 4),
        # Raw-cosine-space measurements, for consumers that operate on
        # raw window-embedding geometry (cluster merging, streaming):
        "raw_eer_threshold": round(raw_t, 4),
        "raw_eer": round(raw_eer, 4),
        "raw_genuine_mean": round(float(raw_gen.mean()), 4),
        "raw_impostor_mean": round(float(raw_imp.mean()), 4),
        # Same-speaker cosine bar for cluster-merge speaker counting
        # (cluster.spectral.merge_count): midway between the measured
        # same/different-speaker linkage in THIS embedding space, replacing
        # the hard-coded 0.47 (which assumed the training-family geometry).
        "suggested_merge_tau": round(0.5 * float(raw_gen.mean() + raw_imp.mean()), 4),
        "speakers": n_spk,
        "base_id": args.base_id,
        "families": families,
        "cohort_size": int(0 if cohort is None else len(cohort)),
        "augment_prob": args.augment_prob,
        "provenance": "training-family voices unseen in training "
                      "(data/synth_families.py ids >= base_id); held-out "
                      "eval family (data/synth_heldout.py) not used",
    }

    out = args.out
    if not out:
        src = getattr(backend.engine, "params_source", None) if hasattr(
            backend, "engine") else None
        if not src or src == "random-init":
            print("no checkpoint to attach a sidecar to; use --out",
                  file=sys.stderr)
            return 1
        out = str(Path(src).with_suffix(".calib.json"))
    if cohort is not None:
        cohort_path = Path(out).with_suffix("").with_suffix(".cohort.npy")
        # .with_suffix twice strips ".calib" when out ends ".calib.json"
        cohort_path = Path(str(out).replace(".calib.json", ".cohort.npy")) \
            if str(out).endswith(".calib.json") else cohort_path
        np.save(cohort_path, cohort.astype(np.float32))
        print(f"wrote {cohort_path}", file=sys.stderr)
    Path(out).write_text(json.dumps(calib, indent=2) + "\n")
    print(f"wrote {out}", file=sys.stderr)
    print(json.dumps({"benchmark": "calibration", "backend": args.backend,
                      **calib}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
