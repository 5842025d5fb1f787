#!/usr/bin/env python3
"""Train the frame-level VAD (models/vad.py) on synthetic speech vs the
non-speech negative classes (data/nonspeech.py).

Positives: 1.5 s windows from the multi-family TRAIN voices (synth.py),
clean and bed-mixed (speech over music/noise at SNR 0-20) and
band-limited — a window containing speech is speech even with a bed
under it.  Negatives: music, white/pink noise, hum, keyboard, silence.
The held-out eval family (synth_heldout.py) is NEVER touched here — it
stays the measurement.

Runs on CPU in ~2 min (the model is 23k params).

Usage: python evals/train_vad.py [--steps 400] [--out models/vad.msgpack]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SR = 16000
WIN_S = 1.5
N = int(WIN_S * SR)
# Lowest speech-over-bed SNR labeled "speech" during training.  At 0 dB
# the bed and the speech are indistinguishable targets and the model
# trades speech recall for bed rejection — the r4 melody-negatives
# retrain lost 9 points of bedded-speech recall that way; a 4 dB floor
# plus pos_weight keeps recall while the melody class fixes the
# held-out-music false accepts.
BED_SNR_LO = 4.0


def speech_window(rng: np.random.Generator) -> np.ndarray:
    from sdtk_tpu.data import nonspeech
    from sdtk_tpu.data.augment import band_limit
    from sdtk_tpu.data.synth import synth_utterance

    spk = int(rng.integers(64))
    x = synth_utterance(spk, int(rng.integers(1 << 30)), WIN_S + 0.2)[:N]
    if len(x) < N:
        x = np.pad(x, (0, N - len(x)))
    r = rng.uniform()
    if r < 0.35:  # bed under the speech — still speech
        bed = nonspeech.sample_nonspeech(WIN_S, int(rng.integers(1 << 30)))
        x = nonspeech.mix_at_snr(x, bed, float(rng.uniform(BED_SNR_LO, 20.0)))
    elif r < 0.5:  # channel shift
        x = band_limit(x, float(rng.uniform(80, 320)),
                       float(rng.uniform(3000, 7600)))
    return (x * float(rng.uniform(0.2, 1.0))).astype(np.float32)


def nonspeech_window(rng: np.random.Generator) -> np.ndarray:
    from sdtk_tpu.data import nonspeech

    if rng.uniform() < 0.12:  # near-silence
        return (1e-4 * rng.standard_normal(N)).astype(np.float32)
    return nonspeech.sample_nonspeech(WIN_S, int(rng.integers(1 << 30)))[:N]


def composite_window(rng: np.random.Generator, n_frames: int,
                     frame_hop: int = 160, frame_len: int = 400):
    """Speech and non-speech spliced INSIDE one window, with per-frame
    labels from the construction — whole-window labels teach the model
    window-level decisions only (r4: frame probabilities tracked the
    window, not the boundary, so interval clipping had ~window
    resolution)."""
    s = speech_window(rng)
    ns = nonspeech_window(rng)
    ns = np.pad(ns, (0, max(0, N - len(ns))))[:N]
    cut = int(rng.uniform(0.25, 0.75) * N)
    speech_first = rng.uniform() < 0.5
    if speech_first:
        wav = np.concatenate([s[:cut], ns[cut:]])
    else:
        wav = np.concatenate([ns[:cut], s[cut:]])
    centers = np.arange(n_frames) * frame_hop + frame_len // 2
    in_first = centers < cut
    labels = np.where(in_first, 1.0, 0.0) if speech_first else \
        np.where(in_first, 0.0, 1.0)
    return wav.astype(np.float32), labels.astype(np.float32)


def make_batch(rng: np.random.Generator, size: int, n_frames: int):
    wavs, labels = [], []
    for _ in range(size):
        r = rng.uniform()
        if r < 0.35:
            wavs.append(speech_window(rng))
            labels.append(np.ones(n_frames, np.float32))
        elif r < 0.7:
            w = nonspeech_window(rng)
            wavs.append(np.pad(w, (0, max(0, N - len(w))))[:N])
            labels.append(np.zeros(n_frames, np.float32))
        else:
            w, lab = composite_window(rng, n_frames)
            wavs.append(w)
            labels.append(lab)
    return np.stack(wavs), np.stack(labels)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=str(REPO_ROOT / "models" / "vad.msgpack"))
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--arch", default="v4", choices=["v3", "v4"],
                    help="v4 (default): derived flatness/flux channels + "
                         "a dilation-8 third conv (~410 ms receptive "
                         "field, sees syllabic rhythm); v3: the r4 "
                         "two-conv graph for A/B")
    ap.add_argument("--pos-weight", type=float, default=2.0,
                    help="BCE weight on speech frames: a missed speech "
                         "frame clips real words out of segments (turn "
                         "statistics distort), a passed bed frame only "
                         "adds false alarm the collar mostly absorbs")
    args = ap.parse_args()

    import os

    os.environ.setdefault("SDTK_FORCE_CPU", "1")
    from sdtk_tpu.utils import jaxcache

    jaxcache.enable()
    import jax
    import jax.numpy as jnp
    import optax

    from sdtk_tpu.models.vad import VadConfig, VadNet, save_params
    from sdtk_tpu.ops import fbank

    fcfg = fbank.FrontendConfig()
    vcfg = VadConfig(n_mels=fcfg.n_mels, deep=args.arch == "v4",
                     extra_feats=args.arch == "v4")
    model = VadNet(vcfg)
    rng = np.random.default_rng(args.seed)

    feats0, _ = fbank.log_mel(jnp.zeros((2, N)), fcfg)
    params = model.init(jax.random.PRNGKey(args.seed), feats0)
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    n_frames = fcfg.num_frames(N)

    @jax.jit
    def step(params, opt_state, wavs, labels):
        feats, mask = fbank.log_mel(wavs, fcfg)

        def loss_fn(p):
            logits = model.apply(p, feats)
            per = optax.sigmoid_binary_cross_entropy(logits, labels)
            w = 1.0 + (args.pos_weight - 1.0) * labels
            return (per * w * mask).sum() / jnp.maximum((w * mask).sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.steps):
        wavs, labels = make_batch(rng, args.batch, n_frames)
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(wavs), jnp.asarray(labels))
        if i % 50 == 0:
            print(f"step {i}: loss {float(loss):.4f}", file=sys.stderr)

    # held-out-seed eval through the SERVING (NumPy) path — catches any
    # train/serve skew, not just training convergence
    save_params(params, args.out)
    from sdtk_tpu.models.vad import VadScorer
    from sdtk_tpu.ops.fbank import log_mel_reference

    scorer = VadScorer(args.out)
    eval_rng = np.random.default_rng(args.seed + 10_000)
    correct = total = 0
    for _ in range(100):
        is_speech = eval_rng.uniform() < 0.5
        w = (speech_window(eval_rng) if is_speech
             else nonspeech_window(eval_rng))
        w = np.pad(w, (0, max(0, N - len(w))))[:N]
        probs = scorer.frame_probs(log_mel_reference(w, fcfg))
        pred = float(np.mean(probs > 0.5)) > 0.3
        correct += int(pred == is_speech)
        total += 1
    acc = correct / total
    print(json.dumps({
        "benchmark": "train_vad", "steps": args.steps,
        "final_loss": round(float(loss), 4),
        "holdout_window_accuracy": acc, "out": args.out,
    }))
    return 0 if acc >= 0.9 else 1


if __name__ == "__main__":
    raise SystemExit(main())
