"""Embedder training driver: AAM-softmax on the synthetic voice corpus.

Gives the framework a model that actually discriminates speakers (the
reference could never train — its model lived in the Speechmatics cloud).
Run:  python -m sdtk_tpu.training --steps 300 --speakers 64

Data flows host→device as waveforms; features are computed on device
(sdtk_tpu.ops.fbank), so the training step exercises the same compute
path as inference.  Distribution comes from sdtk_tpu.parallel (data ×
model mesh).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def train(
    steps: int = 300,
    n_speakers: int = 64,
    families: str = "0",
    batch: int = 32,
    seconds: float = 3.0,
    crop_seconds: float = 1.5,
    channels: int = 512,
    scale: int = 8,
    model_name: str = "ecapa",
    lr: float = 1e-3,
    mesh_spec: str = "",
    seed: int = 0,
    out_path: str | Path | None = None,
    resume_path: str | Path | None = None,
    ckpt_dir: str | Path | None = None,
    ckpt_every: int = 200,
    log_every: int = 20,
    noise_prob: float = 0.0,
    noise_snr_db: tuple[float, float] = (5.0, 25.0),
    aug_prob: float = 0.0,
    bed_prob: float = 0.0,
    bed_snr_db: tuple[float, float] = (3.0, 20.0),
    log=print,
):
    """``crop_seconds`` < ``seconds`` trains on random crops (with random
    gain), matching the diarizer's window distribution — including
    silence-heavy and mid-utterance crops."""
    from .data.synth import SR
    from .data.synth_families import synth_family_batch
    from .models import EcapaConfig, EcapaTdnn
    from .ops import fbank
    from .parallel import make_mesh
    from .parallel.train import (
        TrainConfig,
        create_train_state,
        make_distributed_step,
        shard_state,
    )
    from .utils import jaxcache

    jaxcache.enable()
    import jax
    import jax.numpy as jnp

    fcfg = fbank.FrontendConfig()
    if model_name == "ecapa":
        model = EcapaTdnn(EcapaConfig(channels=channels, scale=scale))
    elif model_name == "xvector":
        from .models import XVector, XVectorConfig

        model = XVector(XVectorConfig(channels=channels))
    elif model_name == "conformer":
        from .models import Conformer, ConformerConfig

        model = Conformer(ConformerConfig(dim=min(channels, 256)))
    else:
        raise ValueError(f"unknown model '{model_name}'")
    # Multi-family corpus (data/synth_families.py): one AAM class per
    # (family, speaker) pair, so the tower must separate speakers inside
    # every generator family — family-channel artifacts stop being a
    # usable identity signal (r2 held-out generalization finding).
    family_ids = tuple(int(x) for x in str(families).split(",") if x != "")
    n_classes = n_speakers * len(family_ids)
    tcfg = TrainConfig(
        n_classes=n_classes, emb_dim=model.cfg.emb_dim, learning_rate=lr
    )
    mesh = make_mesh(mesh_spec)

    crop_seconds = min(crop_seconds or seconds, seconds)
    n_samples = int(crop_seconds * SR)
    t_frames = fcfg.num_frames(n_samples)
    state = create_train_state(
        model, jax.random.PRNGKey(seed), tcfg, jnp.zeros((1, t_frames, fcfg.n_mels))
    )
    if resume_path:
        # Warm-start from a saved inference checkpoint: merge every leaf
        # whose path+shape matches (the AAM head is skipped when the class
        # count changed, optimizer state always starts fresh).
        import flax.serialization

        with open(resume_path, "rb") as f:
            loaded = flax.serialization.msgpack_restore(f.read())

        merged, skipped = [0], []

        def merge(tmpl, src, path=""):
            if isinstance(tmpl, dict):
                return {
                    k: merge(v, (src or {}).get(k), f"{path}/{k}")
                    for k, v in tmpl.items()
                }
            if src is not None and getattr(src, "shape", None) == tmpl.shape:
                merged[0] += 1
                return jnp.asarray(src, tmpl.dtype)
            skipped.append(path)
            return tmpl

        new_params = merge(
            flax.serialization.to_state_dict(state.params),
            loaded.get("params"),
        )
        new_stats = merge(
            flax.serialization.to_state_dict(state.batch_stats),
            loaded.get("batch_stats"),
        )
        state = state.replace(
            params=flax.serialization.from_state_dict(state.params, new_params),
            batch_stats=flax.serialization.from_state_dict(
                state.batch_stats, new_stats
            ),
        )
        log(f"resumed backbone from {resume_path} "
            f"({merged[0]} leaves, {len(skipped)} skipped)")
    if ckpt_dir:
        # Full train-state resume (params + optimizer + step) if a prior
        # run left a checkpoint — crash recovery for long runs.
        from .parallel.checkpoint import latest_checkpoint, restore_train_state

        latest = latest_checkpoint(ckpt_dir)
        if latest is not None:
            state = restore_train_state(latest, state)
            log(f"restored full train state from {latest} "
                f"(step {int(state.step)})")
    state = shard_state(state, mesh)
    step_fn = make_distributed_step(mesh, tcfg)

    featurize = jax.jit(lambda wav: fbank.log_mel(wav, fcfg))

    rng = np.random.default_rng(seed)
    full_len = int(seconds * SR)

    def make_batch() -> tuple[np.ndarray, np.ndarray]:
        cls = rng.integers(0, n_classes, batch)
        fam_idx, sids = np.divmod(cls, n_speakers)
        fams = np.asarray([family_ids[i] for i in fam_idx])
        uids = rng.integers(0, 1_000_000, batch)
        wavs = synth_family_batch(fams, sids, uids, seconds)
        if n_samples < full_len:
            offs = rng.integers(0, full_len - n_samples + 1, batch)
            wavs = np.stack([w[o : o + n_samples] for w, o in zip(wavs, offs)])
        wavs = wavs * rng.uniform(0.3, 1.2, (batch, 1)).astype(np.float32)
        if aug_prob > 0:
            # Prosody/channel augmentation chain (speed, reverb, tilt,
            # band-limit) — generalization beyond the training generator's
            # clean channel (r1 held-out EER finding).
            from .data.augment import AugmentSpec, augment_batch

            wavs = augment_batch(wavs, rng, AugmentSpec.uniform(aug_prob))
        if noise_prob > 0:
            # Additive white noise at a random SNR: content-invariance
            # hardening (same-speaker windows with different phonetic
            # content must still embed together for the diarizer's
            # cluster-merge counting to hold).
            mask_n = rng.uniform(size=batch) < noise_prob
            if mask_n.any():
                rms = np.sqrt((wavs**2).mean(axis=1, keepdims=True) + 1e-12)
                snr_db = rng.uniform(*noise_snr_db, (batch, 1))
                sigma = rms * 10.0 ** (-snr_db / 20.0) * mask_n[:, None]
                wavs = (
                    wavs + sigma * rng.standard_normal(wavs.shape)
                ).astype(np.float32)
        if bed_prob > 0:
            # Structured non-speech beds (music/hum/keyboard/pink) under
            # the speech at a random SNR: the r4 music-tier matrix showed
            # embedder CONFUSION (26.5%) as the residual loss once the
            # trained VAD gates windows — white noise augmentation does
            # not cover pitched/harmonic interference.
            from .data.nonspeech import mix_at_snr, sample_nonspeech

            for i in np.nonzero(rng.uniform(size=batch) < bed_prob)[0]:
                bed = sample_nonspeech(
                    n_samples / SR + 0.1, int(rng.integers(1 << 30)))
                wavs[i] = mix_at_snr(
                    wavs[i], bed, float(rng.uniform(*bed_snr_db)))
        return wavs, cls

    # Host batch synthesis (procedural voices + augmentation) costs far
    # more than the device step at these sizes, so overlap it: one worker
    # thread keeps a small queue of ready batches while the chip trains.
    # Determinism is preserved — `rng` is only touched by the worker, in
    # order, so the batch sequence matches the serial loop exactly.
    import queue as _queue
    import threading

    prefetch: _queue.Queue = _queue.Queue(maxsize=4)
    stop_flag = threading.Event()

    def _producer():
        # Any synth/augment failure is shipped through the queue so the
        # consumer re-raises it instead of blocking forever on get().
        try:
            for _ in range(steps):
                if stop_flag.is_set():
                    return
                prefetch.put(make_batch())
        except BaseException as exc:  # noqa: BLE001 — relayed, not swallowed
            prefetch.put(exc)

    producer = threading.Thread(target=_producer, daemon=True)
    producer.start()

    t_start = time.time()
    try:
        for step in range(steps):
            item = prefetch.get()
            if isinstance(item, BaseException):
                raise item
            wavs, sids = item
            feats, mask = featurize(jnp.asarray(wavs))
            state, metrics = step_fn(state, feats, mask, jnp.asarray(sids))
            if step % log_every == 0 or step == steps - 1:
                log(
                    f"step {step:4d}  loss {float(metrics['loss']):7.4f}  "
                    f"acc {float(metrics['acc']):5.3f}  "
                    f"({(time.time() - t_start):6.1f}s)"
                )
            if ckpt_dir and ckpt_every and (step + 1) % ckpt_every == 0:
                from .parallel.checkpoint import save_train_state

                p = save_train_state(ckpt_dir, state, step=int(state.step))
                log(f"checkpoint -> {p}")
    finally:
        stop_flag.set()
        while not prefetch.empty():  # unblock a producer stuck on put()
            prefetch.get_nowait()

    # Persist inference variables (params + batch_stats) for TpuBackend.
    import flax.serialization

    from . import config
    from .utils.ioutil import atomic_write_bytes

    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    out_path = (
        Path(out_path)
        if out_path
        else config.model_dir() / f"{type(model).__name__.lower()}.msgpack"
    )
    atomic_write_bytes(out_path, flax.serialization.to_bytes(variables))
    log(f"saved params -> {out_path}")
    return state, out_path


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="sdtk-train", description=__doc__)
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--speakers", type=int, default=64,
                   help="Speakers PER FAMILY (classes = speakers × families)")
    p.add_argument("--families", default="0",
                   help="Comma list of synthetic family ids to train across "
                        "(data/synth_families.py; 0 = the original "
                        "data/synth.py corpus)")
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--seconds", type=float, default=3.0)
    p.add_argument("--crop-seconds", type=float, default=1.5)
    p.add_argument("--channels", type=int, default=512)
    p.add_argument("--scale", type=int, default=8,
                   help="ECAPA Res2Net scale (8 = reference topology; 4 "
                        "doubles group-conv width to 128 lanes — the MFU "
                        "ceiling what-if, evals/mfu_probe.py tower_s4)")
    p.add_argument("--model", default="ecapa",
                   choices=["ecapa", "xvector", "conformer"])
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--mesh", default="")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out")
    p.add_argument("--resume", help="Warm-start from a saved .msgpack checkpoint")
    p.add_argument("--ckpt-dir", help="Periodic full-state checkpoints (crash resume)")
    p.add_argument("--ckpt-every", type=int, default=200)
    p.add_argument("--noise-prob", type=float, default=0.0,
                   help="Per-example probability of additive-noise augmentation")
    p.add_argument("--noise-snr", type=float, nargs=2, default=(5.0, 25.0),
                   metavar=("LO", "HI"), help="SNR range in dB for noise aug")
    p.add_argument("--bed-prob", type=float, default=0.0,
                   help="Per-example probability of a structured non-speech "
                        "bed (music/hum/keyboard/pink) mixed at --bed-snr")
    p.add_argument("--bed-snr", type=float, nargs=2, default=(3.0, 20.0))
    p.add_argument("--aug-prob", type=float, default=0.0,
                   help="Per-example probability for each channel/prosody "
                        "augmentation (speed, reverb, tilt, band-limit)")
    args = p.parse_args(argv)
    train(
        steps=args.steps,
        n_speakers=args.speakers,
        families=args.families,
        batch=args.batch,
        seconds=args.seconds,
        crop_seconds=args.crop_seconds,
        channels=args.channels,
        scale=args.scale,
        model_name=args.model,
        lr=args.lr,
        mesh_spec=args.mesh,
        seed=args.seed,
        out_path=args.out,
        resume_path=args.resume,
        ckpt_dir=args.ckpt_dir,
        ckpt_every=args.ckpt_every,
        noise_prob=args.noise_prob,
        bed_prob=args.bed_prob,
        bed_snr_db=tuple(args.bed_snr),
        noise_snr_db=tuple(args.noise_snr),
        aug_prob=args.aug_prob,
        log=lambda msg: print(msg, file=sys.stderr),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
