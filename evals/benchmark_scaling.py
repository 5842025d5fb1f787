#!/usr/bin/env python3
"""Data-parallel scaling-efficiency benchmark.

North-star target (BASELINE.md): ≥80% scaling efficiency going from 1 chip
to N devices.  The embed path is embarrassingly data-parallel — the batch
axis shards over the mesh ``data`` axis and there is zero inter-device
communication in the forward pass — so efficiency is gated purely by
per-device dispatch overhead and input placement.

On real multi-chip hardware this script measures true scaling.  Without it
(this environment exposes ONE real TPU), run on the virtual CPU mesh to
validate the sharded program and the measurement harness:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python evals/benchmark_scaling.py --devices 1,2,4,8

Prints one JSON line per mesh size plus a summary with
``scaling_efficiency`` = T_N / (N * T_1) throughput ratio.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8",
                    help="comma list of mesh sizes to measure")
    ap.add_argument("--per-device-batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=2.0,
                    help="audio window length")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--channels", type=int, default=128,
                    help="ECAPA width (small default so the CPU mesh run is quick)")
    args = ap.parse_args(argv)

    from sdtk_tpu.utils import jaxcache

    jaxcache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sdtk_tpu.models import EcapaConfig, EcapaTdnn
    from sdtk_tpu.ops import fbank
    from sdtk_tpu.parallel import make_mesh

    cfg = fbank.FrontendConfig()
    model = EcapaTdnn(EcapaConfig(channels=args.channels))
    n_samples = int(args.seconds * cfg.sample_rate)

    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, cfg.n_mels)))

    def embed(wav):
        feats, mask = fbank.log_mel(wav, cfg)
        emb = model.apply(variables, feats, mask=mask)
        return emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)

    sizes = [int(s) for s in args.devices.split(",")]
    avail = len(jax.devices())
    results = []
    for n in sizes:
        if n > avail:
            print(f"SKIP n={n}: only {avail} devices", file=sys.stderr)
            continue
        mesh = make_mesh(f"data={n}", jax.devices()[:n])
        batch = args.per_device_batch * n
        wav_np = np.random.default_rng(0).standard_normal(
            (batch, n_samples)).astype(np.float32)
        sharding = NamedSharding(mesh, P("data", None))
        wav = jax.device_put(wav_np, sharding)

        step = jax.jit(embed, in_shardings=sharding,
                       out_shardings=NamedSharding(mesh, P("data", None)))
        step(wav).block_until_ready()  # compile

        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(wav)
        out.block_until_ready()
        dt = time.perf_counter() - t0
        audio_s = batch * args.seconds * args.iters
        thr = audio_s / dt
        results.append({"devices": n, "batch": batch,
                        "throughput_audio_s_per_s": round(thr, 1)})
        print(json.dumps(results[-1]))

    if results and results[0]["devices"] == 1:
        t1 = results[0]["throughput_audio_s_per_s"]
        for r in results[1:]:
            r["scaling_efficiency"] = round(
                r["throughput_audio_s_per_s"] / (r["devices"] * t1), 3)
    summary = {"summary": results}
    if jax.default_backend() == "cpu":
        summary["note"] = (
            "virtual CPU mesh: all devices share host cores, so "
            "scaling_efficiency is NOT meaningful — this run validates the "
            "sharded program + harness; run on a real slice for numbers"
        )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
