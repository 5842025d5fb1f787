#!/usr/bin/env python3
"""MFU decomposition probe: WHERE do the batch-sweep knee and the
batch-2048 reversal come from? (r3 VERDICT weak #3)

Measures the serving pipeline stage-by-stage at the requested batch
sizes and reports per-stage ms + achieved FLOP/s vs the bf16 peak:

  frontend   log-mel only (framing + GEMM-NDFT + mel + log)
  tower      ECAPA-512 apply on precomputed feats (device-resident)
  full       frontend + tower fused in one jit (the bench program)

Each (stage, batch) pair is its own jit program → its own one-time
compile; select only what you need:

  python evals/mfu_probe.py --stages frontend,tower --batches 1024,2048
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

PEAK_FLOPS = 197e12  # v5e bf16


def ecapa_flops_per_window(cfg, n_frames: int) -> float:
    """Analytic MACs×2 for one window through ECAPA (conv + attention
    matmuls; elementwise ignored)."""
    C, S = cfg.channels, cfg.scale
    w = C // S
    f = 0.0
    f += n_frames * 5 * cfg.n_mels * C            # stem k=5
    for _ in cfg.dilations:                        # 3 SE-Res2 blocks
        f += n_frames * C * C                      # tdnn_in 1x1
        f += (S - 1) * n_frames * 3 * w * w        # res2 convs k=3
        f += n_frames * C * C                      # tdnn_out 1x1
        f += C * cfg.se_bottleneck * 2             # SE squeeze/excite
    f += n_frames * 3 * C * cfg.mfa_channels       # MFA 1x1 (3C concat in)
    f += n_frames * 3 * cfg.mfa_channels * cfg.attention_channels  # att1
    f += n_frames * cfg.attention_channels * cfg.mfa_channels      # att2
    f += 2 * cfg.mfa_channels * cfg.emb_dim        # embedding
    return 2.0 * f


def frontend_flops_per_window(fcfg, n_frames: int) -> float:
    n_freqs = fcfg.n_fft // 2 + 1
    per_frame = 2 * (fcfg.win_length * n_freqs * 2 + n_freqs * fcfg.n_mels)
    return float(n_frames * per_frame)


def bench(fn, arr, iters):
    """Time ``iters`` data-chained steps inside ONE jitted scan — the
    transport dedupes identical dispatches (r4 finding: 10 identical
    batch-1024 tower calls returned in 2.5 ms), so naive loops measure
    the cache.  ``fn`` takes and is chained on a single array."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(a):
        def body(carry, _):
            out = fn(carry)
            dep = jnp.ravel(out)[0].astype(jnp.float32) * 1e-30
            return carry + dep, ()

        final, _ = jax.lax.scan(body, a, None, length=iters)
        return final

    jax.block_until_ready(run(arr))  # compile + warm
    # time on a DIFFERENT buffer: a repeat of the exact (program,
    # buffers) request can be served from the transport's cache
    arr2 = arr + 1e-6
    jax.block_until_ready(arr2)
    t0 = time.perf_counter()
    jax.block_until_ready(run(arr2))
    return (time.perf_counter() - t0) / iters


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", default="frontend,tower,full")
    ap.add_argument("--batches", default="512,1024,2048")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()
    stages = args.stages.split(",")
    batches = [int(b) for b in args.batches.split(",")]

    from sdtk_tpu.utils import jaxcache

    jaxcache.enable()
    import jax
    import jax.numpy as jnp

    from sdtk_tpu.models import EcapaConfig, EcapaTdnn
    from sdtk_tpu.ops import fbank

    fcfg = fbank.FrontendConfig()
    n = int(args.seconds * fcfg.sample_rate)
    n_frames = fcfg.num_frames(n)
    rng = np.random.default_rng(0)

    results = []
    for batch in batches:
        wav = jax.device_put(
            rng.standard_normal((batch, n)).astype(np.float32))
        feats_host = rng.standard_normal(
            (batch, n_frames, fcfg.n_mels)).astype(np.float32)
        feats = jax.device_put(feats_host)

        for stage in stages:
            if stage == "frontend":
                fn = lambda a: fbank.log_mel(a, fcfg)[0]
                arg = wav
                flops = frontend_flops_per_window(fcfg, n_frames) * batch
            elif stage in ("tower", "tower_s4"):
                # tower_s4: Res2 scale 8→4 doubles the group-conv width
                # (64→128 output channels) — the what-if for the MFU
                # ceiling analysis: N=64 lanes under-fill the 256-lane
                # MXU tiles, and the 7 sequential group convs are ~26%
                # of tower FLOPs.  Architecture variant, perf-only
                # (random weights; serving would need retraining).
                mcfg = EcapaConfig(channels=512,
                                   scale=4 if stage == "tower_s4" else 8)
                model = EcapaTdnn(mcfg)
                variables = jax.device_put(model.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 64, fcfg.n_mels))))
                fn = lambda f: model.apply(variables, f)
                arg = feats
                flops = ecapa_flops_per_window(mcfg, n_frames) * batch
            elif stage == "full":
                mcfg = EcapaConfig(channels=512)
                model = EcapaTdnn(mcfg)
                variables = jax.device_put(model.init(
                    jax.random.PRNGKey(0),
                    jnp.zeros((1, 64, fcfg.n_mels))))

                def full(a):
                    fe, mask = fbank.log_mel(a, fcfg)
                    emb = model.apply(variables, fe, mask=mask)
                    return emb / jnp.maximum(
                        jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)

                fn = full
                arg = wav
                flops = (frontend_flops_per_window(fcfg, n_frames)
                         + ecapa_flops_per_window(mcfg, n_frames)) * batch
            else:
                raise SystemExit(f"unknown stage {stage}")

            sec = bench(fn, arg, args.iters)
            row = {
                "stage": stage, "batch": batch,
                "ms": round(sec * 1000, 3),
                "audio_s_per_s": round(batch * args.seconds / sec, 1),
                "mfu": round(flops / sec / PEAK_FLOPS, 4),
            }
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"benchmark": "mfu_probe", "rows": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
