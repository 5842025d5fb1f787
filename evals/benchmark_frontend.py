#!/usr/bin/env python3
"""Frontend A/B: XLA log_mel vs the two Pallas kernels, serving shape.

The r3 honest A/B kept the losing frames-based kernel in tree
(fbank_frames_pallas: 13.4 ms vs XLA 5.5 ms per batch-1024 — it pays for
the (B, T, 400) framed copy in HBM twice).  r4 adds the waveform-based
kernel (ops/research/fbank_wave.py) whose framing never leaves VMEM and whose
preemphasis is folded into the DFT bases; this harness measures all
three on the same shape and prints one JSON line.

Usage: python evals/benchmark_frontend.py [--batch 1024] [--seconds 3]
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


def _bench(fn, args, iters=20):
    """Chained-scan timing (single dispatch) — the transport dedupes
    identical dispatches, so naive repeat loops measure the cache (r4,
    see evals/mfu_probe.py)."""
    import jax
    import jax.numpy as jnp

    inner = fn

    @jax.jit
    def run(a):
        def body(carry, _):
            out = inner(carry)
            dep = jnp.ravel(out)[0].astype(jnp.float32) * 1e-30
            return carry + dep, ()

        final, _ = jax.lax.scan(body, a, None, length=iters)
        return final

    jax.block_until_ready(run(args[0]))  # compile + warm
    a2 = args[0] + 1e-6
    jax.block_until_ready(a2)
    t0 = time.perf_counter()
    jax.block_until_ready(run(a2))
    return (time.perf_counter() - t0) / iters * 1000.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--seconds", type=float, default=3.0)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--chunk-rows", type=int, default=4)
    args = ap.parse_args()

    from sdtk_tpu.utils import jaxcache

    jaxcache.enable()
    import jax
    import jax.numpy as jnp

    from sdtk_tpu.ops import fbank
    from sdtk_tpu.ops.research.fbank_wave import log_mel_wave

    cfg = fbank.FrontendConfig()
    n = int(args.seconds * cfg.sample_rate)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((args.batch, n)).astype(np.float32))

    xla_fn = lambda a: fbank.log_mel(a, cfg)[0]
    frames_fn = lambda a: fbank_frames.log_mel_fused(a, cfg)[0]
    wave_fn = lambda a: log_mel_wave(a, cfg, chunk_rows=args.chunk_rows)[0]

    # parity spot-check before timing (device numerics, bf16)
    ref = np.asarray(jax.jit(xla_fn)(x[:4]))
    got = np.asarray(jax.jit(wave_fn)(x[:4]))
    max_err = float(np.abs(ref - got).max())

    results = {
        "benchmark": "frontend",
        "batch": args.batch,
        "seconds": args.seconds,
        "xla_ms": round(_bench(xla_fn, (x,), args.iters), 3),
        "pallas_frames_ms": round(_bench(frames_fn, (x,), args.iters), 3),
        "pallas_wave_ms": round(_bench(wave_fn, (x,), args.iters), 3),
        "wave_vs_xla_max_abs_err": round(max_err, 4),
        "chunk_rows": args.chunk_rows,
        "backend": jax.default_backend(),
    }
    results["winner"] = min(
        ("xla_ms", "pallas_frames_ms", "pallas_wave_ms"),
        key=lambda k: results[k],
    ).replace("_ms", "")
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
