#!/usr/bin/env python3
"""Large-N identify scoring A/B: fused Pallas kernel vs the XLA
decomposition (GEMM → (W, N) score matrix → window-max → lax.top_k).

Serving shape: W query windows (one identify call's worth of audio)
against an N-profile enrolled matrix (bf16, device-resident — the
enrollment store's natural form).  XLA gets its best case (profiles
pre-normalized outside the timed region); the Pallas kernel normalizes
in-flight and never materializes the score matrix.

Usage: python evals/benchmark_topk.py [--n 100000 1000000] [--windows 64]
Prints one JSON line; the dispatcher's threshold lives in
backends/base.py (identify hot path).
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


def _bench(fn, q0, p, iters=20):
    """Chained-scan timing (single dispatch; the transport dedupes
    identical dispatches — see evals/benchmark_frontend.py).

    The profile matrix is a jit ARGUMENT, never a closure capture: the
    remote-compile transport serializes closure constants into the
    compile request body and rejects it past ~32 MB (HTTP 413)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(q, p):
        def body(carry, _):
            s, i = fn(carry, p)
            dep = (s[0] * 1e-30 + i[0].astype(jnp.float32) * 1e-30)
            return carry + dep, ()

        final, _ = jax.lax.scan(body, q, None, length=iters)
        return final

    jax.block_until_ready(run(q0, p))  # compile + warm
    q1 = q0 + 1e-6
    jax.block_until_ready(q1)
    t0 = time.perf_counter()
    jax.block_until_ready(run(q1, p))
    return (time.perf_counter() - t0) / iters * 1000.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, nargs="+", default=[100_000, 1_000_000])
    ap.add_argument("--windows", type=int, default=64)
    ap.add_argument("--dim", type=int, default=192)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--tile-n", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from sdtk_tpu.utils import jaxcache

    jaxcache.enable()
    import jax
    import jax.numpy as jnp

    from sdtk_tpu.ops import topk
    from sdtk_tpu.ops.research import topk_pallas

    rng = np.random.default_rng(0)
    q = jax.device_put(
        rng.standard_normal((args.windows, args.dim)).astype(np.float32)
    )

    out = {
        "benchmark": "topk",
        "windows": args.windows,
        "dim": args.dim,
        "k": args.k,
        "tile_n": args.tile_n,
        "backend": jax.default_backend(),
        "sizes": {},
    }
    for n in args.n:
        p_raw = rng.standard_normal((n, args.dim)).astype(np.float32)
        p = jax.device_put(jnp.asarray(p_raw, jnp.bfloat16))
        pn = p_raw / np.linalg.norm(p_raw, axis=1, keepdims=True)
        p_norm = jax.device_put(jnp.asarray(pn, jnp.bfloat16))

        pallas_fn = lambda qq, pp: topk_pallas.identify_topk_pallas(  # noqa: E731
            qq, pp, k=args.k, tile_n=args.tile_n, interpret=None
        )
        xla_fn = lambda qq, pp: topk.identify_topk_xla(  # noqa: E731
            qq, pp, k=args.k, assume_normalized=True
        )

        # parity before timing: identical survivor sets
        s_pl, i_pl = jax.jit(pallas_fn)(q, p)
        s_xl, i_xl = jax.jit(xla_fn)(q, p_norm)
        overlap = len(
            set(np.asarray(i_pl).tolist()) & set(np.asarray(i_xl).tolist())
        ) / max(args.k, 1)
        score_err = float(
            np.abs(np.sort(np.asarray(s_pl)) - np.sort(np.asarray(s_xl))).max()
        )

        pallas_ms = _bench(pallas_fn, q, p, args.iters)
        xla_ms = _bench(xla_fn, q, p_norm, args.iters)
        out["sizes"][str(n)] = {
            "pallas_ms": round(pallas_ms, 3),
            "xla_ms": round(xla_ms, 3),
            "speedup": round(xla_ms / pallas_ms, 2),
            "survivor_overlap": round(overlap, 4),
            "max_score_diff": round(score_err, 5),
        }

    wins = [v["speedup"] > 1.0 for v in out["sizes"].values()]
    out["pallas_wins_all"] = all(wins)
    # Parity is a HARD gate, not an FYI: an exactness regression on real
    # hardware (where the unit tests' interpret mode never runs) must
    # fail the A/B loudly (r4 ADVICE).  Tolerance covers bf16-matmul
    # rounding between the two decompositions.
    parity_ok = all(
        v["survivor_overlap"] >= 1.0 and v["max_score_diff"] <= 5e-2
        for v in out["sizes"].values()
    )
    out["parity_ok"] = parity_ok
    print(json.dumps(out))
    if not parity_ok:
        print("PARITY FAILURE: pallas/xla survivor sets or scores "
              "diverge beyond bf16 tolerance", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
