"""Fused large-N identification scoring: cosine → max-over-windows → top-K.

The production identify path (reference ``speaker_detection`` cmd_identify
:1031-1133, replaced here by ``backends/base.py identify_speaker``) scores
every query window against the whole enrolled-profile matrix, keeps each
profile's best window, and returns the profiles above threshold.  At
catalog scale (N ≥ 10⁵ enrolled vectors) the XLA decomposition of that —
GEMM to a (W, N) score matrix in HBM, reduce, then a sort-based
``lax.top_k`` over N — pays for two full passes over a score matrix that
is *larger than the profile matrix itself* plus an O(N log N) sort, when
the serving question only needs the top handful of profiles.

A fused Pallas kernel was built for this (streams bf16 profile blocks
HBM→VMEM once, normalizes in-flight, fuses the window-max epilogue,
per-block top-k, nothing sorted) and **measurably LOST at every serving
shape** — XLA fuses the window-max into the GEMM consumer and never
materializes the (W, N) matrix either.  The kernel now lives behind the
research boundary (:mod:`.research.topk_pallas`, measured numbers in its
docstring and docs/PERFORMANCE.md); this serving module carries only the
XLA decomposition — still the big win vs the old path, because the HOST
never sees a (W, N) matrix.  ``SDTK_TOPK_PALLAS=1`` re-routes the
dispatcher through the kernel for re-measurement on new hardware
(A/B: ``evals/benchmark_topk.py``).

The per-query-count cap this imposes (top ``k_candidates`` profiles per
identify) mirrors the reference's own serving cap — Speechmatics accepts
at most 50 identifiers per speaker per identification job
(speechmatics_backend.py:425); the default cap here is 64 profiles.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

def _masked_window_max(qn: jax.Array, pn: jax.Array, n_valid_rows: int) -> jax.Array:
    """(W, D)·(N, D)ᵀ → per-profile best-window score (N,), with profile
    rows ≥ n_valid_rows forced to -inf (padding)."""
    s = jnp.dot(qn, pn.T, preferred_element_type=jnp.float32)  # (W, N)
    m = jnp.max(s, axis=0)
    idx = jnp.arange(m.shape[0])
    return jnp.where(idx < n_valid_rows, m, -jnp.inf)


def _normalize(x: jax.Array) -> jax.Array:
    x = x.astype(jnp.float32)
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-24)


@partial(jax.jit, static_argnames=("k", "assume_normalized"))
def identify_topk_xla(
    queries: jax.Array,
    profiles: jax.Array,
    k: int = 64,
    assume_normalized: bool = False,
):
    """Reference XLA decomposition.  ``assume_normalized=True`` is the
    best case for XLA — PRE-NORMALIZED bf16 profiles (the enrollment
    store can always afford that), so XLA pays no normalization pass:
    only the GEMM, the (W, N) materialization, the reduce, and the
    sort-based top_k.  The A/B harness times that configuration."""
    qn = _normalize(queries)
    p = profiles.astype(jnp.float32)
    if not assume_normalized:
        p = _normalize(p)
    m = _masked_window_max(qn, p, profiles.shape[0])
    return jax.lax.top_k(m, min(k, m.shape[0]))


def identify_topk(
    queries: np.ndarray, profiles: np.ndarray | jax.Array, k: int = 64
) -> tuple[np.ndarray, np.ndarray]:
    """Host-facing dispatcher for the identify hot path: (W, D) query
    windows vs the (N, D) profile matrix → top-k (scores, profile row
    indices) by best-window cosine.  Uses the fused kernel on TPU, the
    XLA decomposition elsewhere."""
    queries = jnp.asarray(queries, jnp.float32)
    profiles = (
        profiles if isinstance(profiles, jax.Array) else jnp.asarray(profiles)
    )
    # Bucket the window count to the next power of two (min 8) by
    # duplicating the first row — max-over-windows is invariant to
    # duplicates, and W varies with audio length, so without bucketing
    # every distinct recording length would trigger a fresh jit compile
    # (painful on CPU deployments where the old NumPy path had no such
    # cost — r4 ADVICE).  log2 buckets bound the compile count.
    w = queries.shape[0]
    w_b = max(8, 1 << (w - 1).bit_length())
    if w_b != w:
        queries = jnp.concatenate(
            [queries,
             jnp.broadcast_to(queries[:1], (w_b - w, queries.shape[1]))]
        )
    # XLA decomposition on every backend — the measured winner on TPU at
    # all tested (W, N); see the module docstring.  SDTK_TOPK_PALLAS=1
    # flips to the kernel for re-measurement on new hardware/shapes.
    import os

    if os.environ.get("SDTK_TOPK_PALLAS") == "1" and \
            jax.default_backend() == "tpu":
        from .research.topk_pallas import jit_pallas

        s, i = jit_pallas(queries, profiles, k=k)
    else:
        s, i = identify_topk_xla(queries, profiles, k=k)
    return np.asarray(s), np.asarray(i)
