"""Affinity-matrix construction and refinement (device-side).

Standard spectral-diarization recipe (Wang et al. / Park et al.): cosine
affinity of window embeddings, then row-wise refinements — Gaussian-blur-
free variant: symmetrize, p-percentile row thresholding, row-max
normalization.  All ops are jnp and O(N²) matmul/elementwise — MXU/VPU
friendly, shardable over the row axis for pod-scale meetings
(blockwise psum path in sdtk_tpu.parallel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def cosine_affinity(emb: jax.Array) -> jax.Array:
    """(N, D) embeddings → (N, N) cosine affinity in [0, 1]."""
    e = emb / jnp.maximum(jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    a = e @ e.T
    return (1.0 + a) * 0.5  # map [-1,1] → [0,1]


@partial(jax.jit, static_argnames=("p_percentile",))
def refine_affinity(aff: jax.Array, p_percentile: float = 0.95) -> jax.Array:
    """Refinement chain: zero diagonal → row-threshold at the p-th
    percentile (soft: keep top (1-p) fraction per row, scale the rest by
    0.01) → symmetrize → row-max normalize."""
    n = aff.shape[0]
    eye = jnp.eye(n, dtype=bool)
    a = jnp.where(eye, 0.0, aff)
    # per-row percentile threshold; keep ≥3 neighbors so small or
    # single-cluster graphs stay connected
    k = min(n - 1, max(3, int(round((1.0 - p_percentile) * n))))
    kth = jax.lax.top_k(a, k)[0][:, -1:]  # (N,1) k-th largest per row
    a = jnp.where(a >= kth, a, a * 0.01)
    a = jnp.maximum(a, a.T)  # symmetrize
    # restore self-affinity as row max (keeps Laplacian well-behaved)
    row_max = a.max(axis=1, keepdims=True)
    a = jnp.where(eye, row_max, a)
    return a
