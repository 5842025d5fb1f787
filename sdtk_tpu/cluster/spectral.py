"""Spectral clustering on device: normalized Laplacian eigendecomposition,
eigengap speaker counting, k-means in the spectral embedding.

The eigensolve runs on-chip via ``jnp.linalg.eigh`` (XLA QR algorithm) —
fine up to a few thousand windows; hour-scale meetings with tens of
thousands of windows use the blocked subspace-iteration path
(``topk_eigvecs_subspace``) which is pure matmul + QR and shards over the
row axis.  k-means is a fixed-iteration ``lax.fori_loop`` — no
data-dependent control flow under jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .affinity import cosine_affinity, refine_affinity


@jax.jit
def normalized_laplacian(aff: jax.Array) -> jax.Array:
    d = jnp.maximum(aff.sum(axis=1), 1e-12)
    d_inv_sqrt = jax.lax.rsqrt(d)
    return jnp.eye(aff.shape[0]) - aff * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]


EIGVAL_TAU = 0.65  # Laplacian eigenvalues below τ count as cluster modes


# Min mean cross-group cosine that still means "same speaker": midway
# between observed different-speaker linkage (≲0.42) and same-speaker
# linkage (≳0.6) for trained towers; on an 8-meetings-per-K synthetic
# sweep (K∈2..5) 0.47 minimized both total DER (0.086 vs 0.089 @0.5,
# 0.102 @0.45) and total count error.
MERGE_TAU = 0.47


# Relative merge rule: merge only when cross-linkage is at least this
# fraction of the groups' own within-linkage.  Scale-free — transfers
# across embedding-space geometries (the r2 held-out study showed any
# FIXED tau is domain-fragile: held-out impostor linkage 0.54 sat above
# the training-tuned 0.47 bar and collapsed speaker counts).
MERGE_REL = 0.75


def merge_count(
    emb_unit: np.ndarray, labels: np.ndarray, tau: float = MERGE_TAU,
    rel: float | None = None,
) -> tuple[int, np.ndarray]:
    """Speaker count by over-cluster-then-merge.

    Cluster at ``max_speakers`` first, then average-linkage-merge groups
    whose mean pairwise cosine exceeds the merge bar; the surviving group
    count is the estimate.  Mean pairwise cosine between two groups of
    unit vectors equals the dot product of their *unnormalized* mean
    vectors, so the whole merge is O(K²·D) on K group means — no N×N
    matrix.

    The merge bar for a pair (i, j) is ``tau`` (absolute), or — when
    ``rel`` is given — ``max(tau, rel · min(within_i, within_j))`` where
    ``within_g`` is group g's own mean pairwise cosine (same-speaker
    groups have between ≈ within so the ratio ≈ 1 and they merge;
    different speakers sit well below).  The relative form is scale-free:
    it needs no per-domain tuning of the linkage scale, which a fixed tau
    bakes in.  Groups too small to measure within-linkage (<2 members)
    fall back to the absolute bar.

    Empirically (synthetic-corpus study, K∈1..5, trained ECAPA-512): the
    eigenvalue-threshold rule (``eigengap_count``) over-counted on 12/20
    meetings (mean |Δk| 0.9) while this rule is exact on 15/20 with all
    misses ±1 — and on the 3-speaker DER benchmark the difference is
    15.0% → ~2% DER, because a phantom 4th cluster splits a real speaker.
    Returns (count, merged_root_label_per_input_window).
    """
    uniq = np.unique(labels)
    means = np.stack([emb_unit[labels == j].mean(axis=0) for j in uniq])
    sizes = np.asarray([(labels == j).sum() for j in uniq], np.float64)
    group_ids = [int(j) for j in uniq]
    remap = {int(j): int(j) for j in uniq}

    def within(idx: int) -> float:
        """Mean pairwise cosine inside group idx, from its mean vector:
        n²·||m||² counts all n² unit-pair dots incl. the n self-pairs."""
        n = sizes[idx]
        if n < 2:
            return float("nan")
        return float((n * n * means[idx] @ means[idx] - n) / (n * (n - 1)))

    while len(means) > 1:
        sims = means @ means.T
        np.fill_diagonal(sims, -np.inf)
        # Per-pair merge bars → pick the pair with the best margin over
        # ITS bar (with relative bars the raw-max pair can fail while
        # another pair passes).
        k = len(means)
        bars = np.full((k, k), tau)
        if rel is not None:
            withins = np.asarray([within(g) for g in range(k)])
            # minimum PROPAGATES NaN: a pair with any unmeasurable side
            # (singleton group) falls back to the absolute bar — boundary
            # windows must not be held to the tight within-linkage of the
            # big group they belong with.
            w_min = np.minimum(withins[:, None], withins[None, :])
            bars = np.where(np.isnan(w_min), tau,
                            np.maximum(tau, rel * w_min))
        margin = sims - bars
        flat = int(np.argmax(margin))
        i, j = divmod(flat, k)
        if margin[i, j] < 0:
            break
        w = sizes[i] + sizes[j]
        means[i] = (sizes[i] * means[i] + sizes[j] * means[j]) / w
        sizes[i] = w
        for src, dst in remap.items():
            if dst == group_ids[j]:
                remap[src] = group_ids[i]
        means = np.delete(means, j, axis=0)
        sizes = np.delete(sizes, j)
        del group_ids[j]
    merged = np.asarray([remap[int(l)] for l in labels])
    return len(means), merged


@partial(jax.jit, static_argnames=("max_speakers",))
def eigengap_count(eigvals: jax.Array, max_speakers: int = 8) -> jax.Array:
    """Estimate #speakers as the number of small Laplacian eigenvalues.

    A k-cluster graph has k eigenvalues near 0 and the rest near 1; with
    realistic within-cluster chaining the "small" ones drift up, which
    breaks the classic argmax-of-gaps rule (the 0→λ₁ gap dominates), so we
    count eigenvalues below a fixed τ instead and break ties toward the
    largest gap under the cap."""
    k = min(max_speakers + 1, eigvals.shape[0])
    below = (eigvals[:k] < EIGVAL_TAU).sum()
    return jnp.clip(below, 1, max_speakers)


def _kmeans_step(centers, x, k):
    d2 = (
        jnp.sum(x * x, axis=1, keepdims=True)
        - 2.0 * x @ centers.T
        + jnp.sum(centers * centers, axis=1)[None, :]
    )
    assign = jnp.argmin(d2, axis=1)
    onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # (N, k)
    counts = jnp.maximum(onehot.sum(axis=0), 1e-6)
    new_centers = (onehot.T @ x) / counts[:, None]
    return new_centers, assign


@partial(jax.jit, static_argnames=("k", "n_iters"))
def kmeans(x: jax.Array, k: int, n_iters: int = 25, seed: int = 0) -> jax.Array:
    """Fixed-iteration k-means; k-means++-lite init (greedy farthest)."""
    n = x.shape[0]
    # Deterministic farthest-point init.
    first = 0
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def init_body(i, carry):
        centers, min_d2 = carry
        d2 = jnp.sum((x - centers[i - 1]) ** 2, axis=1)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2)
        centers = centers.at[i].set(x[nxt])
        return centers, min_d2

    centers, _ = jax.lax.fori_loop(
        1, k, init_body, (centers0, jnp.full((n,), jnp.inf, x.dtype))
    )

    def body(_, carry):
        centers, _ = carry
        return _kmeans_step(centers, x, k)

    centers, assign = jax.lax.fori_loop(
        0, n_iters, body, (centers, jnp.zeros((n,), jnp.int32))
    )
    return assign


@partial(jax.jit, static_argnames=("k", "n_iters", "block"))
def topk_eigvecs_subspace(
    lap: jax.Array, k: int, n_iters: int = 50, block: int = 0
) -> tuple[jax.Array, jax.Array]:
    """Smallest-k eigenpairs of a PSD matrix by subspace iteration on
    (c·I − L): pure matmul + QR, shardable; for N where dense eigh is too
    slow.  Returns (eigvals ascending, eigvecs (N, k))."""
    n = lap.shape[0]
    c = 2.0  # normalized Laplacian spectrum ⊂ [0, 2]
    a = c * jnp.eye(n) - lap

    # Oversampled subspace + squared operator per step accelerate
    # separation of the tightly clustered small eigenvalues.
    m = min(n, k + 8)
    q = jax.random.normal(jax.random.PRNGKey(0), (n, m), lap.dtype)
    q, _ = jnp.linalg.qr(q)

    def body(_, q):
        z = a @ (a @ q)
        q, _ = jnp.linalg.qr(z)
        return q

    q = jax.lax.fori_loop(0, n_iters, body, q)
    # Rayleigh-Ritz on the subspace.
    t = q.T @ (a @ q)
    w, s = jnp.linalg.eigh(t)  # ascending eigvals of A → descending of L
    vecs = q @ s
    lam = c - w  # eigenvalues of L, descending in w order
    order = jnp.argsort(lam)
    return lam[order][:k], (vecs[:, order])[:, :k]


def _spectral_cluster_numpy(
    emb: np.ndarray, n_speakers: int | None, max_speakers: int,
    p_percentile: float, merge_tau: float = MERGE_TAU,
    merge_rel: float | None = None,
) -> tuple[np.ndarray, int]:
    """Host-side mirror of the device pipeline for small window counts.

    A dedicated NumPy path because (a) N varies per recording, so the
    device path would recompile the N×N eigensolve for every new meeting
    length, and (b) at N<1024 the whole solve is sub-second on host —
    cheaper than one device round trip through the tunnel."""
    n = emb.shape[0]
    e = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
    raw = (1.0 + e @ e.T) * 0.5

    a = raw.copy()
    np.fill_diagonal(a, 0.0)
    k = min(n - 1, max(3, int(round((1.0 - p_percentile) * n))))
    kth = np.partition(a, -k, axis=1)[:, -k][:, None]
    a = np.where(a >= kth, a, a * 0.01)
    a = np.maximum(a, a.T)
    np.fill_diagonal(a, a.max(axis=1))

    def lap_of(mat):
        d = np.maximum(mat.sum(axis=1), 1e-12)
        inv = 1.0 / np.sqrt(d)
        return np.eye(n) - mat * inv[:, None] * inv[None, :]

    eigvals, eigvecs = np.linalg.eigh(lap_of(a))
    if n_speakers is None:
        # Over-cluster at the cap, then merge groups that are the same
        # speaker (see merge_count).
        kmax = min(max_speakers, n)
        spec0 = eigvecs[:, :kmax]
        spec0 = spec0 / np.maximum(
            np.linalg.norm(spec0, axis=1, keepdims=True), 1e-12
        )
        n_speakers, _ = merge_count(e, _kmeans_np(spec0, kmax), merge_tau,
                                    rel=merge_rel)
    n_speakers = max(1, min(n_speakers, max_speakers))
    if n_speakers == 1:
        return np.zeros(n, dtype=np.int32), 1

    spec = eigvecs[:, :n_speakers]
    spec = spec / np.maximum(np.linalg.norm(spec, axis=1, keepdims=True), 1e-12)
    return _kmeans_np(spec, n_speakers).astype(np.int32), n_speakers


def _kmeans_np(spec: np.ndarray, k: int, n_iters: int = 25) -> np.ndarray:
    """Farthest-point init + Lloyd iterations (same scheme as the device
    kmeans)."""
    n = len(spec)
    centers = [spec[0]]
    min_d2 = np.full(n, np.inf)
    for _ in range(1, k):
        min_d2 = np.minimum(min_d2, ((spec - centers[-1]) ** 2).sum(axis=1))
        centers.append(spec[int(np.argmax(min_d2))])
    c = np.stack(centers)
    assign = np.zeros(n, dtype=np.int64)
    for _ in range(n_iters):
        d2 = ((spec[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for j in range(k):
            members = spec[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
    return assign


def spectral_cluster(
    emb: np.ndarray | jax.Array,
    n_speakers: int | None = None,
    max_speakers: int = 8,
    p_percentile: float = 0.95,
    use_subspace: bool | None = None,
    force_device: bool = False,
    merge_tau: float = MERGE_TAU,
    merge_rel: float | None = None,
) -> tuple[np.ndarray, int]:
    """Full pipeline: embeddings → labels.

    Returns (labels (N,), n_speakers).  ``n_speakers=None`` auto-estimates
    by over-cluster-then-merge (see merge_count); ``merge_tau`` is the
    absolute same-speaker cosine bar (backend-advertised,
    ``cluster_merge_tau``) and ``merge_rel`` the scale-free relative bar
    (``cluster_merge_rel``; see merge_count).  Small inputs take the
    NumPy path unless ``force_device``.
    """
    n = int(emb.shape[0])
    if n == 0:
        return np.zeros(0, dtype=np.int32), 0
    if n == 1:
        return np.zeros(1, dtype=np.int32), 1
    max_speakers = min(max_speakers, n)

    if not force_device and n < 1024 and isinstance(emb, np.ndarray):
        return _spectral_cluster_numpy(
            np.asarray(emb, dtype=np.float32), n_speakers, max_speakers,
            p_percentile, merge_tau, merge_rel,
        )

    emb = jnp.asarray(emb)

    raw_aff = cosine_affinity(emb)
    aff = refine_affinity(raw_aff, p_percentile=p_percentile)
    lap = normalized_laplacian(aff)

    if use_subspace is None:
        use_subspace = n > 4096
    if use_subspace:
        eigvals, eigvecs = topk_eigvecs_subspace(lap, max_speakers + 1)
    else:
        eigvals, eigvecs = jnp.linalg.eigh(lap)

    if n_speakers is None:
        # Over-cluster at the cap on device, then merge same-speaker groups
        # on host (merge_count works on K group means — no N×N transfer;
        # only the (N,) labels and the (N,D) embeddings, which the caller
        # already holds, cross the link).
        kmax = min(max_speakers, n)
        spec0 = eigvecs[:, :kmax]
        spec0 = spec0 / jnp.maximum(
            jnp.linalg.norm(spec0, axis=1, keepdims=True), 1e-12
        )
        labels0 = np.asarray(kmeans(spec0, kmax))
        e_unit = np.asarray(emb, np.float32)
        e_unit = e_unit / np.maximum(
            np.linalg.norm(e_unit, axis=1, keepdims=True), 1e-12
        )
        n_speakers, _ = merge_count(e_unit, labels0, merge_tau,
                                    rel=merge_rel)
    n_speakers = max(1, min(n_speakers, max_speakers))
    if n_speakers == 1:
        return np.zeros(n, dtype=np.int32), 1

    # Spectral embedding: first k eigenvectors, row-normalized.
    spec = eigvecs[:, :n_speakers]
    spec = spec / jnp.maximum(jnp.linalg.norm(spec, axis=1, keepdims=True), 1e-12)
    labels = kmeans(spec, n_speakers)
    return np.asarray(labels, dtype=np.int32), n_speakers


def cluster_stage(emb: jax.Array, max_speakers: int = 8,
                  use_subspace: bool = False) -> jax.Array:
    """Traceable fixed-k clustering stage: embeddings → labels.

    Pure function of traced values (no jit wrapper) so callers can fuse it
    into a larger program — bench.py composes it with the embed tower into
    ONE dispatch.  ``use_subspace`` swaps the O(N³) dense eigh for the
    matmul-only subspace iteration, which wins for N ≳ 512.
    """
    aff = refine_affinity(cosine_affinity(emb))
    lap = normalized_laplacian(aff)
    if use_subspace:
        _, eigvecs = topk_eigvecs_subspace(lap, max_speakers)
        spec = eigvecs
    else:
        _, eigvecs = jnp.linalg.eigh(lap)
        spec = eigvecs[:, :max_speakers]
    spec = spec / jnp.maximum(jnp.linalg.norm(spec, axis=1, keepdims=True), 1e-12)
    return kmeans(spec, max_speakers)


def bench_cluster_fn(max_speakers: int = 8, use_subspace: bool = False):
    """Jitted fixed-k clustering stage for bench.py (device-only path)."""
    return jax.jit(
        partial(cluster_stage, max_speakers=max_speakers,
                use_subspace=use_subspace)
    )
