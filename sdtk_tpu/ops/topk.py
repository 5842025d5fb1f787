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

``identify_topk_pallas`` streams bf16 profile blocks HBM→VMEM once,
normalizes in-flight, fuses the window-max epilogue into the GEMM block,
and keeps a per-block top-k so the score matrix never exists in HBM and
nothing is ever sorted.  **Measured outcome (r4, real v5e): the kernel
LOSES** — 2.3 ms vs XLA 1.27 ms at (W=64, N=10⁵) and 13.6 vs 3.0 ms at
N=10⁶; at W=512/N=10⁶ XLA needs only 3.9 ms, which proves XLA fuses the
window-max into the GEMM consumer and never materializes the (W, N)
matrix either — the fused-traffic thesis this kernel was built on does
not hold, and the kernel's own per-block top-64 selection (unrolled
max+mask passes, ~28 µs/block of serial VPU latency the DMA cannot
hide) is its bottleneck.  The serving dispatcher therefore routes to
``identify_topk_xla`` (still the big win vs the old path: the host
never sees a (W, N) matrix); the kernel stays in-tree and tested as
the seam for shapes where selection can be restructured.  A/B:
``evals/benchmark_topk.py`` (dedupe-proof chained timing).

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

# The kernel keeps the per-block top-k with the SAME k as the global
# query, which makes the global result exact: every one of the global
# top-k rows lives in some block, where it ranks ≤ k among that block's
# rows, so it survives into the merge.  k is capped at 128 (one output
# lane row per block); larger k falls back to the XLA path.
MAX_KERNEL_K = 128


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


def identify_topk_pallas(
    queries: jax.Array,
    profiles: jax.Array,
    k: int = 64,
    tile_n: int = 2048,
    interpret: bool | None = None,
):
    """Fused scoring kernel.  queries (W, D) f32 (unnormalized), profiles
    (N, D) bf16/f32 (unnormalized — normalization is fused, it rides the
    VPU while the MXU runs).  Returns (scores (k,), indices (k,)) of the
    top-k profiles by best-window cosine — exact (see MAX_KERNEL_K note).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    w, d = queries.shape
    n = profiles.shape[0]
    if k > MAX_KERNEL_K:
        return identify_topk_xla(queries, profiles, k)
    block_k = min(k, MAX_KERNEL_K)
    w_pad = max(-(-w // 8) * 8, 8)
    n_pad = -(-n // tile_n) * tile_n
    nblocks = n_pad // tile_n
    if w_pad != w:
        queries = jnp.pad(queries, ((0, w_pad - w), (0, 0)))
    if n_pad != n:
        profiles = jnp.pad(profiles, ((0, n_pad - n), (0, 0)))

    def kernel(q_ref, p_ref, s_ref, i_ref):
        j = pl.program_id(0)
        qv = q_ref[:].astype(jnp.float32)
        qn = qv * jax.lax.rsqrt(jnp.sum(qv * qv, axis=1, keepdims=True) + 1e-24)
        # padded query rows: zero vectors → zero scores; mask them out of
        # the window-max (real cosines can be negative)
        row = jax.lax.broadcasted_iota(jnp.int32, (w_pad, 1), 0)
        qn = jnp.where(row < w, qn, 0.0)
        pv = p_ref[:].astype(jnp.float32)
        pn = pv * jax.lax.rsqrt(jnp.sum(pv * pv, axis=1, keepdims=True) + 1e-24)
        s = jnp.dot(qn, pn.T, preferred_element_type=jnp.float32)  # (W, tile_n)
        s = jnp.where(row < w, s, -jnp.inf)
        m = jnp.max(s, axis=0, keepdims=True)  # (1, tile_n) best window/profile
        # profile-padding rows out of the running
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile_n), 1)
        gidx = lane + j * tile_n
        m = jnp.where(gidx < n, m, -jnp.inf)
        # block top-block_k, unrolled max+mask passes (no sort anywhere)
        out_lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        out_s = jnp.full((1, 128), -jnp.inf, jnp.float32)
        out_i = jnp.zeros((1, 128), jnp.int32)
        for t in range(block_k):
            vmax = jnp.max(m)
            amax = jnp.min(jnp.where(m == vmax, gidx, jnp.iinfo(jnp.int32).max))
            out_s = jnp.where(out_lane == t, vmax, out_s)
            out_i = jnp.where(out_lane == t, amax, out_i)
            m = jnp.where(gidx == amax, -jnp.inf, m)
        # Mosaic requires (8, 128)-divisible output blocks: broadcast the
        # (1, 128) result over the 8 sublanes; the merge reads row 0.
        s_ref[0] = jnp.broadcast_to(out_s, (8, 128))
        i_ref[0] = jnp.broadcast_to(out_i, (8, 128))

    cand_s, cand_i = pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((w_pad, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 8, 128), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nblocks, 8, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(queries, profiles)

    # final merge over nblocks·block_k survivors (tiny vs N)
    flat_s = cand_s[:, 0, :block_k].reshape(-1)
    flat_i = cand_i[:, 0, :block_k].reshape(-1)
    k_eff = min(k, n)
    top_s, pos = jax.lax.top_k(flat_s, min(k_eff, flat_s.shape[0]))
    top_i = jnp.take(flat_i, pos)
    if top_s.shape[0] < k_eff:  # fewer survivors than requested (tiny N)
        pad = k_eff - top_s.shape[0]
        top_s = jnp.pad(top_s, (0, pad), constant_values=-jnp.inf)
        top_i = jnp.pad(top_i, (0, pad))
    return top_s, top_i


_jit_pallas = jax.jit(
    partial(identify_topk_pallas, interpret=None),
    static_argnames=("k", "tile_n"),
)


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
        s, i = _jit_pallas(queries, profiles, k=k)
    else:
        s, i = identify_topk_xla(queries, profiles, k=k)
    return np.asarray(s), np.asarray(i)
