"""Fused identify-scoring Pallas kernel (research — measured retirement).

cosine → max-over-windows → per-block top-k with the (W, N) score matrix
never materialized and nothing sorted.  MEASURED LOSS vs the XLA
decomposition at every tested (W, N) — see :mod:`. __init__` and
docs/PERFORMANCE.md; the diagnosed bottleneck is the per-block top-64
selection (unrolled max+mask passes, ~28 µs/block of serial VPU latency
no DMA can hide).  Re-measure on new hardware with
``SDTK_TOPK_PALLAS=1 python evals/benchmark_topk.py``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..topk import identify_topk_xla

# The kernel keeps the per-block top-k with the SAME k as the global
# query, which makes the global result exact: every one of the global
# top-k rows lives in some block, where it ranks ≤ k among that block's
# rows, so it survives into the merge.  k is capped at 128 (one output
# lane row per block); larger k falls back to the XLA path.
MAX_KERNEL_K = 128


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


jit_pallas = jax.jit(
    partial(identify_topk_pallas, interpret=None),
    static_argnames=("k", "tile_n"),
)
