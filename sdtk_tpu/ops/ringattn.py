"""Sequence-parallel (ring/blockwise) attention + the time-sharded
conformer forward.

SURVEY.md §2.3 (ring-attention row): once an attention embedder exists
(models/conformer.py), hour-scale sequences need the time axis sharded
across the mesh — the MXU work stays local, and only K/V blocks rotate
around the ring over ICI.  Same halo/psum discipline as ops/longform.py:

- :func:`ring_attention` — full (non-causal) attention over one long
  sequence whose time axis is sharded on a mesh axis.  K/V blocks travel
  the ring via ``ppermute`` while each device keeps a streaming-softmax
  accumulator (running max / denominator / numerator), so no device ever
  materializes the (T, T) score matrix.
- :func:`conformer_sp_embed` — the whole Conformer tower (models/
  conformer.py) evaluated time-sharded with the SAME parameter tree as
  the single-device module: pointwise pieces run locally, the depthwise
  conv exchanges (kernel-1)/2 halo frames with both neighbors, attention
  uses the ring, and attentive-stats pooling reduces with ``psum`` /
  ``pmax``.  Inference-mode (BatchNorm running stats), f32 math —
  masked-parity with ``Conformer.apply`` is covered by
  tests/test_parallel.py.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        shard_map = jax.shard_map
    except AttributeError:  # older jax
        from jax.experimental.shard_map import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def _ring_attention_local(q, k, v, mask, axis: str, n_dev: int):
    """Inside shard_map: q/k/v (T_loc, H, Dh) f32, mask (T_loc,) bool.
    Returns (T_loc, H, Dh).  Non-causal, so ring order is irrelevant."""
    t_loc, h, dh = q.shape
    q = q / jnp.sqrt(jnp.asarray(dh, q.dtype))
    m = jnp.full((t_loc, h), _NEG, q.dtype)  # running max
    l = jnp.zeros((t_loc, h), q.dtype)  # running denominator
    o = jnp.zeros((t_loc, h, dh), q.dtype)  # running numerator

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    k_cur, v_cur, mask_cur = k, v, mask
    for _ in range(n_dev):
        logits = jnp.einsum("thd,shd->ths", q, k_cur)
        logits = jnp.where(mask_cur[None, None, :], logits, _NEG)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        scale = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        p = jnp.where(mask_cur[None, None, :], p, 0.0)
        l = l * scale + p.sum(axis=-1)
        o = o * scale[..., None] + jnp.einsum("ths,shd->thd", p, v_cur)
        m = m_new
        k_cur = jax.lax.ppermute(k_cur, axis, perm)
        v_cur = jax.lax.ppermute(v_cur, axis, perm)
        mask_cur = jax.lax.ppermute(mask_cur, axis, perm)
    return o / jnp.maximum(l, 1e-30)[..., None]


def ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array,
    mesh: Mesh, axis: str = "data",
) -> jax.Array:
    """Standalone ring attention: q/k/v (T, H, Dh) with T sharded on
    ``axis``; returns (T, H, Dh) time-sharded the same way."""
    n_dev = mesh.shape[axis]

    def local(q_l, k_l, v_l, m_l):
        return _ring_attention_local(q_l, k_l, v_l, m_l, axis, n_dev)

    fn = _shard_map(
        local, mesh,
        in_specs=(P(axis, None, None), P(axis, None, None),
                  P(axis, None, None), P(axis)),
        out_specs=P(axis, None, None),
    )
    return fn(q, k, v, mask)


def _halo_extend(x, halo: int, axis_name: str, n_dev: int):
    """(T_loc, C) → (T_loc + 2*halo, C): left tail of the left neighbor +
    local + right head of the right neighbor; sequence edges get zeros
    (matches SAME zero padding)."""
    idx = jax.lax.axis_index(axis_name)
    left = jax.lax.ppermute(
        x[-halo:], axis_name, [(i, (i + 1) % n_dev) for i in range(n_dev)]
    )
    left = jnp.where(idx == 0, jnp.zeros_like(left), left)
    right = jax.lax.ppermute(
        x[:halo], axis_name, [(i, (i - 1) % n_dev) for i in range(n_dev)]
    )
    right = jnp.where(idx == n_dev - 1, jnp.zeros_like(right), right)
    return jnp.concatenate([left, x, right], axis=0)


def _ln(x, p):
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-6) * p["scale"] + p["bias"]


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


def _ff(x, p):
    h = _ln(x, p["LayerNorm_0"])
    h = _dense(h, p["Dense_0"])
    h = jax.nn.swish(h)
    return _dense(h, p["Dense_1"])


def conformer_sp_embed(
    variables: dict,
    cfg,
    feats: jax.Array,
    mask: jax.Array,
    mesh: Mesh,
    axis: str = "data",
) -> jax.Array:
    """Time-sharded Conformer forward: feats (T, n_mels) and mask (T,)
    sharded on ``axis``; returns the (emb_dim,) embedding, replicated.

    Uses the exact parameter tree of models/conformer.Conformer (inference
    mode, f32 math).  Cites the block layout at conformer.py:103-147.
    """
    n_dev = mesh.shape[axis]
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), variables["params"]
    )
    stats = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.float32), variables.get("batch_stats", {})
    )
    n_blocks = cfg.n_blocks
    kernel = cfg.conv_kernel
    halo = (kernel - 1) // 2

    def local_fn(params, stats, f_loc, m_loc):
        mf = m_loc[:, None].astype(jnp.float32)
        x = _dense(f_loc.astype(jnp.float32), params["input_proj"]) * mf

        for i in range(n_blocks):
            bp = params[f"block{i}"]
            x = x + 0.5 * _ff(x, bp["ff1"])

            # -- MHSA with ring attention -------------------------------
            ap = bp["mhsa"]["MultiHeadDotProductAttention_0"]
            h = _ln(x, bp["mhsa"]["LayerNorm_0"])
            # flax projection kernels: (C, H, Dh)
            q = jnp.einsum("tc,chd->thd", h, ap["query"]["kernel"]) + ap["query"]["bias"]
            k = jnp.einsum("tc,chd->thd", h, ap["key"]["kernel"]) + ap["key"]["bias"]
            v = jnp.einsum("tc,chd->thd", h, ap["value"]["kernel"]) + ap["value"]["bias"]
            attn = _ring_attention_local(q, k, v, m_loc, axis, n_dev)
            h = jnp.einsum("thd,hdc->tc", attn, ap["out"]["kernel"]) + ap["out"]["bias"]
            x = x + h

            # -- conv module with halo exchange -------------------------
            cp = bp["conv"]
            h = _ln(x, cp["LayerNorm_0"])
            h = _dense(h, cp["Dense_0"])
            a, b = jnp.split(h, 2, axis=-1)
            h = a * jax.nn.sigmoid(b)
            h = h * mf
            ext = _halo_extend(h, halo, axis, n_dev)  # (T_loc + 2*halo, C)
            dw = cp["depthwise"]["kernel"]  # (K, 1, C)
            out = jax.lax.conv_general_dilated(
                ext[None], dw, window_strides=(1,), padding="VALID",
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=ext.shape[-1],
            )[0] + cp["depthwise"]["bias"]
            bn = cp["BatchNorm_0"]
            bs = stats[f"block{i}"]["conv"]["BatchNorm_0"]
            out = (out - bs["mean"]) / jnp.sqrt(bs["var"] + 1e-5)
            out = out * bn["scale"] + bn["bias"]
            out = jax.nn.swish(out)
            out = _dense(out, cp["Dense_1"]) * mf
            x = x + out

            x = x + 0.5 * _ff(x, bp["ff2"])
            x = _ln(x, bp["final_norm"]) * mf

        # -- attentive stats pooling with psum reductions ---------------
        cnt = jnp.maximum(jax.lax.psum(mf.sum(), axis), 1.0)
        gsum = jax.lax.psum((x * mf).sum(axis=0), axis)
        mean = gsum / cnt
        gsq = jax.lax.psum((x * x * mf).sum(axis=0), axis)
        std = jnp.sqrt(jnp.maximum(gsq / cnt - mean * mean, 1e-5))

        t_loc = x.shape[0]
        ctx = jnp.concatenate(
            [x, jnp.broadcast_to(mean, (t_loc, x.shape[1])),
             jnp.broadcast_to(std, (t_loc, x.shape[1]))], axis=-1,
        )
        asp = params["asp"]
        a1 = jnp.tanh(ctx @ asp["att1"]["kernel"][0] + asp["att1"]["bias"])
        a2 = a1 @ asp["att2"]["kernel"][0] + asp["att2"]["bias"]
        a2 = jnp.where(m_loc[:, None], a2, -1e9)
        # global per-channel softmax over time: pmax then psum
        g_max = jax.lax.pmax(a2.max(axis=0), axis)
        e = jnp.exp(a2 - g_max) * mf
        denom = jnp.maximum(jax.lax.psum(e.sum(axis=0), axis), 1e-30)
        w = e / denom
        mu = jax.lax.psum((w * x).sum(axis=0), axis)
        var = jax.lax.psum((w * x * x).sum(axis=0), axis) - mu * mu
        sg = jnp.sqrt(jnp.maximum(var, 1e-5))
        pooled = jnp.concatenate([mu, sg], axis=-1)
        return _dense(pooled, params["embedding"])

    fn = _shard_map(
        local_fn, mesh,
        in_specs=(P(), P(), P(axis, None), P(axis)),
        out_specs=P(),
    )
    return fn(params, stats, feats, mask)
