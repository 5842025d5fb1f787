"""Sequence parallelism for hour-scale recordings.

The reference handles long audio by cloud offload + host segmentation
(SURVEY.md §5.7); here the time axis itself is sharded across the mesh:

- ``sharded_log_mel``: the waveform is split into contiguous per-device
  chunks; each device needs ``win - hop`` samples of left-neighbor context
  for the frames that straddle the boundary, fetched with a single
  ``ppermute`` halo exchange.  Output frames are exact — identical to the
  single-device frontend.
- ``sharded_affinity_rows``: row-block construction of the N×N affinity
  for clustering — each device holds its row block against the
  all-gathered embedding matrix (the blockwise-affinity design from
  BASELINE.json config 5).

Both use ``shard_map`` over a ``data`` mesh axis and XLA collectives over
ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import fbank as fbank_mod


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        shard_map = jax.shard_map
    except AttributeError:  # older jax
        from jax.experimental.shard_map import shard_map

    return shard_map(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs)


def sharded_log_mel(
    x: jax.Array,
    mesh: Mesh,
    cfg: fbank_mod.FrontendConfig = fbank_mod.FrontendConfig(),
    axis: str = "data",
) -> jax.Array:
    """Time-sharded log-mel of one long mono waveform.

    Args:
        x: (N,) float32, N divisible by (n_devices * hop).
    Returns:
        (T_total, n_mels) float32 — bit-comparable to the unsharded path
        (modulo CMN, which is computed globally via psum).
    """
    n_dev = mesh.shape[axis]
    n = x.shape[0]
    hop, win = cfg.hop_length, cfg.win_length
    assert n % (n_dev * hop) == 0, "pad the signal to n_devices*hop first"
    halo = win - hop  # left context needed for boundary frames

    t_exact = cfg.num_frames(n)

    def local_fn(x_local):
        x_local = x_local.reshape(-1)  # (n_local = n/n_dev,)
        n_local = x_local.shape[0]
        idx = jax.lax.axis_index(axis)

        # Device d owns frames starting at global samples
        # [d*n_local, (d+1)*n_local); the last ones extend up to
        # ``halo`` samples into the RIGHT neighbor's chunk.
        head = x_local[: halo]
        right_head = jax.lax.ppermute(
            head, axis, [(i, (i - 1) % n_dev) for i in range(n_dev)]
        )
        right_head = jnp.where(
            idx == n_dev - 1, jnp.zeros_like(right_head), right_head
        )
        # One sample of LEFT context for the preemphasis x[t-1] term.
        last = x_local[-1:]
        left_last = jax.lax.ppermute(
            last, axis, [(i, (i + 1) % n_dev) for i in range(n_dev)]
        )
        left_last = jnp.where(idx == 0, jnp.zeros_like(left_last), left_last)

        ext = jnp.concatenate([left_last, x_local, right_head])
        pre = ext[1:] - cfg.preemphasis * ext[:-1]  # (n_local + halo,)

        n_frames_local = n_local // hop
        frames = fbank_mod.frame_signal(pre[None, :], win, hop)[0]
        frames = frames[:n_frames_local]  # (n_local/hop, win)

        wr, wi = fbank_mod.melbank.windowed_bases(win, cfg.n_fft, cfg.window)
        mel = fbank_mod.melbank.mel_filterbank(cfg.n_mels, cfg.n_fft, cfg.sample_rate)
        dt = jnp.dtype(cfg.compute_dtype)
        f = frames.astype(dt)
        re = jnp.dot(f, jnp.asarray(wr, dt), preferred_element_type=jnp.float32)
        im = jnp.dot(f, jnp.asarray(wi, dt), preferred_element_type=jnp.float32)
        power = re * re + im * im
        feats = jnp.log(
            jnp.dot(power.astype(dt), jnp.asarray(mel, dt),
                    preferred_element_type=jnp.float32)
            + cfg.log_floor
        )
        if cfg.mean_norm:
            # Global CMN via psum, over VALID frames only (the last
            # device's trailing windows run past the signal end).
            global_f = idx * n_frames_local + jnp.arange(n_frames_local)
            valid = (global_f < t_exact)[:, None].astype(jnp.float32)
            g_sum = jax.lax.psum((feats * valid).sum(axis=0), axis)
            g_cnt = jax.lax.psum(valid.sum(), axis)
            feats = feats - g_sum / g_cnt
        return feats

    fn = _shard_map(local_fn, mesh, in_specs=(P(axis),), out_specs=P(axis))
    feats = fn(x)
    # The unsharded frontend computes T = 1 + (N - win)//hop frames; the
    # sharded one computes N//hop. Trim the trailing frames whose windows
    # run past the signal end.
    return feats[:t_exact]


def pad_for_sharding(x: jax.Array, mesh: Mesh, cfg=None, axis: str = "data") -> jax.Array:
    cfg = cfg or fbank_mod.FrontendConfig()
    q = mesh.shape[axis] * cfg.hop_length
    n = x.shape[0]
    pad = (-n) % q
    return jnp.pad(x, (0, pad)) if pad else x


def sharded_affinity_rows(
    emb: jax.Array, mesh: Mesh, axis: str = "data", p_percentile: float = 0.95
) -> jax.Array:
    """Row-block refined affinity: each device computes its rows against the
    all-gathered matrix; result returned row-sharded (N must divide by the
    axis size — pad rows upstream)."""
    from .cosine import normalize_rows

    n = emb.shape[0]
    n_dev = mesh.shape[axis]
    assert n % n_dev == 0, "pad the embedding rows to the axis size first"

    def local_fn(emb_local):
        full = jax.lax.all_gather(emb_local, axis, tiled=True)  # (N, D)
        e_full = normalize_rows(full.astype(jnp.float32))
        e_loc = normalize_rows(emb_local.astype(jnp.float32))
        rows = (1.0 + e_loc @ e_full.T) * 0.5  # (N/n_dev, N)

        # Zero the diagonal before thresholding (same as refine_affinity).
        n_local = rows.shape[0]
        idx = jax.lax.axis_index(axis)
        cols = jnp.arange(n)[None, :]
        diag = cols == (idx * n_local + jnp.arange(n_local))[:, None]
        rows = jnp.where(diag, 0.0, rows)

        # Row-wise percentile threshold (same rule as affinity.refine_affinity).
        k = min(n - 1, max(3, int(round((1.0 - p_percentile) * n))))
        kth = jax.lax.top_k(rows, k)[0][:, -1:]
        rows = jnp.where(rows >= kth, rows, rows * 0.01)
        return rows

    fn = _shard_map(local_fn, mesh, in_specs=(P(axis, None),), out_specs=P(axis, None))
    rows = fn(emb)
    # Symmetrize + self-affinity like the single-device refinement.
    a = jnp.maximum(rows, rows.T)
    eye = jnp.eye(n, dtype=bool)
    row_max = a.max(axis=1, keepdims=True)
    return jnp.where(eye, row_max, a)
