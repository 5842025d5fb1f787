"""Pallas fused log-mel from MATERIALIZED frames (research kernel).

The first frontend kernel attempt: window·DFT·power·mel·log fused with
VMEM-resident intermediates — the (tile, n_freqs) power spectrum never
leaves VMEM; HBM traffic is frames in + log-mel out only.  MEASURED
RETIREMENT (r4, real v5e, chained timing): 13.9 ms vs XLA's 6.8 ms per
batch-1024 — both paths are compute-bound at these shapes (N=257
frequencies under-fills the MXU lanes) so the bandwidth savings this
kernel banks on never bind.  See :mod:`. __init__` for the boundary
rationale; the successor that also fuses framing is :mod:`.fbank_wave`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .. import melbank
from ..fbank import FrontendConfig, _preemphasize, frame_mask, frame_signal


def fbank_frames_pallas(
    frames: jax.Array, cfg: FrontendConfig = FrontendConfig(), tile: int = 256
) -> jax.Array:
    """(M, win) frames → (M, n_mels) log-mel, fully fused in one kernel."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, win = frames.shape
    assert win == cfg.win_length
    wr, wi = melbank.windowed_bases(cfg.win_length, cfg.n_fft, cfg.window)
    mel = melbank.mel_filterbank(cfg.n_mels, cfg.n_fft, cfg.sample_rate)
    n_freqs = wr.shape[1]
    dt = jnp.dtype(cfg.compute_dtype)

    # Pad the frame count to a tile multiple (static shapes for the grid).
    m_pad = -(-m // tile) * tile
    if m_pad != m:
        frames = jnp.pad(frames, ((0, m_pad - m), (0, 0)))

    def kernel(frames_ref, wr_ref, wi_ref, mel_ref, out_ref):
        f = frames_ref[:].astype(dt)
        re = jnp.dot(f, wr_ref[:], preferred_element_type=jnp.float32)
        im = jnp.dot(f, wi_ref[:], preferred_element_type=jnp.float32)
        power = re * re + im * im
        melspec = jnp.dot(power.astype(dt), mel_ref[:], preferred_element_type=jnp.float32)
        out_ref[:] = jnp.log(melspec + cfg.log_floor)

    out = pl.pallas_call(
        kernel,
        interpret=jax.default_backend() != "tpu",
        grid=(m_pad // tile,),
        in_specs=[
            pl.BlockSpec((tile, win), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, n_freqs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win, n_freqs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs, cfg.n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, cfg.n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, cfg.n_mels), jnp.float32),
    )(
        frames,
        jnp.asarray(wr, dt),
        jnp.asarray(wi, dt),
        jnp.asarray(mel, dt),
    )
    return out[:m]


@partial(jax.jit, static_argnames=("cfg", "use_pallas"))
def log_mel_fused(
    x: jax.Array,
    cfg: FrontendConfig = FrontendConfig(),
    lengths: jax.Array | None = None,
    use_pallas: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """log_mel with the Pallas fused feature kernel on the hot path."""
    b, n = x.shape
    x = _preemphasize(x, cfg.preemphasis)
    frames = frame_signal(x, cfg.win_length, cfg.hop_length)
    t = frames.shape[1]
    flat = frames.reshape(b * t, cfg.win_length)
    feats = fbank_frames_pallas(flat, cfg).reshape(b, t, cfg.n_mels)

    if lengths is None:
        mask = jnp.ones((b, t), dtype=bool)
    else:
        mask = frame_mask(lengths, n, cfg)
    if cfg.mean_norm:
        m = mask[..., None].astype(feats.dtype)
        denom = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
        mean = (feats * m).sum(axis=1, keepdims=True) / denom
        feats = (feats - mean) * m
    else:
        feats = feats * mask[..., None].astype(feats.dtype)
    return feats, mask
