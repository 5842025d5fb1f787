"""Fused waveform→log-mel Pallas kernel: framing never touches HBM.

The r3 A/B showed the first Pallas frontend losing to XLA (13.4 ms vs
5.5 ms per batch-1024): it started from MATERIALIZED frames, so the
(B, T, 400) framed copy — 2.5× the waveform, written and re-read in HBM —
dominated.  This kernel starts from the hop-blocked waveform itself:

- HBM traffic is waveform in (1×, double-buffered DMA) + log-mel out.
  Frames exist only in VMEM, built by 4 shifted views of the blocked
  rows (same reshape trick as fbank.frame_signal, but on-chip).
- Preemphasis is folded into the DFT bases instead of running as a
  separate elementwise pass over the signal:
      Σₙ w[n]·b[n]·(x[n] − c·x[n−1])  =  Σₘ x[m]·B'[m]
  where B'[j] = w[j−1]b[j−1]·[j≥1] − c·w[j]b[j]·[j≤win−1] over the
  401-sample extended frame (one sample of left context).  One less
  196 MB read+write.
- Window + DFT + power + mel + log all fuse in VMEM (the r3 kernel
  already did this part; it just paid for frames twice).

Grid is one step per CH-row chunk of the batch; the input DMA for step
i+1 is issued before step i's compute (double buffering), and output
tiles are auto-pipelined by pallas.

Numerics match ops.fbank.log_mel exactly in f32 and to bf16 rounding in
the serving dtype (pinned by tests/test_fbank_wave.py against
log_mel_reference).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import melbank
from ..fbank import FrontendConfig, frame_mask


@lru_cache(maxsize=8)
def preemph_windowed_bases(
    win_length: int, n_fft: int, window_kind: str, coeff: float
) -> tuple[np.ndarray, np.ndarray]:
    """(win+1, n_freqs) DFT bases with window AND preemphasis folded in.

    Row j weights extended-frame sample j (sample −1 of the frame is the
    last sample of the previous hop, giving preemphasis its left
    context; the wrapper pads a zero block so frame 0 sees x[−1] = 0,
    matching fbank._preemphasize)."""
    wr, wi = melbank.windowed_bases(win_length, n_fft, window_kind)

    def fold(wb: np.ndarray) -> np.ndarray:
        out = np.zeros((win_length + 1, wb.shape[1]), np.float32)
        out[1:] += wb
        out[:-1] -= coeff * wb
        return out

    if coeff <= 0:
        z = np.zeros((1, wr.shape[1]), np.float32)
        return (np.vstack([z, wr]), np.vstack([z, wi]))
    return fold(wr), fold(wi)


def _kernel_factory(cfg: FrontendConfig, ch: int, t: int, nb: int,
                    n_freqs: int, bl: int, interpret: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dt = jnp.dtype(cfg.compute_dtype)
    hop, win = cfg.hop_length, cfg.win_length
    klen = win + 1  # extended frame (1 sample of preemphasis context)
    n_shift = -(-(hop - 1 + klen) // hop)  # blocks spanned by a frame

    def kernel(x_ref, wr_ref, wi_ref, mel_ref, out_ref, scratch, sems):
        step = pl.program_id(0)
        n_steps = pl.num_programs(0)

        def dma(slot, idx):
            return pltpu.make_async_copy(
                x_ref.at[pl.ds(idx * ch, ch)], scratch.at[slot],
                sems.at[slot],
            )

        @pl.when(step == 0)
        def _():
            dma(0, 0).start()

        @pl.when(step + 1 < n_steps)
        def _():
            dma((step + 1) % 2, step + 1).start()

        dma(step % 2, step).wait()
        blocks = scratch[step % 2]  # (ch, nb, bl) f32; samples in [:hop]
        # Frame t needs flat samples [hop-1 + t·hop, hop-1 + t·hop + klen),
        # i.e. hop-blocks t..t+n_shift-1.  Mosaic cannot concat slices with
        # mismatched row offsets (and lane-dim slices must be 128-aligned,
        # hence blocks padded hop→bl), so instead of materializing
        # (ch, t, klen) frames the DFT accumulates one matmul per shift
        # against the block-partitioned zero-padded bases:
        # re = Σ_s blocksₛ @ Wr[s·bl:(s+1)·bl].
        n_freqs_ = wr_ref.shape[1]
        re = jnp.zeros((ch * t, n_freqs_), jnp.float32)
        im = jnp.zeros((ch * t, n_freqs_), jnp.float32)
        for s in range(n_shift):
            flat = blocks[:, s : s + t, :].reshape(ch * t, bl).astype(dt)
            re += jnp.dot(flat, wr_ref[s * bl : (s + 1) * bl],
                          preferred_element_type=jnp.float32)
            im += jnp.dot(flat, wi_ref[s * bl : (s + 1) * bl],
                          preferred_element_type=jnp.float32)
        power = re * re + im * im
        melspec = jnp.dot(power.astype(dt), mel_ref[:],
                          preferred_element_type=jnp.float32)
        if cfg.log_scale == "db":
            feats = 10.0 * jnp.log10(jnp.maximum(melspec, cfg.log_floor))
        else:
            feats = jnp.log(melspec + cfg.log_floor)
        out_ref[:] = feats.reshape(ch, t, cfg.n_mels)

    def build(x_blocked, wr, wi, mel, n_chunks):
        return pl.pallas_call(
            kernel,
            interpret=interpret,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # manual DMA
                pl.BlockSpec((n_shift * bl, n_freqs), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_shift * bl, n_freqs), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_freqs, cfg.n_mels), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ch, t, cfg.n_mels), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (n_chunks * ch, t, cfg.n_mels), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, ch, nb, bl), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )(x_blocked, wr, wi, mel)

    return build


@partial(jax.jit, static_argnames=("cfg", "chunk_rows"))
def log_mel_wave(
    x: jax.Array,
    cfg: FrontendConfig = FrontendConfig(),
    lengths: jax.Array | None = None,
    chunk_rows: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in for ops.fbank.log_mel — (B, N) waveform → ((B, T, n_mels)
    f32 feats, (B, T) mask) — with the fused Pallas frontend."""
    b, n = x.shape
    assert n >= cfg.win_length, "pad input to at least one window"
    hop, win = cfg.hop_length, cfg.win_length
    assert not cfg.center, "centered framing not supported by the kernel"
    t = cfg.num_frames(n)

    wr, wi = preemph_windowed_bases(win, cfg.n_fft, cfg.window,
                                    cfg.preemphasis)
    mel = melbank.mel_filterbank(cfg.n_mels, cfg.n_fft, cfg.sample_rate,
                                 fmin=cfg.mel_fmin)
    n_freqs = wr.shape[1]
    dt = jnp.dtype(cfg.compute_dtype)

    # Block-partitioned bases: shift s's slice weights the bl samples of
    # hop-block t+s within frame t's span (frame data starts at flat
    # offset hop-1); rows outside the extended window — including the
    # hop→bl lane padding of every block — are zero, so the padded lanes
    # contribute nothing to the DFT.
    klen_ = win + 1
    bl = 256  # hop (160) padded up to a 128-multiple lane width
    n_shift_ = -(-(hop - 1 + klen_) // hop)
    wr_pad = np.zeros((n_shift_ * bl, n_freqs), np.float32)
    wi_pad = np.zeros((n_shift_ * bl, n_freqs), np.float32)
    for s_ in range(n_shift_):
        for u in range(hop):
            j = s_ * hop + u - (hop - 1)  # extended-frame row index
            if 0 <= j < klen_:
                wr_pad[s_ * bl + u] = wr[j]
                wi_pad[s_ * bl + u] = wi[j]
    wr, wi = wr_pad, wi_pad

    # hop-blocked layout with one zero block of left context (x[-1] = 0,
    # matching fbank._preemphasize) and enough right pad for the last
    # frame's n_shift-block span; the in-kernel block-dim slices must be
    # sublane-aligned (Mosaic tiling of 8), so the frame count rounds up
    # and the pad frames are trimmed after the kernel
    klen = win + 1
    n_shift = -(-(hop - 1 + klen) // hop)
    t_pad = -(-t // 8) * 8
    nb = -(-(t_pad + n_shift) // 8) * 8  # DMA'd block dim: 8-aligned too
    ch = min(chunk_rows, b)
    b_pad = -(-b // ch) * ch
    xp = jnp.zeros((b_pad, nb * hop), x.dtype)
    xp = jax.lax.dynamic_update_slice(xp, x.astype(xp.dtype), (0, hop))
    x_blocked = jnp.pad(xp.reshape(b_pad, nb, hop),
                        ((0, 0), (0, 0), (0, bl - hop)))

    build = _kernel_factory(cfg, ch, t_pad, nb, n_freqs, bl,
                            interpret=jax.default_backend() != "tpu")
    feats = build(x_blocked, jnp.asarray(wr, dt), jnp.asarray(wi, dt),
                  jnp.asarray(mel, dt), b_pad // ch)[:b, :t]

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
