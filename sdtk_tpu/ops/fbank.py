"""Log-mel frontend on device: framing + GEMM-NDFT + mel projection.

Replaces the reference's cloud-side feature extraction (the Speechmatics
API call at speechmatics_backend.py:143-168 is where features/embeddings
happened).  TPU-first design:

- Framing is pure reshape/slice/concat on static shapes (no gather, no FFT
  butterflies) — ``k = ceil(win/hop)`` shifted views of a hop-blocked signal.
- The windowed DFT is two matmuls with precomputed cos/sin bases
  (GEMM-NDFT, after MelT — PAPERS.md), which XLA tiles onto the MXU.
- Power → mel projection → log are fused by XLA into the matmul epilogue;
  a Pallas kernel (``fbank_frames_pallas``) keeps every intermediate in
  VMEM for the bandwidth-bound regime.

All functions are shape-static and jit/vmap/pjit-friendly.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import melbank


@dataclass(frozen=True)
class FrontendConfig:
    sample_rate: int = 16000
    win_length: int = 400  # 25 ms
    hop_length: int = 160  # 10 ms
    n_fft: int = 512
    n_mels: int = 80
    window: str = "hann"
    preemphasis: float = 0.97
    log_floor: float = 1e-6
    mean_norm: bool = True  # per-utterance CMN over valid frames
    compute_dtype: str = "bfloat16"
    # SpeechBrain/Kaldi-interop knobs (tools/convert_ecapa.py writes these
    # into a converted checkpoint's .config.json so public pretrained
    # weights see the features they were trained on):
    log_scale: str = "ln"   # "ln" (natural log) | "db" (10·log10, SB/torch)
    mel_fmin: float = 20.0  # SB filterbanks start at 0 Hz
    center: bool = False    # torch.stft center=True framing (pad win//2)

    @property
    def frames_per_second(self) -> float:
        return self.sample_rate / self.hop_length

    def num_frames(self, n_samples: int) -> int:
        if self.center:
            return 1 + n_samples // self.hop_length
        return melbank.num_frames(n_samples, self.win_length, self.hop_length)


def frame_signal(x: jax.Array, win: int, hop: int) -> jax.Array:
    """(B, N) → (B, T, win) framed view built from reshapes and slices.

    T = 1 + (N - win)//hop.  Requires N >= win (pad upstream).
    """
    b, n = x.shape
    t = 1 + (n - win) // hop
    k = -(-win // hop)  # ceil
    pad = (t + k) * hop - n
    xp = jnp.pad(x, ((0, 0), (0, pad)))
    blocks = xp.reshape(b, t + k, hop)
    # frame[t] = concat(blocks[t], ..., blocks[t+k-1])[:win]
    shifted = [blocks[:, i : i + t, :] for i in range(k)]
    frames = jnp.concatenate(shifted, axis=-1)[:, :, :win]
    return frames


def _preemphasize(x: jax.Array, coeff: float) -> jax.Array:
    if coeff <= 0:
        return x
    return x - coeff * jnp.pad(x[:, :-1], ((0, 0), (1, 0)))


def frame_mask(lengths: jax.Array, n_samples: int, cfg: FrontendConfig) -> jax.Array:
    """(B,) sample lengths → (B, T) bool validity mask over frames."""
    t = cfg.num_frames(n_samples)
    if cfg.center:  # frame t is centered at t·hop
        return cfg.hop_length * jnp.arange(t)[None, :] < lengths[:, None]
    ends = cfg.win_length + cfg.hop_length * jnp.arange(t)[None, :]
    return ends <= lengths[:, None]


@partial(jax.jit, static_argnames=("cfg",))
def log_mel(
    x: jax.Array, cfg: FrontendConfig = FrontendConfig(), lengths: jax.Array | None = None
) -> tuple[jax.Array, jax.Array]:
    """Batched log-mel features.

    Args:
        x: (B, N) float32 waveform at cfg.sample_rate, N >= win_length.
        lengths: optional (B,) valid sample counts (ragged batches).

    Returns:
        feats: (B, T, n_mels) float32
        mask:  (B, T) bool — valid frames
    """
    b, n = x.shape
    dt = jnp.dtype(cfg.compute_dtype)
    wr, wi = melbank.windowed_bases(cfg.win_length, cfg.n_fft, cfg.window)
    mel = melbank.mel_filterbank(
        cfg.n_mels, cfg.n_fft, cfg.sample_rate, fmin=cfg.mel_fmin
    )

    x = _preemphasize(x, cfg.preemphasis)
    if cfg.center:
        pad = cfg.win_length // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)))
    frames = frame_signal(x, cfg.win_length, cfg.hop_length).astype(dt)

    re = jnp.einsum("btw,wf->btf", frames, jnp.asarray(wr, dt), preferred_element_type=jnp.float32)
    im = jnp.einsum("btw,wf->btf", frames, jnp.asarray(wi, dt), preferred_element_type=jnp.float32)
    power = re * re + im * im
    melspec = jnp.einsum(
        "btf,fm->btm", power.astype(dt), jnp.asarray(mel, dt), preferred_element_type=jnp.float32
    )
    if cfg.log_scale == "db":  # torch/SB convention: 10·log10(clamp(x, amin))
        feats = 10.0 * jnp.log10(jnp.maximum(melspec, cfg.log_floor))
    else:
        feats = jnp.log(melspec + cfg.log_floor)

    if lengths is None:
        mask = jnp.ones(feats.shape[:2], dtype=bool)
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


# ---------------------------------------------------------------------------
# NumPy reference (for parity tests)
# ---------------------------------------------------------------------------


def log_mel_reference(x: np.ndarray, cfg: FrontendConfig = FrontendConfig()) -> np.ndarray:
    """Straightforward NumPy/FFT implementation used as the test oracle."""
    if cfg.preemphasis > 0:
        x = x - cfg.preemphasis * np.concatenate([[0.0], x[:-1]])
    t = cfg.num_frames(len(x))
    if cfg.center:
        pad = cfg.win_length // 2
        x = np.pad(x, (pad, pad))
    w = melbank.window(cfg.win_length, cfg.window)
    mel = melbank.mel_filterbank(
        cfg.n_mels, cfg.n_fft, cfg.sample_rate, fmin=cfg.mel_fmin
    )
    frames = np.stack(
        [x[i * cfg.hop_length : i * cfg.hop_length + cfg.win_length] for i in range(t)]
    )
    spec = np.fft.rfft(frames * w, n=cfg.n_fft, axis=-1)
    power = np.abs(spec) ** 2
    if cfg.log_scale == "db":
        feats = 10.0 * np.log10(np.maximum(power @ mel, cfg.log_floor))
    else:
        feats = np.log(power @ mel + cfg.log_floor)
    if cfg.mean_norm:
        feats = feats - feats.mean(axis=0, keepdims=True)
    return feats.astype(np.float32)
