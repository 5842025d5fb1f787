"""Trained frame-level voice activity detection.

Replaces the r3 relative-energy gates (window RMS vs loudest window,
pipeline/longform.py + pipeline/streaming.py), which call any LOUD window
"speech" — music, keyboard, hum become speakers (r3 VERDICT missing #3).
The reference outsources VAD to the Speechmatics cloud
(speechmatics_backend.py — diarization happens server-side); a TPU-native
framework owns it.

Two faces, one parameter set:

- :class:`VadNet` — flax module for TRAINING (evals/train_vad.py): two
  dilated 1-D convs + LayerNorm on per-window-CMN'd log-mel, per-frame
  speech logit.  ~23k params.
- :class:`VadScorer` — NumPy inference for SERVING.  The serving call
  sites are host-side gates in front of the embedding program; a jitted
  forward would add a compile + a device round trip per recording for a
  23k-param model, so inference is three shifted-matmul convolutions in
  NumPy (~1 ms per 1.5 s window), reading the same msgpack the trainer
  writes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np


@dataclass(frozen=True)
class VadConfig:
    n_mels: int = 80
    channels: int = 32
    kernel: int = 5
    dilation: int = 2
    # v4 (r5): a third conv at dilation 8 widens the receptive field from
    # ~90 ms to ~410 ms — enough to SEE syllabic rhythm (3-8 Hz energy
    # modulation), the strongest speech-vs-music discriminator, which the
    # v3 net physically could not represent.  Old checkpoints (no conv3
    # in the tree) still load and serve through the v3 graph.
    deep: bool = False
    dilation3: int = 8
    # v4: two channels derived from the log-mel INSIDE the model (same
    # formula in the flax trainer and the NumPy server): mel-spectral
    # flatness (tonal music is peaky, noise flat, speech in between) and
    # spectral flux (speech modulates at syllable rate; sustained chords
    # and drones don't) — the spectral-shape features the r4 music-tier
    # postmortem called for.
    extra_feats: bool = False


_FLATNESS_SCALE = 5.0
_FLUX_SCALE = 2.0


def _derived_channels_np(x: np.ndarray) -> np.ndarray:
    """(T, M) log-mel → (T, 2) [flatness, flux] (NumPy serving mirror)."""
    m = np.mean(x, axis=-1)
    # log(GM/AM) over mel bands, mean-shifted for stability: ≤ 0, near 0
    # for flat (noise-like) frames, very negative for peaky (tonal) ones
    flat = -np.log(
        np.mean(np.exp(x - m[:, None]), axis=-1) + 1e-8) / _FLATNESS_SCALE
    d = np.mean(np.abs(np.diff(x, axis=0)), axis=-1)
    flux = np.concatenate([d[:1], d]) / _FLUX_SCALE
    return np.stack([flat, flux], axis=-1).astype(np.float32)


def _have_flax():
    try:
        import flax.linen  # noqa: F401

        return True
    except ImportError:  # pragma: no cover
        return False


if _have_flax():
    import flax.linen as nn
    import jax.numpy as jnp

    class VadNet(nn.Module):
        """(B, T, n_mels) log-mel (per-window CMN) → (B, T) speech logits."""

        cfg: VadConfig = field(default_factory=VadConfig)

        @nn.compact
        def __call__(self, feats):
            c = self.cfg
            if c.extra_feats:
                m = jnp.mean(feats, axis=-1)
                # log(GM/AM) over mel bands (mean-shifted for stability)
                flat = -jnp.log(
                    jnp.mean(jnp.exp(feats - m[..., None]), axis=-1) + 1e-8
                ) / _FLATNESS_SCALE
                d = jnp.mean(jnp.abs(feats[:, 1:] - feats[:, :-1]), axis=-1)
                flux = jnp.concatenate([d[:, :1], d], axis=1) / _FLUX_SCALE
                feats = jnp.concatenate(
                    [feats, flat[..., None], flux[..., None]], axis=-1)
            x = nn.Conv(c.channels, (c.kernel,), padding="SAME",
                        name="conv1")(feats)
            x = nn.relu(x)
            x = nn.LayerNorm(name="ln1")(x)
            x = nn.Conv(c.channels, (3,), kernel_dilation=(c.dilation,),
                        padding="SAME", name="conv2")(x)
            x = nn.relu(x)
            x = nn.LayerNorm(name="ln2")(x)
            if c.deep:
                x = nn.Conv(c.channels, (3,),
                            kernel_dilation=(c.dilation3,),
                            padding="SAME", name="conv3")(x)
                x = nn.relu(x)
                x = nn.LayerNorm(name="ln3")(x)
            logit = nn.Dense(1, name="out")(x)
            return jnp.squeeze(logit, -1)


def save_params(variables: dict, path: str | Path) -> None:
    import flax.serialization

    from ..utils.ioutil import atomic_write_bytes

    atomic_write_bytes(Path(path), flax.serialization.to_bytes(variables))


def default_checkpoint() -> Path:
    return Path(__file__).resolve().parent.parent.parent / "models" / "vad.msgpack"


class VadScorer:
    """NumPy serving inference for the trained VAD (see module doc)."""

    def __init__(self, params_path: str | Path | None = None,
                 cfg: VadConfig = VadConfig()):
        import flax.serialization

        self.cfg = cfg
        path = Path(params_path) if params_path else default_checkpoint()
        if not path.exists():
            raise FileNotFoundError(
                f"no VAD checkpoint at {path} — train one with "
                f"evals/train_vad.py or fall back to the energy gate")
        # template-free deserialization: msgpack → nested dict of arrays
        with open(path, "rb") as f:
            tree = flax.serialization.msgpack_restore(f.read())
        p = tree["params"]
        self.w1 = np.asarray(p["conv1"]["kernel"], np.float32)  # (k, in, ch)
        self.b1 = np.asarray(p["conv1"]["bias"], np.float32)
        self.g1 = np.asarray(p["ln1"]["scale"], np.float32)
        self.be1 = np.asarray(p["ln1"]["bias"], np.float32)
        self.w2 = np.asarray(p["conv2"]["kernel"], np.float32)
        self.b2 = np.asarray(p["conv2"]["bias"], np.float32)
        self.g2 = np.asarray(p["ln2"]["scale"], np.float32)
        self.be2 = np.asarray(p["ln2"]["bias"], np.float32)
        self.wo = np.asarray(p["out"]["kernel"], np.float32)  # (ch, 1)
        self.bo = np.asarray(p["out"]["bias"], np.float32)
        # v4 autodetection from the tree itself (no sidecar): conv3/ln3
        # present = deep graph; conv1 input width > n_mels = the model
        # was trained with the derived [flatness, flux] channels.
        if "conv3" in p:
            self.w3 = np.asarray(p["conv3"]["kernel"], np.float32)
            self.b3 = np.asarray(p["conv3"]["bias"], np.float32)
            self.g3 = np.asarray(p["ln3"]["scale"], np.float32)
            self.be3 = np.asarray(p["ln3"]["bias"], np.float32)
        else:
            self.w3 = None
        self.extra_feats = self.w1.shape[1] > cfg.n_mels
        self.params_source = str(path)

    @staticmethod
    def _conv_same(x: np.ndarray, w: np.ndarray, b: np.ndarray,
                   dilation: int = 1) -> np.ndarray:
        """(T, Cin) ⊛ (k, Cin, Cout), zero-padded SAME, via shifted matmuls
        (one (T, Cin)·(Cin, Cout) GEMM per tap — k is 3 or 5)."""
        t = x.shape[0]
        k = w.shape[0]
        half = (k - 1) // 2 * dilation
        xp = np.pad(x, ((half, half), (0, 0)))
        out = np.tile(b, (t, 1)).astype(np.float32)
        for tap in range(k):
            out += xp[tap * dilation : tap * dilation + t] @ w[tap]
        return out

    @staticmethod
    def _ln(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
        mu = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-6) * g + b

    def frame_probs(self, feats: np.ndarray) -> np.ndarray:
        """(T, n_mels) per-window-CMN log-mel → (T,) speech probability."""
        x = np.asarray(feats, np.float32)
        if self.extra_feats:
            x = np.concatenate([x, _derived_channels_np(x)], axis=-1)
        x = self._conv_same(x, self.w1, self.b1)
        x = self._ln(np.maximum(x, 0.0), self.g1, self.be1)
        x = self._conv_same(x, self.w2, self.b2, dilation=self.cfg.dilation)
        x = self._ln(np.maximum(x, 0.0), self.g2, self.be2)
        if self.w3 is not None:
            x = self._conv_same(x, self.w3, self.b3,
                                dilation=self.cfg.dilation3)
            x = self._ln(np.maximum(x, 0.0), self.g3, self.be3)
        logit = (x @ self.wo)[:, 0] + self.bo[0]
        return 1.0 / (1.0 + np.exp(-logit))
