"""The on-device embedding backend: log-mel frontend + ECAPA-TDNN on TPU.

This is where the reference's network boundary (the Speechmatics batch-job
POST at speechmatics_backend.py:143-168) becomes a device boundary: audio
windows are batched host-side, featurized and embedded on chip, and pooled
into one enrollment/query vector.

Static shapes: audio is cut into fixed 3 s windows (1.5 s hop), padded to a
fixed ``max_windows`` batch, with a window-validity mask — one XLA program
regardless of utterance length.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .. import config
from .base import LocalEmbeddingBackend

WINDOW_SECONDS = 3.0
HOP_SECONDS = 1.5


class TpuBackend(LocalEmbeddingBackend):
    def __init__(
        self,
        model: str = "ecapa",
        channels: int = 512,
        max_windows: int = 16,
        params_path: str | Path | None = None,
        seed: int = 0,
    ):
        self._model_name = model
        self._channels = channels
        self._max_windows = max_windows
        self._seed = seed
        self._params_path = params_path
        self._engine = None  # lazy: JAX import deferred until first use

    @property
    def name(self) -> str:
        return "tpu"

    @property
    def embedding_dim(self) -> int:
        return self.engine.emb_dim

    @property
    def model_version(self) -> str:
        return f"{self._model_name}-c{self._channels}-v1"

    @property
    def engine(self):
        if self._engine is None:
            self._engine = _EmbedEngine(
                self._model_name,
                self._channels,
                self._max_windows,
                self._params_path,
                self._seed,
            )
        return self._engine

    def embed_waveform(self, wav: np.ndarray) -> np.ndarray:
        return self.engine.embed_one(wav)

    def embed_windows(self, wav: np.ndarray, window_s: float = WINDOW_SECONDS,
                      hop_s: float = HOP_SECONDS) -> np.ndarray:
        """Batched on-device window embeddings (one jit call per
        max_windows chunk)."""
        windows, lengths, n_win = self.engine._window(np.asarray(wav, np.float32))
        embs = np.asarray(self.engine._embed_jit(windows, lengths))
        return embs[:n_win]

    def embed_batch(self, wavs: list[np.ndarray]) -> np.ndarray:
        return np.stack([self.engine.embed_one(w) for w in wavs])


class _EmbedEngine:
    """Owns params + the jitted embed program (single static shape)."""

    def __init__(self, model_name, channels, max_windows, params_path, seed):
        self._model_name = model_name
        self._channels = channels
        from ..utils import jaxcache

        jaxcache.enable()
        import jax
        import jax.numpy as jnp

        from ..models import EcapaConfig, EcapaTdnn, XVector, XVectorConfig
        from ..ops import fbank

        self.cfg = fbank.FrontendConfig()
        self.window_len = int(WINDOW_SECONDS * self.cfg.sample_rate)
        self.hop_len = int(HOP_SECONDS * self.cfg.sample_rate)
        self.max_windows = max_windows

        if model_name == "ecapa":
            self.model = EcapaTdnn(EcapaConfig(channels=channels))
            self.emb_dim = self.model.cfg.emb_dim
        elif model_name == "xvector":
            self.model = XVector(XVectorConfig(channels=channels))
            self.emb_dim = self.model.cfg.emb_dim
        elif model_name == "conformer":
            from ..models import Conformer, ConformerConfig

            self.model = Conformer(ConformerConfig(dim=min(channels, 256)))
            self.emb_dim = self.model.cfg.emb_dim
        else:
            raise ValueError(f"unknown model '{model_name}'")

        self.variables = self._init_or_load(params_path, seed)
        # Device-resident params passed as a jit ARGUMENT, not a closure:
        # closing over them would bake 25 MB of weights into the compiled
        # program as constants, so every checkpoint swap (or A/B via
        # $SDTK_MODEL_PATH) would trigger a full recompile.  As an argument
        # the program is weight-agnostic — compile once, serve any
        # checkpoint.
        self._device_variables = jax.device_put(self.variables)
        model = self.model
        frontend_cfg = self.cfg

        def embed_fn(variables, wav_windows, frame_lengths):
            # wav_windows: (W, L); frame_lengths: (W,) valid samples
            feats, mask = fbank.log_mel(wav_windows, frontend_cfg, lengths=frame_lengths)
            emb = model.apply(variables, feats, mask=mask)
            # L2 per window
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
            )
            return emb

        self._embed_jit_raw = jax.jit(embed_fn)
        # call-site signature stays (windows, lengths); the device-resident
        # params are injected here
        self._embed_jit = lambda w, l: self._embed_jit_raw(
            self._device_variables, w, l
        )

    def _params_search_paths(self) -> list[Path]:
        name = f"{type(self.model).__name__.lower()}.msgpack"
        repo_models = Path(__file__).resolve().parent.parent.parent / "models"
        paths = []
        # explicit override first ($SDTK_MODEL_PATH — A/B new checkpoints
        # without touching the bundled default)
        import os

        override = os.environ.get("SDTK_MODEL_PATH")
        if override:
            paths.append(Path(override))
        paths += [
            config.model_dir() / name,
            repo_models / "ecapatdnn-synth256.msgpack"
            if self._model_name == "ecapa" and self._channels == 512
            else repo_models / name,
        ]
        return paths

    def _init_or_load(self, params_path, seed):
        import jax
        import jax.numpy as jnp

        candidates = (
            [Path(params_path)] if params_path else self._params_search_paths()
        )
        dummy = jnp.zeros((1, 64, self.cfg.n_mels))
        variables = self.model.init(jax.random.PRNGKey(seed), dummy)
        for path in candidates:
            if path.exists():
                import flax.serialization

                with open(path, "rb") as f:
                    variables = flax.serialization.from_bytes(variables, f.read())
                self.params_source = str(path)
                return variables
        self.params_source = "random-init"
        return variables

    def save_params(self, path: str | Path | None = None) -> Path:
        import flax.serialization

        from ..utils.ioutil import atomic_write_bytes

        path = Path(path) if path else (
            config.model_dir() / f"{type(self.model).__name__.lower()}.msgpack"
        )
        atomic_write_bytes(path, flax.serialization.to_bytes(self.variables))
        return path

    def _window(self, wav: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
        """Cut into fixed windows; returns (windows (W_max, L), lengths
        (W_max,), n_valid)."""
        L, hop, W = self.window_len, self.hop_len, self.max_windows
        n = len(wav)
        if n <= L:
            n_win = 1
        else:
            n_win = min(W, 1 + (n - L + hop - 1) // hop)
        windows = np.zeros((W, L), dtype=np.float32)
        lengths = np.zeros(W, dtype=np.int32)
        for i in range(n_win):
            start = i * hop
            chunk = wav[start : start + L]
            windows[i, : len(chunk)] = chunk
            lengths[i] = max(len(chunk), self.cfg.win_length)
        return windows, lengths, n_win

    def embed_one(self, wav: np.ndarray) -> np.ndarray:
        windows, lengths, n_win = self._window(np.asarray(wav, dtype=np.float32))
        embs = np.asarray(self._embed_jit(windows, lengths))  # (W, D) unit rows
        pooled = embs[:n_win].mean(axis=0)
        return (pooled / max(np.linalg.norm(pooled), 1e-12)).astype(np.float32)
