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
        model: str | None = None,
        channels: int = 512,
        max_windows: int = 16,
        params_path: str | Path | None = None,
        seed: int = 0,
    ):
        import os as _os

        # $SDTK_BACKEND_TOWER selects the embedding tower family for the
        # registry-constructed backend (ecapa | xvector | conformer) —
        # the A/B knob that makes the secondary towers reachable from
        # every CLI/benchmark without code changes (the checkpoint
        # resolves to models/<tower>.msgpack automatically).
        self._model_name = model or _os.environ.get(
            "SDTK_BACKEND_TOWER", "ecapa")
        self._channels = channels
        self._max_windows = max_windows
        self._seed = seed
        self._params_path = params_path
        self._engine = None  # lazy: JAX import deferred until first use

    @property
    def name(self) -> str:
        return "tpu"

    @property
    def cluster_merge_tau(self) -> float:
        """Same-speaker cosine bar for cluster-merge speaker counting —
        measured per checkpoint by evals/calibrate_threshold.py (midpoint
        of genuine/impostor linkage in the live embedding space) instead
        of the class-level 0.47 which bakes in one geometry."""
        calib = self.engine.calibration
        if calib and "suggested_merge_tau" in calib:
            return float(calib["suggested_merge_tau"])
        return LocalEmbeddingBackend.cluster_merge_tau

    @property
    def raw_decision_threshold(self) -> float | None:
        """Measured same/different-speaker boundary in raw cosine space
        (calibration sidecar ``raw_eer_threshold``) — the streaming
        new-speaker bar derives from this instead of a fixed constant
        (r2 finding: a fixed 0.5 under-spawns speakers on domains whose
        impostor similarities sit above it)."""
        calib = self.engine.calibration
        if calib and "raw_eer_threshold" in calib:
            return float(calib["raw_eer_threshold"])
        if calib and "eer_threshold" in calib and \
                calib.get("score_space", "raw") == "raw":
            return float(calib["eer_threshold"])
        return None

    @property
    def cohort(self) -> "np.ndarray | None":
        """AS-norm cohort matrix from the checkpoint's ``.cohort.npy``
        sidecar (written by evals/calibrate_threshold.py): unit
        embeddings of training-family voices unseen in training."""
        return self.engine.cohort

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

    def calibrate_score(self, sims: np.ndarray) -> np.ndarray:
        """Affine calibration fitted on unseen training-family speakers
        (evals/calibrate_threshold.py): maps the measured EER threshold of
        the raw cosine space onto the reference's 0.354 operating point,
        so `identify --threshold 0.354` (the reference default,
        speaker_detection:1501) keeps its meaning on this backend.  Loaded
        from the checkpoint's ``.calib.json`` sidecar; identity when the
        sidecar is absent."""
        calib = self.engine.calibration
        if calib is None:
            return sims
        mapped = 0.354 + (np.asarray(sims) - calib["eer_threshold"]) * calib["gain"]
        return np.clip(mapped, 0.0, 1.0)

    def embed_windows(self, wav: np.ndarray, window_s: float = WINDOW_SECONDS,
                      hop_s: float = HOP_SECONDS) -> np.ndarray:
        """Window embeddings over the WHOLE recording (one jit call per
        max_windows-sized chunk — same compiled program each time)."""
        return self.engine.embed_all_windows(np.asarray(wav, np.float32))

    def embed_batch(self, wavs: list[np.ndarray]) -> np.ndarray:
        """Batch many waveforms through shape-bucketed window programs.

        Window-sized (≤3 s) same-length waveforms dispatch through the
        smallest (W, L) bucket that fits (engine.embed_rows) — the r4
        streaming probe showed the tunnel transport is the entire cost
        (a (16, 48000) call is 122 ms of which ~122 ms is the 3 MB H2D;
        a (1, 24000) call is 27 ms), so transfer bytes, not device FLOPs,
        decide latency.  Longer/ragged input falls back to per-utterance
        pooling."""
        if not wavs:
            return np.zeros((0, self.engine.emb_dim), np.float32)
        eng = self.engine
        n0 = len(wavs[0])
        if n0 <= eng.window_len and all(len(w) == n0 for w in wavs):
            arr = np.zeros((len(wavs), n0), dtype=np.float32)
            for i, w in enumerate(wavs):
                arr[i] = w
            return eng.embed_rows(arr)
        return np.stack([eng.embed_one(w) for w in wavs])


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

        # Resolve the checkpoint FIRST: a converted pretrained checkpoint
        # (tools/convert_ecapa.py) carries a ``.config.json`` sidecar that
        # pins both the model topology (SpeechBrain-layout switches,
        # channel widths) and the feature frontend it was trained on —
        # those must be known before the graph is built.
        self._ckpt_path = self._resolve_checkpoint(params_path)
        sidecar_cfg = self._load_config_sidecar(self._ckpt_path)

        self.cfg = fbank.FrontendConfig(**sidecar_cfg.get("frontend", {}))
        # Global input-normalization stats from a converted SpeechBrain
        # checkpoint directory (tools/convert_ecapa.py sidecar
        # "input_norm": the recipe's InputNormalization glob_mean/std).
        # Applied after log-mel, before the tower — None for natively
        # trained checkpoints and sentence-norm recipes.
        _in = sidecar_cfg.get("input_norm")
        self._input_norm = (
            (np.asarray(_in["mean"], np.float32),
             np.maximum(np.asarray(_in.get("std", 1.0), np.float32), 1e-8))
            if _in else None
        )
        self.window_len = int(WINDOW_SECONDS * self.cfg.sample_rate)
        self.hop_len = int(HOP_SECONDS * self.cfg.sample_rate)
        self.max_windows = max_windows

        model_over = dict(sidecar_cfg.get("model", {}))
        if model_name == "ecapa":
            if "dilations" in model_over:
                model_over["dilations"] = tuple(model_over["dilations"])
            self.model = EcapaTdnn(
                EcapaConfig(**({"channels": channels} | model_over))
            )
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

        self.variables = self._init_or_load(self._ckpt_path, seed)
        self.calibration = self._load_calibration()
        self.cohort = self._load_cohort()
        # Device-resident params passed as a jit ARGUMENT, not a closure:
        # closing over them would bake 25 MB of weights into the compiled
        # program as constants, so every checkpoint swap (or A/B via
        # $SDTK_MODEL_PATH) would trigger a full recompile.  As an argument
        # the program is weight-agnostic — compile once, serve any
        # checkpoint.
        self._device_variables = jax.device_put(self.variables)
        model = self.model
        frontend_cfg = self.cfg

        input_norm = self._input_norm

        def embed_fn(variables, wav_windows, frame_lengths):
            # wav_windows: (W, L); frame_lengths: (W,) valid samples
            feats, mask = fbank.log_mel(wav_windows, frontend_cfg, lengths=frame_lengths)
            if input_norm is not None:
                feats = (feats - input_norm[0]) / input_norm[1]
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

    _CKPT_SLUG = {"ecapa": "ecapatdnn", "xvector": "xvector",
                  "conformer": "conformer"}

    def _params_search_paths(self) -> list[Path]:
        name = f"{self._CKPT_SLUG[self._model_name]}.msgpack"
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
            # Bundled default: the r3 multi-family + codec-augmented
            # checkpoint (five disjoint generator families, µ-law/
            # resample codec augmentation; held-out EER 1.0-4.1% across
            # tiers, docs/PERFORMANCE.md).  Earlier checkpoints stay in
            # tree for A/B via $SDTK_MODEL_PATH.
            repo_models / "ecapatdnn-fam5tel.msgpack"
            if self._model_name == "ecapa" and self._channels == 512
            else repo_models / name,
        ]
        return paths

    def _resolve_checkpoint(self, params_path) -> "Path | None":
        """First existing checkpoint path, or None (random init)."""
        candidates = (
            [Path(params_path)] if params_path else self._params_search_paths()
        )
        self._searched = candidates
        for path in candidates:
            if path.exists():
                return path
        return None

    @staticmethod
    def _load_config_sidecar(ckpt_path) -> dict:
        """``<checkpoint>.config.json`` — {"model": {...EcapaConfig fields},
        "frontend": {...FrontendConfig fields}} written by
        tools/convert_ecapa.py for converted pretrained weights.  Absent
        for natively trained checkpoints (defaults apply)."""
        if ckpt_path is None:
            return {}
        sidecar = Path(ckpt_path).with_suffix(".config.json")
        if not sidecar.exists():
            return {}
        import json

        try:
            cfg = json.loads(sidecar.read_text())
            if not isinstance(cfg, dict):
                raise ValueError("not a JSON object")
            return cfg
        except (ValueError, OSError) as e:
            import sys

            print(f"Warning: ignoring malformed config sidecar {sidecar}: "
                  f"{e}", file=sys.stderr)
            return {}

    def _init_or_load(self, ckpt_path, seed):
        import jax
        import jax.numpy as jnp

        dummy = jnp.zeros((1, 64, self.cfg.n_mels))
        variables = self.model.init(jax.random.PRNGKey(seed), dummy)
        if ckpt_path is not None:
            import flax.serialization

            with open(ckpt_path, "rb") as f:
                variables = flax.serialization.from_bytes(variables, f.read())
            self.params_source = str(ckpt_path)
            return variables
        self.params_source = "random-init"
        import sys

        print(
            f"Warning: no trained checkpoint found for "
            f"{type(self.model).__name__} (searched: "
            f"{', '.join(str(p) for p in self._searched)}); using RANDOM "
            f"weights — identify/verify scores will be meaningless. Set "
            f"$SDTK_MODEL_PATH or place a checkpoint in "
            f"{config.model_dir()}.",
            file=sys.stderr,
        )
        return variables

    def _load_calibration(self) -> dict | None:
        """Score calibration sidecar: ``<checkpoint>.calib.json`` with
        {"eer_threshold": t*, "gain": g} measured by
        evals/calibrate_threshold.py on training-family speakers unseen in
        training (NOT the held-out eval family — that stays untouched as
        the measurement)."""
        if self.params_source == "random-init":
            return None
        sidecar = Path(self.params_source).with_suffix(".calib.json")
        if not sidecar.exists():
            return None
        import json

        try:
            calib = json.loads(sidecar.read_text())
            float(calib["eer_threshold"]), float(calib["gain"])
            return calib
        except (ValueError, KeyError, TypeError) as e:
            import sys

            print(f"Warning: ignoring malformed calibration sidecar "
                  f"{sidecar}: {e}", file=sys.stderr)
            return None

    def _load_cohort(self) -> "np.ndarray | None":
        """AS-norm cohort sidecar ``<checkpoint>.cohort.npy`` — (C, D)
        unit embeddings of unseen training-family voices (written by
        evals/calibrate_threshold.py --cohort-size).  None when absent
        (scoring then stays plain calibrated cosine)."""
        if self.params_source == "random-init":
            return None
        sidecar = Path(self.params_source).with_suffix(".cohort.npy")
        if not sidecar.exists():
            return None
        try:
            cohort = np.load(sidecar)
            if cohort.ndim != 2 or cohort.shape[1] != self.emb_dim:
                raise ValueError(f"bad cohort shape {cohort.shape}")
            return np.asarray(cohort, np.float32)
        except (ValueError, OSError) as e:
            import sys

            print(f"Warning: ignoring malformed cohort sidecar {sidecar}: "
                  f"{e}", file=sys.stderr)
            return None

    def save_params(self, path: str | Path | None = None) -> Path:
        import flax.serialization

        from ..utils.ioutil import atomic_write_bytes

        path = Path(path) if path else (
            config.model_dir() / f"{type(self.model).__name__.lower()}.msgpack"
        )
        atomic_write_bytes(path, flax.serialization.to_bytes(self.variables))
        return path

    def _window_all(self, wav: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Cut the WHOLE recording into fixed windows (no cap); returns
        (windows (n, L), lengths (n,)).  The reference's cloud call
        consumed the full file (speechmatics_backend.py:361-489); the cap
        lives only in the per-call batch shape, not in coverage."""
        L, hop = self.window_len, self.hop_len
        n = len(wav)
        n_win = 1 if n <= L else 1 + (n - L + hop - 1) // hop
        windows = np.zeros((n_win, L), dtype=np.float32)
        lengths = np.zeros(n_win, dtype=np.int32)
        for i in range(n_win):
            start = i * hop
            chunk = wav[start : start + L]
            windows[i, : len(chunk)] = chunk
            lengths[i] = max(len(chunk), self.cfg.win_length)
        return windows, lengths

    def _window(self, wav: np.ndarray) -> tuple[np.ndarray, np.ndarray, int]:
        """First max_windows-sized padded batch (legacy single-call shape);
        full-coverage callers use embed_all_windows."""
        W = self.max_windows
        all_w, all_l = self._window_all(wav)
        n_win = min(W, all_w.shape[0])
        windows = np.zeros((W, all_w.shape[1]), dtype=np.float32)
        lengths = np.zeros(W, dtype=np.int32)
        windows[:n_win] = all_w[:n_win]
        lengths[:n_win] = all_l[:n_win]
        return windows, lengths, n_win

    def embed_all_windows(self, wav: np.ndarray) -> np.ndarray:
        """Embed EVERY window of a recording: loop the single static-shape
        jit program over max_windows-sized chunks (compile once, any
        length).  Returns (n_windows, D) unit rows."""
        all_w, all_l = self._window_all(np.asarray(wav, dtype=np.float32))
        W = self.max_windows
        out = []
        for start in range(0, all_w.shape[0], W):
            chunk_w = all_w[start : start + W]
            chunk_l = all_l[start : start + W]
            n = chunk_w.shape[0]
            if n < W:  # pad the tail chunk to the static batch shape
                chunk_w = np.concatenate(
                    [chunk_w, np.zeros((W - n, all_w.shape[1]), np.float32)]
                )
                chunk_l = np.concatenate([chunk_l, np.zeros(W - n, np.int32)])
            embs = np.asarray(self._embed_jit(chunk_w, chunk_l))
            out.append(embs[:n])
        return np.concatenate(out, axis=0)

    def embed_one(self, wav: np.ndarray) -> np.ndarray:
        embs = self.embed_all_windows(wav)  # (n, D) unit rows — full file
        pooled = embs.mean(axis=0)
        return (pooled / max(np.linalg.norm(pooled), 1e-12)).astype(np.float32)

    # Batch-shape buckets: every distinct (W, L) jit shape compiles once
    # (disk-cached via utils.jaxcache), and the tunnel transport — not
    # device compute — is the per-call cost, so calls dispatch through
    # the smallest bucket that fits.  Measured on the real chip (r4):
    # (16, 48000) = 122 ms/call (3 MB H2D through the ~24 MB/s tunnel),
    # (1, 24000) = 27 ms, (4, 24000) = 37 ms; async dispatch does NOT
    # overlap the transport (pipelined == blocking in the probe), so
    # fewer-bytes-per-call is the only lever this environment offers.
    _W_BUCKETS = (1, 4, 16)

    def embed_rows(self, rows: np.ndarray, lengths: np.ndarray | None = None
                   ) -> np.ndarray:
        """(N, n) same-length rows (n ≤ window_len samples) → (N, D) via
        the smallest compiled (W, L) shape bucket."""
        n_rows, n = rows.shape
        if n_rows == 0:
            return np.zeros((0, self.emb_dim), np.float32)
        half = self.window_len // 2
        L = half if n <= half else self.window_len
        if lengths is None:
            lengths = np.full(n_rows, max(n, self.cfg.win_length), np.int32)
        out = []
        i = 0
        while i < n_rows:
            rem = n_rows - i
            W = next(w for w in self._W_BUCKETS if w >= min(rem, self._W_BUCKETS[-1]))
            take = min(rem, W)
            chunk = np.zeros((W, L), dtype=np.float32)
            chunk[:take, :n] = rows[i : i + take]
            lens = np.zeros(W, np.int32)
            lens[:take] = lengths[i : i + take]
            out.append(np.asarray(self._embed_jit(chunk, lens))[:take])
            i += take
        return np.concatenate(out, axis=0)
