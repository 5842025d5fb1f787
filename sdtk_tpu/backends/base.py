"""Embedding backend protocol + registry.

Mirrors the reference ABC (base.py:22-200): ``enroll_speaker``,
``identify_speaker``, ``verify_speaker``, ``embedding_dim``,
``model_version``, plus the YAML/env-driven registry (base.py:212-304,
``$SPEAKER_BACKENDS_CONFIG``).  The default threshold 0.354 is the
reference's (speaker_detection:1501; base.py:136) — and unlike the
Speechmatics backend, which ignored it (speechmatics_backend.py:376), the
local cosine scorers honor it.

New here: ``LocalEmbeddingBackend`` — any backend that can map a waveform
to a dense vector gets enroll/identify/verify for free, implemented as
batched cosine scoring against the profile matrix (sdtk_tpu.ops.cosine).
"""

from __future__ import annotations

import importlib
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any

import numpy as np

from .. import config
from .audio_profiles import AudioProfile, get_profile

DEFAULT_THRESHOLD = 0.354


class EmbeddingBackend(ABC):
    """Abstract speaker-embedding backend."""

    @property
    @abstractmethod
    def name(self) -> str: ...

    @property
    def requires_api_key(self) -> bool:
        return False

    @property
    def embedding_dim(self) -> int | None:
        """Dimensionality of embeddings (None for API-based backends) —
        reference base.py:38-40."""
        return None

    @property
    def model_version(self) -> str:
        return f"{self.name}-unknown"

    @property
    def audio_profile(self) -> str | "AudioProfile":
        """Profile name to look up in PROFILES, or an AudioProfile
        directly (reference base.py:48-59; default "default")."""
        return "default"

    def get_audio_profile(self) -> "AudioProfile":
        """Resolve :attr:`audio_profile` to an AudioProfile instance
        (reference base.py:61-71)."""
        profile = self.audio_profile
        if isinstance(profile, str):
            return get_profile(profile)
        return profile

    def check_embedding_compatibility(
        self, embedding: dict[str, Any]
    ) -> dict[str, Any]:
        """Is a stored embedding record usable with this backend?

        Same contract as the reference (base.py:73-105): the record's
        model_version must be prefixed by the backend name; incompatible
        records get a re-enroll warning.
        """
        emb_version = embedding.get("model_version", "unknown")
        compatible = emb_version.startswith(f"{self.name}-")
        result: dict[str, Any] = {
            "compatible": compatible,
            "version": emb_version,
            "current": self.model_version,
            "warning": None,
        }
        if not compatible:
            result["warning"] = (
                f"Embedding created with {emb_version} may not work with "
                f"backend {self.name}. Consider re-enrolling."
            )
        return result

    @abstractmethod
    def enroll_speaker(
        self,
        audio_path: str | Path,
        segments: list[tuple[float, float]] | None = None,
    ) -> dict[str, Any]:
        """Extract an enrollment embedding from (segments of) a recording.

        Returns {"vector": np.ndarray | None, "external_id": str | None,
        "model_version": str}.
        """

    @abstractmethod
    def identify_speaker(
        self,
        audio_path: str | Path,
        candidates: list[dict[str, Any]],
        threshold: float = DEFAULT_THRESHOLD,
        segments: list[tuple[float, float]] | None = None,
    ) -> list[dict[str, Any]]:
        """Match audio against candidate profiles.

        Returns a list of {"speaker_id", "confidence", "similarity",
        "embedding_id", "backend"} sorted by confidence, best first.
        """

    def verify_speaker(
        self,
        audio_path: str | Path,
        profile: dict[str, Any],
        threshold: float = DEFAULT_THRESHOLD,
        segments: list[tuple[float, float]] | None = None,
    ) -> dict[str, Any]:
        """Default verify = identify against a single candidate
        (reference base.py:153-180)."""
        results = self.identify_speaker(audio_path, [profile], threshold, segments)
        if results and results[0]["speaker_id"] == profile["id"]:
            return {"match": True, "confidence": results[0]["confidence"]}
        return {"match": False, "confidence": results[0]["confidence"] if results else 0.0}

    def extract_segments_from_transcript(
        self, transcript_data: dict[str, Any], speaker_label: str
    ) -> list[tuple[float, float]]:
        """Convenience passthrough (reference base.py:182-200)."""
        from ..transcripts import extract_segments_as_tuples

        return extract_segments_as_tuples(transcript_data, speaker_label)


class LocalEmbeddingBackend(EmbeddingBackend):
    """Backend with on-device (or at least in-process) embedding extraction.

    Subclasses implement ``embed_waveform``; everything else — enrollment
    pooling, cosine identify/verify against the profile matrix — is shared.
    """

    sample_rate: int = 16000

    # Same-speaker cosine bar for the diarizer's cluster-merge speaker
    # counting (cluster.spectral.merge_count) — a property of the
    # embedding geometry: trained towers put different speakers below the
    # 0.354 verify threshold, so 0.5 between group means is a safe merge
    # bar (0.47 tuned on the synthetic-meeting sweep, see
    # cluster.spectral.MERGE_TAU); spaces with different geometry can
    # override per backend.
    cluster_merge_tau: float = 0.47

    # Scale-free relative merge bar: merge two clusters only when their
    # cross-linkage reaches this fraction of their own within-linkage
    # (cluster.spectral.merge_count ``rel``).  Unlike the absolute tau it
    # transfers across embedding geometries without per-domain tuning —
    # the r2 held-out study showed a fixed tau collapsing speaker counts
    # when the eval family's impostor linkage sat above it.
    cluster_merge_rel: float | None = 0.75

    # Raw-cosine-space same/different-speaker decision boundary for
    # consumers that compare window embeddings directly (streaming
    # assignment): measured per checkpoint (calibrate_threshold.py
    # "raw_eer_threshold") where available; None = caller falls back to
    # its own default.
    raw_decision_threshold: float | None = None

    # Optional cohort matrix (C, D) of unit embeddings from voices
    # unseen in training: when present, identify/verify scores are
    # AS-normalized against it before calibration (ops.cosine.asnorm) —
    # the score becomes relative to the cohort's geometry, which
    # transfers across domains where the absolute cosine scale shifts.
    cohort: np.ndarray | None = None
    asnorm_top_k: int = 64

    # Contract flag for the fused large-N identify route: True asserts the
    # backend's calibrate_score is MONOTONIC (top-k-then-calibrate ==
    # calibrate-then-top-k, so calibrating only the k survivors is exact).
    # A backend with a non-monotone calibration must set this False to
    # force the dense score_matrix path (r4 ADVICE: gating on cohort alone
    # would silently return wrong survivors for such a backend).
    monotonic_calibration: bool = True

    @abstractmethod
    def embed_waveform(self, wav: np.ndarray) -> np.ndarray:
        """float32 mono waveform @ self.sample_rate → (embedding_dim,)."""

    def embed_batch(self, wavs: "list[np.ndarray]") -> np.ndarray:
        """Embed many waveforms → (N, embedding_dim).  Default loops
        embed_waveform; device backends override with true batch packing
        (TpuBackend packs 16 same-length windows per device call, which
        the streaming/eval paths are RTT-bound on)."""
        if not wavs:
            return np.zeros((0, self.embedding_dim), np.float32)
        return np.stack([np.asarray(self.embed_waveform(w)) for w in wavs])

    def score_matrix(self, queries: np.ndarray, profiles: np.ndarray
                     ) -> np.ndarray:
        """(Q, D) queries vs (P, D) profiles → calibrated scores (Q, P):
        raw cosine → AS-norm (when a cohort is attached) → the backend's
        affine calibration into the reference's 0.354 threshold space."""
        from ..ops.cosine import asnorm, score_rows

        raw = score_rows(np.asarray(queries, np.float32),
                         np.asarray(profiles, np.float32))
        cohort = self.cohort
        if cohort is not None and len(cohort) >= 8:
            qc = score_rows(np.asarray(queries, np.float32), cohort)
            pc = score_rows(np.asarray(profiles, np.float32), cohort)
            raw = asnorm(raw, qc, pc, top_k=self.asnorm_top_k)
        return self.calibrate_score(raw)

    def calibrate_score(self, sims: np.ndarray) -> np.ndarray:
        """Map raw similarity scores into the reference's threshold space.

        The reference inherits 0.354 as the identify/verify threshold
        (speaker_detection:1501, base.py:136) from the Speechmatics score
        space; a local embedding space has its own geometry, so backends
        may override this with a measured calibration that places their
        EER operating point at 0.354 (see TpuBackend +
        evals/calibrate_threshold.py).  Default: identity (raw cosine).

        Contract: overrides must be MONOTONIC non-decreasing in the raw
        score (the fused identify route calibrates only top-k survivors,
        which is exact iff order is preserved).  An override that breaks
        monotonicity must also set ``monotonic_calibration = False``.
        """
        return sims

    # -- shared machinery ---------------------------------------------------

    def _load(
        self,
        audio_path: str | Path,
        segments: list[tuple[float, float]] | None,
    ) -> np.ndarray:
        from ..utils import audio as audio_util

        wav, sr = audio_util.load_audio(audio_path, target_sr=self.sample_rate)
        if segments:
            wav = audio_util.slice_segments(wav, sr, segments)
        if len(wav) < self.sample_rate // 2:  # pad ultra-short clips
            wav = np.pad(wav, (0, self.sample_rate // 2 - len(wav)))
        return wav

    def embed_windows(self, wav: np.ndarray, window_s: float = 3.0, hop_s: float = 1.5
                      ) -> np.ndarray:
        """(n_windows, D) per-window embeddings; default loops over
        embed_waveform (device backends batch this)."""
        sr = self.sample_rate
        win, hop = int(window_s * sr), int(hop_s * sr)
        n = len(wav)
        n_win = 1 if n <= win else 1 + (n - win + hop - 1) // hop
        return np.stack(
            [
                np.asarray(self.embed_waveform(wav[i * hop : i * hop + win]))
                for i in range(n_win)
            ]
        )

    def enroll_speaker(self, audio_path, segments=None):
        wav = self._load(audio_path, segments)
        vec = np.asarray(self.embed_waveform(wav), dtype=np.float32)
        return {
            "vector": vec,
            "external_id": None,
            "model_version": self.model_version,
        }

    def identify_speaker(self, audio_path, candidates, threshold=DEFAULT_THRESHOLD,
                         segments=None):
        """Window-level identification: every 3 s window scores against the
        profile matrix, and a speaker matches if any window clears the
        threshold — so multi-speaker recordings surface every present
        speaker (the reference delegated this to the cloud's internal
        diarization, speechmatics_backend.py:361-489)."""
        from ..store.profiles import ProfileMatrix

        pm = ProfileMatrix.build(self.name, speakers=candidates)
        if len(pm) == 0:
            return []
        wav = self._load(audio_path, segments)
        queries = np.asarray(self.embed_windows(wav), dtype=np.float32)  # (W, D)

        import os as _os

        try:
            fused_n = int(_os.environ.get("SDTK_IDENTIFY_TOPK_N", "8192"))
        except ValueError:
            print("Warning: malformed SDTK_IDENTIFY_TOPK_N "
                  f"{_os.environ['SDTK_IDENTIFY_TOPK_N']!r}; using 8192",
                  file=__import__("sys").stderr)
            fused_n = 8192
        if (len(pm) >= fused_n and self.cohort is None
                and self.monotonic_calibration):
            # Large-N regime: fused cosine→window-max→top-k
            # (ops/topk.py) — the (W, N) score matrix never materializes
            # and nothing is sorted.  Only the top 64 profile ROWS
            # (embeddings, not speakers) come back — the serving cap;
            # cf. the reference's 50-identifier API limit,
            # speechmatics_backend.py:425.  k scales with the store's
            # max embeddings-per-speaker so a speaker whose best row
            # would rank below 64 among ROWS still surfaces: with E =
            # max embeddings per speaker, the top 64 distinct speakers'
            # best rows all sit within the top 64*E rows (r4 ADVICE).
            # Calibration is monotonic (gated above) so calibrating
            # only the survivors is exact.
            from ..ops.topk import identify_topk

            per_spk: dict[str, int] = {}
            for row in pm.rows:
                sid = row["speaker_id"]
                per_spk[sid] = per_spk.get(sid, 0) + 1
            k = min(64 * max(per_spk.values(), default=1), len(pm))
            top_s, top_i = identify_topk(queries, pm.matrix, k=k)
            top_s = np.asarray(self.calibrate_score(top_s), dtype=np.float32)
            row_iter = ((pm.rows[int(i)], s) for i, s in zip(top_i, top_s))
        else:
            sims = self.score_matrix(queries, pm.matrix)  # (W, N) calibrated
            best_per_row = sims.max(axis=0)  # (N,) best window per profile
            row_iter = zip(pm.rows, best_per_row)

        best: dict[str, tuple[float, str]] = {}
        for row, sim in row_iter:
            sid = row["speaker_id"]
            if sid not in best or sim > best[sid][0]:
                best[sid] = (float(sim), row["embedding_id"])
        out = [
            {
                "speaker_id": sid,
                "similarity": sim,
                "confidence": sim,
                "embedding_id": emb_id,
                "backend": self.name,
            }
            for sid, (sim, emb_id) in best.items()
            if sim >= threshold
        ]
        out.sort(key=lambda r: r["confidence"], reverse=True)
        return out


# ---------------------------------------------------------------------------
# Registry (reference base.py:212-304)
# ---------------------------------------------------------------------------

_DEFAULT_REGISTRY: dict[str, str] = {
    "tpu": "sdtk_tpu.backends.tpu:TpuBackend",
    "fake": "sdtk_tpu.backends.fake:FakeBackend",
    "speechmatics": "sdtk_tpu.backends.speechmatics:SpeechmaticsBackend",
}

_registry_cache: dict[str, str] | None = None
_instance_cache: dict[str, EmbeddingBackend] = {}


def _load_registry() -> dict[str, str]:
    global _registry_cache
    if _registry_cache is not None:
        return _registry_cache
    registry = dict(_DEFAULT_REGISTRY)
    cfg_path = config.backends_config_path()
    if cfg_path and cfg_path.exists():
        import yaml

        with open(cfg_path) as f:
            data = yaml.safe_load(f) or {}
        for name, spec in (data.get("backends") or {}).items():
            if isinstance(spec, str):
                registry[name] = spec
            elif isinstance(spec, dict) and "class" in spec:
                registry[name] = spec["class"]
    _registry_cache = registry
    return registry


def register_backend(name: str, target: str | EmbeddingBackend) -> None:
    """Programmatic registration (plugin seam for tests/extensions)."""
    if isinstance(target, EmbeddingBackend):
        _instance_cache[name] = target
        _load_registry()[name] = f"<instance:{name}>"
    else:
        _load_registry()[name] = target


def get_backend(name: str | None = None, **kwargs: Any) -> EmbeddingBackend:
    name = name or config.default_backend()
    if name in _instance_cache:
        return _instance_cache[name]
    registry = _load_registry()
    if name not in registry:
        raise ValueError(
            f"Unknown backend '{name}'. Available: {', '.join(sorted(registry))}"
        )
    module_name, _, cls_name = registry[name].partition(":")
    module = importlib.import_module(module_name)
    backend = getattr(module, cls_name)(**kwargs)
    _instance_cache[name] = backend
    return backend


def list_backends() -> list[str]:
    return sorted(_load_registry())


def reload_backends_config() -> None:
    global _registry_cache
    _registry_cache = None
    _instance_cache.clear()
