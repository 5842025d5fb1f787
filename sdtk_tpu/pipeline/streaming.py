"""Streaming diarization with incremental clustering + online enrollment.

BASELINE.json config 5: "streaming diarization with incremental clustering
+ online profile enrollment".  The reference has no streaming mode at all.

Design: audio arrives in chunks; completed 1.5 s windows are embedded
(batched on device) and greedily assigned to running speaker centroids —
a new centroid is spawned when the best similarity falls below
``new_speaker_threshold``.  Centroids are EMA-updated, so they track
within-meeting voice drift.  ``finalize()`` optionally re-clusters all
window embeddings offline (higher quality) and can enroll discovered
speakers into the profile DB.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np

from ..cluster.der import Segment, labels_to_segments


@dataclass
class StreamingConfig:
    sample_rate: int = 16000
    window_seconds: float = 1.5
    hop_seconds: float = 0.75
    # Raw-cosine bar below which a window spawns a NEW speaker.  None
    # (default) resolves from the backend's measured calibration
    # (raw_decision_threshold, the same/different-speaker EER boundary
    # in the live embedding space); the 0.5 fallback only applies to
    # uncalibrated backends.  A fixed absolute bar was the r2 fragility:
    # on a shifted domain whose impostor similarities sit above it, live
    # feed() under-spawns speakers even though finalize() reclusters
    # correctly.
    new_speaker_threshold: float | None = None
    centroid_momentum: float = 0.9
    max_speakers: int = 16
    vad_threshold_db: float = -40.0
    # "energy" (window RMS vs running peak, zero cost — the default) |
    # "trained" (models/vad.py frame classifier, ~1 ms/window host
    # inference, rejects music/keyboard/hum the energy gate spawns
    # speakers for) | "auto" (trained when the checkpoint exists).
    # Unlike the offline Diarizer, streaming cannot degrade to the null
    # gate when the model disclaims the whole input (the future isn't
    # known yet), so a live feed silently dropping out-of-domain audio
    # is the worse failure — trained stays OPT-IN here.  The trained
    # gate is causal: a weak window only counts as speech when the
    # previous window was strong (one-sided hysteresis).
    vad: str = "energy"
    embed_chunk: int = 16  # windows per device call
    _FALLBACK_THRESHOLD = 0.5


@dataclass
class _State:
    buffer: np.ndarray = field(default_factory=lambda: np.zeros(0, np.float32))
    consumed_windows: int = 0
    centroids: list[np.ndarray] = field(default_factory=list)
    counts: list[int] = field(default_factory=list)
    window_labels: list[int] = field(default_factory=list)
    window_starts: list[float] = field(default_factory=list)
    window_embs: list[np.ndarray] = field(default_factory=list)
    peak_rms: float = 1e-9


class OnlineDiarizer:
    def __init__(self, backend_name: str | None = None, cfg: StreamingConfig = StreamingConfig()):
        from ..backends import get_backend

        self.cfg = cfg
        self.backend = get_backend(backend_name)
        self.state = _State()
        self._vad_scorer = None
        self._prev_strong = False
        if cfg.vad in ("trained", "auto"):
            try:
                from ..models.vad import VadScorer

                self._vad_scorer = VadScorer()
            except FileNotFoundError:
                if cfg.vad == "trained":
                    raise
        if cfg.new_speaker_threshold is None:
            measured = getattr(self.backend, "raw_decision_threshold", None)
            self.new_speaker_threshold = (
                float(measured) if measured is not None
                else StreamingConfig._FALLBACK_THRESHOLD
            )
        else:
            self.new_speaker_threshold = float(cfg.new_speaker_threshold)

    # -- feeding ------------------------------------------------------------

    def feed(self, chunk: np.ndarray) -> list[dict[str, Any]]:
        """Append audio; returns assignments for windows completed by this
        chunk: [{start, end, speaker, similarity}]."""
        st = self.state
        cfg = self.cfg
        st.buffer = np.concatenate([st.buffer, np.asarray(chunk, np.float32)])

        win = int(cfg.window_seconds * cfg.sample_rate)
        hop = int(cfg.hop_seconds * cfg.sample_rate)
        n_total = 0 if len(st.buffer) < win else 1 + (len(st.buffer) - win) // hop
        new_events: list[dict[str, Any]] = []

        pending = list(range(st.consumed_windows, n_total))
        for batch_start in range(0, len(pending), cfg.embed_chunk):
            batch = pending[batch_start : batch_start + cfg.embed_chunk]
            wavs, starts, keep = [], [], []
            for w_idx in batch:
                a = w_idx * hop
                seg = st.buffer[a : a + win]
                if self._vad_scorer is not None:
                    from ..ops.fbank import FrontendConfig, log_mel_reference

                    seg_p = seg if len(seg) == win else np.pad(
                        seg, (0, win - len(seg)))
                    p = self._vad_scorer.frame_probs(
                        log_mel_reference(seg_p.astype(np.float32),
                                          FrontendConfig()))
                    frac = float(np.mean(p > 0.5))
                    is_speech = frac >= 0.5 or (
                        frac >= 0.25 and self._prev_strong)
                    self._prev_strong = frac >= 0.5
                    if not is_speech:
                        continue  # non-speech window (music/noise/silence)
                else:
                    rms = float(np.sqrt(
                        np.mean(seg.astype(np.float64) ** 2) + 1e-12))
                    st.peak_rms = max(st.peak_rms, rms)
                    db = 20.0 * np.log10(rms / st.peak_rms + 1e-12)
                    if db <= cfg.vad_threshold_db:
                        continue  # silence window
                wavs.append(seg)
                starts.append(a / cfg.sample_rate)
            if not wavs:
                continue
            embs = self._embed(np.stack(wavs))
            for emb, start in zip(embs, starts):
                label, sim = self._assign(emb)
                st.window_labels.append(label)
                st.window_starts.append(start)
                st.window_embs.append(emb)
                new_events.append(
                    {
                        "start": start,
                        "end": start + cfg.window_seconds,
                        "speaker": f"S{label + 1}",
                        "similarity": round(sim, 3),
                    }
                )
        st.consumed_windows = n_total
        return new_events

    def _embed(self, wavs: np.ndarray) -> np.ndarray:
        # embed_batch packs all windows of this feed() call into as few
        # device round trips as the backend supports (TpuBackend: 16
        # same-length windows per call) — the per-window embed_waveform
        # loop this replaces paid one tunnel RTT per window and dominated
        # the measured streaming RTF.
        embs = np.asarray(self.backend.embed_batch(list(wavs)))
        return embs / np.maximum(np.linalg.norm(embs, axis=1, keepdims=True), 1e-12)

    def _assign(self, emb: np.ndarray) -> tuple[int, float]:
        st, cfg = self.state, self.cfg
        if st.centroids:
            cents = np.stack(st.centroids)
            cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
            sims = cents @ emb
            best = int(np.argmax(sims))
            if sims[best] >= self.new_speaker_threshold or len(st.centroids) >= cfg.max_speakers:
                m = cfg.centroid_momentum
                st.centroids[best] = m * st.centroids[best] + (1 - m) * emb
                st.counts[best] += 1
                return best, float(sims[best])
        st.centroids.append(emb.copy())
        st.counts.append(1)
        return len(st.centroids) - 1, 1.0

    # -- results ------------------------------------------------------------

    def segments(self) -> list[Segment]:
        st = self.state
        if not st.window_labels:
            return []
        order = np.argsort(st.window_starts)
        labels = np.asarray(st.window_labels)[order]
        starts = np.asarray(st.window_starts)[order]
        if len(st.window_embs) == len(st.window_labels):
            # sub-window boundary localization (cluster/boundary.py):
            # one interpolated-similarity cut per label change instead of
            # overlapping full-window claims — the same collar-0.25 lever
            # as the offline path (measured in benchmark_streaming --der)
            from ..cluster.boundary import refine_segments

            emb = np.stack(st.window_embs)[order]
            raw = refine_segments(
                emb, labels, starts, self.cfg.window_seconds, prefix="SPK")
        else:  # pragma: no cover — embs always tracked; safety net
            raw = labels_to_segments(labels, starts, self.cfg.window_seconds)
        return [
            (s, e, l.replace("SPK0", "S").replace("SPK", "S"))
            for s, e, l in raw
        ]

    def finalize(self, recluster: bool = True) -> dict[str, Any]:
        """Offline refinement pass over all buffered window embeddings."""
        st = self.state
        if not st.window_embs:
            return {"segments": [], "n_speakers": 0}
        if recluster and len(st.window_embs) >= 4:
            from ..cluster.resegment import resegment
            from ..cluster.turns import turn_cluster

            emb = np.stack(st.window_embs)
            labels, k = turn_cluster(
                emb, np.asarray(st.window_starts),
                hop_s=self.cfg.hop_seconds,
                tau=getattr(self.backend, "cluster_merge_tau", 0.47),
                rel=getattr(self.backend, "cluster_merge_rel", None) or 0.75,
                max_speakers=self.cfg.max_speakers,
            )
            if k > 1:
                labels = resegment(emb, labels, k)
            st.window_labels = labels.tolist()
            st.centroids = [
                emb[labels == j].mean(axis=0) for j in range(k)
            ]
            st.counts = [int((labels == j).sum()) for j in range(k)]
        return {
            "segments": self.segments(),
            "n_speakers": len(st.centroids),
            "window_labels": list(st.window_labels),
        }

    def enroll_discovered(
        self, audio_b3sum: str = "", min_windows: int = 3, prefix: str = "unknown"
    ) -> list[str]:
        """Online profile enrollment: persist each discovered speaker's
        centroid as a profile embedding (create-if-missing)."""
        from ..store import profiles as P

        created = []
        for j, (centroid, count) in enumerate(zip(self.state.centroids, self.state.counts)):
            if count < min_windows:
                continue
            sid = f"{prefix}-{j + 1:02d}"
            if P.load_speaker(sid) is None:
                P.save_speaker(P.create_speaker_profile(sid, sid.title()))
            vec = centroid / max(np.linalg.norm(centroid), 1e-12)
            rec = P.create_embedding_record(
                source_audio="<stream>",
                source_audio_b3sum=audio_b3sum or "0" * 32,
                source_segments=[],
                model_version=self.backend.model_version,
                vector=vec.astype(np.float32),
            )
            profile = P.load_speaker(sid)
            P.add_embedding(profile, self.backend.name, rec)
            P.save_speaker(profile)
            created.append(sid)
        return created
