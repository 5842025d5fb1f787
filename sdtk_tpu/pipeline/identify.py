"""Enroll / identify / verify engine.

The in-process equivalent of reference ``speaker_detection``'s command layer
(cmd_enroll :754-919, cmd_identify :1031-1133, cmd_verify :1136-1178): same
semantics and output shapes, but the backend call is a device matmul away
instead of a cloud job.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from .. import config
from ..backends import get_backend
from ..backends.base import DEFAULT_THRESHOLD
from ..store import profiles as P
from ..transcripts import extract_segments_as_tuples, load_transcript
from ..utils.hashing import compute_b3sum


def resolve_segments(
    segments: list[tuple[float, float]] | None = None,
    transcript: str | Path | None = None,
    speaker_label: str | None = None,
) -> list[tuple[float, float]] | None:
    """Segment source priority: explicit list > transcript+label > whole file
    (reference cmd_enroll :797-838)."""
    if segments:
        return list(segments)
    if transcript and speaker_label:
        data = load_transcript(transcript)
        return extract_segments_as_tuples(data, speaker_label)
    return None


def enroll(
    speaker_id: str,
    audio_path: str | Path,
    backend_name: str | None = None,
    segments: list[tuple[float, float]] | None = None,
    transcript: str | Path | None = None,
    speaker_label: str | None = None,
    create_missing: bool = False,
    name: str | None = None,
) -> dict[str, Any]:
    """Enroll a speaker from (segments of) a recording; returns the new
    embedding record."""
    speaker_id = P.normalize_speaker_id(speaker_id)
    profile = P.load_speaker(speaker_id)
    if profile is None:
        if not create_missing:
            raise KeyError(f"speaker '{speaker_id}' not found (use create first)")
        profile = P.create_speaker_profile(speaker_id, name or speaker_id)
        P.save_speaker(profile)

    backend = get_backend(backend_name)
    segs = resolve_segments(segments, transcript, speaker_label)
    result = backend.enroll_speaker(audio_path, segs)

    b3 = compute_b3sum(audio_path)
    samples = P.get_samples_by_source_audio(speaker_id, b3)
    rec = P.create_embedding_record(
        source_audio=str(Path(audio_path).resolve()),
        source_audio_b3sum=b3,
        source_segments=[{"start": s, "end": e} for s, e in (segs or [])],
        model_version=result.get("model_version", backend.model_version),
        samples=samples,
        external_id=result.get("external_id"),
        vector=result.get("vector"),
        all_identifiers=result.get("all_identifiers"),
    )
    profile = P.load_speaker(speaker_id)
    P.add_embedding(profile, backend.name, rec)
    P.save_speaker(profile)
    return rec


def identify(
    audio_path: str | Path,
    backend_name: str | None = None,
    threshold: float = DEFAULT_THRESHOLD,
    tags: list[str] | None = None,
    segments: list[tuple[float, float]] | None = None,
) -> list[dict[str, Any]]:
    """Identify speaker(s) in audio against all enrolled profiles.

    Output rows mirror reference cmd_identify (:1115-1127): speaker_id,
    name, score, confidence, trust_level, embedding_id, backend.
    """
    if not Path(audio_path).exists():
        raise FileNotFoundError(f"audio file not found: {audio_path}")
    backend = get_backend(backend_name)
    speakers = P.list_all_speakers()
    if tags:
        speakers = P.filter_speakers_by_tags(speakers, tags, any_tag=False)
    candidates = [s for s in speakers if s.get("embeddings", {}).get(backend.name)]
    if not candidates:
        return []

    results = backend.identify_speaker(audio_path, candidates, threshold, segments)
    if config.debug_enabled():
        # raw backend response dump (reference SPEAKER_DETECTION_DEBUG,
        # speechmatics_backend.py:469-478)
        import json as _json
        import sys as _sys

        print(
            "[SPEAKER_DETECTION_DEBUG] identify "
            f"backend={backend.name} candidates={len(candidates)} "
            f"threshold={threshold}\n"
            + _json.dumps(results, indent=2, default=str),
            file=_sys.stderr,
        )

    by_id = {s["id"]: s for s in candidates}
    out = []
    for r in results:
        profile = by_id.get(r["speaker_id"])
        name = profile["names"]["default"] if profile else r["speaker_id"]
        confidence = r.get("confidence", r.get("similarity", 0.0))

        emb_id = r.get("embedding_id")
        trust = "unknown"
        if profile:
            records = profile.get("embeddings", {}).get(backend.name, [])
            if emb_id:
                for rec in records:
                    if rec.get("id") == emb_id:
                        trust = rec.get("trust_level", "unknown")
                        break
            elif records:
                # No embedding id from backend: best trust across records
                # (reference :1096-1113).
                order = {"high": 3, "medium": 2, "low": 1, "unknown": 0, "invalidated": -1}
                best = max(records, key=lambda e: order.get(e.get("trust_level", "unknown"), 0))
                trust = best.get("trust_level", "unknown")
                emb_id = best.get("id")
        out.append(
            {
                "speaker_id": r["speaker_id"],
                "name": name,
                "score": confidence,
                "confidence": confidence,
                "trust_level": trust,
                "embedding_id": emb_id,
                "backend": backend.name,
            }
        )
    return out


def verify(
    speaker_id: str,
    audio_path: str | Path,
    backend_name: str | None = None,
    threshold: float = DEFAULT_THRESHOLD,
    segments: list[tuple[float, float]] | None = None,
) -> dict[str, Any]:
    """Verify audio against one speaker; {match: bool, confidence: float}."""
    if not Path(audio_path).exists():
        raise FileNotFoundError(f"audio file not found: {audio_path}")
    speaker_id = P.normalize_speaker_id(speaker_id)
    profile = P.load_speaker(speaker_id)
    if profile is None:
        raise KeyError(f"speaker '{speaker_id}' not found")
    backend = get_backend(backend_name)
    if not profile.get("embeddings", {}).get(backend.name):
        raise ValueError(f"speaker '{speaker_id}' has no {backend.name} embeddings")
    return backend.verify_speaker(audio_path, profile, threshold, segments)
