"""Health metrics + recommendations — the observability subsystem.

Port of reference ``speaker-report`` (stats :344-412, recommendations
:415-462): status buckets, trust histogram, coverage, low-confidence and
stale lists, actionable recommendations.  One deliberate fix: the
reference reads profiles as ``db/*.yaml`` although they are written as
``db/*.json`` (speaker-report:283 vs speaker_detection:157) — here both
sides go through the same store module, so the mismatch cannot happen.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Any

from ..store import assignments as assignment_store
from ..store import catalog as catalog_store
from ..store import profiles as profile_store
from ..store import samples as sample_store

# Confidence-word → numeric score map (reference :392).
CONFIDENCE_SCORE = {"confirmed": 100, "high": 90, "medium": 70, "low": 40, "unassigned": 0}
LOW_CONFIDENCE_CUTOFF = 70
STALE_DAYS = 30
MIN_REVIEWED_SAMPLES = 3


@dataclass
class SystemStats:
    total_recordings: int = 0
    status_counts: dict[str, int] = field(default_factory=dict)
    total_speakers: int = 0
    trust_histogram: dict[str, int] = field(default_factory=dict)
    total_assignments: int = 0
    assigned_labels: int = 0
    unassigned_labels: int = 0
    low_confidence: list[dict[str, Any]] = field(default_factory=list)
    stale_recordings: list[dict[str, Any]] = field(default_factory=list)
    speakers_needing_samples: list[dict[str, Any]] = field(default_factory=list)
    contexts: dict[str, dict[str, Any]] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "total_recordings": self.total_recordings,
            "status_counts": self.status_counts,
            "total_speakers": self.total_speakers,
            "trust_histogram": self.trust_histogram,
            "total_assignments": self.total_assignments,
            "assigned_labels": self.assigned_labels,
            "unassigned_labels": self.unassigned_labels,
            "low_confidence": self.low_confidence,
            "stale_recordings": self.stale_recordings,
            "speakers_needing_samples": self.speakers_needing_samples,
            "contexts": self.contexts,
        }


def _parse_ts(ts: str | None) -> datetime | None:
    if not ts:
        return None
    try:
        return datetime.fromisoformat(ts.replace("Z", "+00:00"))
    except ValueError:
        return None


def compute_system_stats(
    now: datetime | None = None,
    stale_days: int = STALE_DAYS,
    confidence_threshold: int = LOW_CONFIDENCE_CUTOFF,
) -> SystemStats:
    now = now or datetime.now(timezone.utc)
    stats = SystemStats()

    entries = catalog_store.list_entries()
    stats.total_recordings = len(entries)
    for entry in entries:
        status = catalog_store.compute_status(entry)
        stats.status_counts[status] = stats.status_counts.get(status, 0) + 1
        updated = _parse_ts(entry.get("updated_at"))
        if (
            status not in ("complete",)
            and updated
            and now - updated > timedelta(days=stale_days)
        ):
            stats.stale_recordings.append(
                {
                    "b3sum": entry.get("recording", {}).get("b3sum"),
                    "path": entry.get("recording", {}).get("path"),
                    "status": status,
                    "updated_at": entry.get("updated_at"),
                }
            )
        ctx = entry.get("context", {}).get("name")
        if ctx:
            c = stats.contexts.setdefault(ctx, {"recordings": 0, "statuses": {}})
            c["recordings"] += 1
            c["statuses"][status] = c["statuses"].get(status, 0) + 1

    speakers = profile_store.list_all_speakers()
    stats.total_speakers = len(speakers)
    for sp in speakers:
        reviewed = 0
        for meta in sample_store.get_speaker_samples(sp["id"]):
            if meta.get("review", {}).get("status") == "reviewed":
                reviewed += 1
        if reviewed < MIN_REVIEWED_SAMPLES:
            stats.speakers_needing_samples.append(
                {"speaker_id": sp["id"], "reviewed_samples": reviewed}
            )
        for records in sp.get("embeddings", {}).values():
            for rec in records:
                trust = rec.get("trust_level", "unknown")
                stats.trust_histogram[trust] = stats.trust_histogram.get(trust, 0) + 1

    for a in assignment_store.list_assignments():
        stats.total_assignments += 1
        for label, m in (a.get("mappings") or {}).items():
            if m.get("speaker_id"):
                stats.assigned_labels += 1
            else:
                stats.unassigned_labels += 1
            conf = m.get("confidence", "unassigned")
            if CONFIDENCE_SCORE.get(conf, 0) < confidence_threshold:
                stats.low_confidence.append(
                    {
                        "recording_b3sum": a.get("recording_b3sum"),
                        "label": label,
                        "speaker_id": m.get("speaker_id"),
                        "confidence": conf,
                        "score": m.get("score", 0),
                    }
                )
    return stats


def generate_recommendations(stats: SystemStats) -> list[str]:
    """Actionable next steps (reference :415-462)."""
    recs: list[str] = []
    unprocessed = stats.status_counts.get("unprocessed", 0)
    if unprocessed:
        recs.append(
            f"{unprocessed} recording(s) unprocessed — run 'speaker-process run' to transcribe and assign"
        )
    transcribed = stats.status_counts.get("transcribed", 0)
    if transcribed:
        recs.append(
            f"{transcribed} recording(s) transcribed but unassigned — run 'speaker-assign assign'"
        )
    assigned = stats.status_counts.get("assigned", 0)
    if assigned:
        recs.append(
            f"{assigned} recording(s) awaiting review — run 'speaker-review' to confirm assignments"
        )
    if stats.unassigned_labels:
        recs.append(
            f"{stats.unassigned_labels} speaker label(s) unassigned — enroll more speakers or lower the threshold"
        )
    invalidated = stats.trust_histogram.get("invalidated", 0)
    if invalidated:
        recs.append(
            f"{invalidated} embedding(s) invalidated by rejected samples — re-enroll affected speakers"
        )
    if stats.speakers_needing_samples:
        ids = ", ".join(s["speaker_id"] for s in stats.speakers_needing_samples[:5])
        recs.append(
            f"{len(stats.speakers_needing_samples)} speaker(s) have <{MIN_REVIEWED_SAMPLES} "
            f"reviewed samples ({ids}) — extract and review more samples"
        )
    if stats.low_confidence:
        recs.append(
            f"{len(stats.low_confidence)} low-confidence assignment(s) — review or add signals (LLM/context)"
        )
    if stats.stale_recordings:
        recs.append(
            f"{len(stats.stale_recordings)} recording(s) stale (> {STALE_DAYS} days without progress)"
        )
    if not recs:
        recs.append("All recordings processed and reviewed — system healthy")
    return recs


# ---------------------------------------------------------------------------
# Formatters (text mode; JSON callers use .to_dict())
# ---------------------------------------------------------------------------


def format_status(stats: SystemStats) -> str:
    lines = ["=== Speaker System Status ===", ""]
    lines.append(f"Recordings: {stats.total_recordings}")
    for status in ("unprocessed", "transcribed", "assigned", "reviewed", "complete"):
        n = stats.status_counts.get(status, 0)
        if n:
            lines.append(f"  {status:<12} {n}")
    lines.append(f"Speakers: {stats.total_speakers}")
    if stats.trust_histogram:
        lines.append("Embedding trust:")
        for level in ("high", "medium", "low", "invalidated", "unknown"):
            n = stats.trust_histogram.get(level, 0)
            if n:
                lines.append(f"  {level:<12} {n}")
    lines.append(
        f"Assignments: {stats.total_assignments} recording(s), "
        f"{stats.assigned_labels} assigned / {stats.unassigned_labels} unassigned label(s)"
    )
    lines.append("")
    lines.append("Recommendations:")
    for rec in generate_recommendations(stats):
        lines.append(f"  - {rec}")
    return "\n".join(lines)


def format_coverage(stats: SystemStats) -> str:
    total = stats.total_recordings or 1
    done = stats.status_counts.get("complete", 0)
    lines = ["=== Coverage ===", ""]
    lines.append(f"Complete: {done}/{stats.total_recordings} ({100.0 * done / total:.0f}%)")
    labels = stats.assigned_labels + stats.unassigned_labels
    if labels:
        lines.append(
            f"Labels assigned: {stats.assigned_labels}/{labels} "
            f"({100.0 * stats.assigned_labels / labels:.0f}%)"
        )
    return "\n".join(lines)


def format_confidence(stats: SystemStats) -> str:
    lines = ["=== Low-Confidence Assignments ===", ""]
    if not stats.low_confidence:
        lines.append("None — all assignments at medium confidence or better.")
    for item in stats.low_confidence:
        lines.append(
            f"  {item['recording_b3sum'][:8]}…  {item['label']} -> "
            f"{item['speaker_id'] or '(unassigned)'} ({item['confidence']}, {item['score']})"
        )
    return "\n".join(lines)


def format_stale(stats: SystemStats) -> str:
    lines = [f"=== Stale Recordings (>{STALE_DAYS}d) ===", ""]
    if not stats.stale_recordings:
        lines.append("None.")
    for item in stats.stale_recordings:
        lines.append(f"  {item['b3sum'][:8]}…  {item['status']:<12} {item['path']}")
    return "\n".join(lines)


def format_speakers(stats: SystemStats) -> str:
    lines = ["=== Speakers Needing Samples ===", ""]
    if not stats.speakers_needing_samples:
        lines.append(f"All speakers have ≥{MIN_REVIEWED_SAMPLES} reviewed samples.")
    for item in stats.speakers_needing_samples:
        lines.append(f"  {item['speaker_id']:<24} {item['reviewed_samples']} reviewed")
    return "\n".join(lines)


def format_contexts(stats: SystemStats) -> str:
    lines = ["=== Contexts ===", ""]
    if not stats.contexts:
        lines.append("No contexts in use.")
    for name, c in sorted(stats.contexts.items()):
        lines.append(f"  {name}: {c['recordings']} recording(s) {c['statuses']}")
    return "\n".join(lines)
