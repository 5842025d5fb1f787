"""Store layer: profiles, trust, samples, catalog, assignments, queue."""

import numpy as np
import pytest

from sdtk_tpu import config
from sdtk_tpu.store import (
    assignments,
    catalog,
    migrate_profile,
    migrate_sample_metadata,
    profiles,
    queue,
    samples,
    schemas,
)

from conftest import make_wav


def test_profile_crud(speakers_dir):
    p = profiles.create_speaker_profile("alice", "Alice", tags=["team", "eng"])
    profiles.save_speaker(p)
    loaded = profiles.load_speaker("alice")
    assert loaded["names"]["default"] == "Alice"
    assert loaded["version"] == 1
    assert sorted(loaded["tags"]) == ["eng", "team"]
    assert profiles.list_all_speakers()[0]["id"] == "alice"
    assert profiles.delete_speaker("alice")
    assert profiles.load_speaker("alice") is None


def test_speaker_id_validation():
    assert profiles.validate_speaker_id("alice-smith_2")
    assert not profiles.validate_speaker_id("Alice")
    assert not profiles.validate_speaker_id("-bad")
    assert profiles.normalize_speaker_id("Alice Smith") == "alice-smith"


def test_tag_filter(speakers_dir):
    for sid, tags in [("a", ["x", "y"]), ("b", ["x"]), ("c", ["z"])]:
        profiles.save_speaker(profiles.create_speaker_profile(sid, sid, tags=tags))
    all_s = profiles.list_all_speakers()
    assert [s["id"] for s in profiles.filter_speakers_by_tags(all_s, ["x", "y"])] == ["a"]
    assert [s["id"] for s in profiles.filter_speakers_by_tags(all_s, ["x", "y"], any_tag=True)] == ["a", "b"]


def test_trust_levels():
    f = profiles.compute_trust_level
    assert f({"reviewed": ["h"], "unreviewed": [], "rejected": []}) == "high"
    assert f({"reviewed": ["h"], "unreviewed": ["u"], "rejected": []}) == "medium"
    assert f({"reviewed": [], "unreviewed": ["u"], "rejected": []}) == "low"
    # empty -> unknown (reference acceptance test_samples_and_trust.py pin)
    assert f({"reviewed": [], "unreviewed": [], "rejected": []}) == "unknown"
    assert f({"reviewed": ["h"], "unreviewed": [], "rejected": ["r"]}) == "invalidated"


def test_embedding_roundtrip(speakers_dir):
    p = profiles.create_speaker_profile("bob", "Bob")
    profiles.save_speaker(p)
    vec = np.arange(192, dtype=np.float32)
    rec = profiles.enroll_embedding(
        "bob", "tpu", vec, "/tmp/a.wav", "ab" * 16, [{"start": 0, "end": 1}], "ecapa-v1"
    )
    assert rec["trust_level"] == "low"  # no samples yet
    loaded = profiles.load_speaker("bob")
    recs = loaded["embeddings"]["tpu"]
    assert len(recs) == 1
    v = profiles.load_vector(recs[0])
    np.testing.assert_array_equal(v, vec)


def test_profile_matrix(speakers_dir):
    rng = np.random.default_rng(1)
    for sid in ["u1", "u2"]:
        profiles.save_speaker(profiles.create_speaker_profile(sid, sid))
        profiles.enroll_embedding(
            sid, "tpu", rng.standard_normal(8).astype(np.float32),
            "/tmp/x.wav", "cd" * 16, [], "m1",
        )
    pm = profiles.ProfileMatrix.build("tpu")
    assert pm.matrix.shape == (2, 8)
    np.testing.assert_allclose(np.linalg.norm(pm.matrix, axis=1), 1.0, rtol=1e-5)
    assert {r["speaker_id"] for r in pm.rows} == {"u1", "u2"}
    # empty backend
    assert len(profiles.ProfileMatrix.build("nope")) == 0


def test_samples_and_validity(speakers_dir, tmp_path):
    wav = make_wav(tmp_path / "src.wav", seconds=3.0, seed=7)
    profiles.save_speaker(profiles.create_speaker_profile("carol", "Carol"))
    written = samples.extract_samples(
        "carol", wav, [{"start": 0.0, "end": 1.0}, {"start": 1.5, "end": 2.5}],
        speaker_label="S1",
    )
    assert len(written) == 2
    assert written[0]["sample_id"] == "sample-001"
    src_b3 = written[0]["source"]["audio_b3sum"]

    rec = profiles.enroll_embedding(
        "carol", "tpu", np.ones(4, dtype=np.float32), wav, src_b3,
        [{"start": 0.0, "end": 1.0}], "m1",
    )
    assert rec["trust_level"] == "low"  # both samples pending

    # review one sample -> medium
    samples.set_review_status("carol", sample_id="sample-001", status="reviewed")
    results = profiles.refresh_trust_levels("carol")
    assert results[0]["new_trust"] == "medium"

    # reject the other -> invalidated
    samples.set_review_status("carol", sample_id="sample-002", status="rejected")
    results = profiles.refresh_trust_levels("carol")
    assert results[0]["new_trust"] == "invalidated"
    assert results[0]["newly_rejected"]
    loaded = profiles.load_speaker("carol")
    assert loaded["embeddings"]["tpu"][0]["trust_level"] == "invalidated"


def test_sample_caps(speakers_dir, tmp_path):
    wav = make_wav(tmp_path / "s.wav", seconds=5.0, seed=9)
    profiles.save_speaker(profiles.create_speaker_profile("dan", "Dan"))
    segs = [{"start": i, "end": i + 1.0} for i in range(4)]
    w = samples.extract_samples("dan", wav, segs, max_segments=3, max_duration=2.5)
    assert len(w) == 2  # 3rd would exceed 2.5s total


def test_schema_validation():
    ok = profiles.create_speaker_profile("x", "X")
    assert schemas.validate_profile(ok) == []
    bad = {"id": "", "names": "oops", "tags": "notalist"}
    warns = schemas.validate_profile(bad)
    assert len(warns) >= 3
    with pytest.raises(schemas.ValidationError):
        schemas.validate_profile(bad, strict=True)
    assert schemas.validate_embedding({"id": "e", "external_id": None,
                                       "created_at": "2026-01-01T00:00:00+00:00",
                                       "trust_level": "high"}) == []


def test_migrations():
    v0 = {"id": "old", "names": {"default": "Old"}}
    v1 = migrate_profile(v0)
    assert v1["version"] == 1 and v1["embeddings"] == {}
    m0 = {"sample_id": "s"}
    m2 = migrate_sample_metadata(m0)
    assert m2["version"] == 2
    assert m2["review"]["status"] == "pending"
    assert m2["b3sum"] is None


def test_migration_introspection():
    """Plan/describe/needs parity (reference migrations.py:238-299)."""
    from sdtk_tpu.store.migrations import (
        PROFILE_SCHEMA_VERSION,
        SAMPLE_METADATA_VERSION,
        describe_migrations,
        get_migration_plan,
        needs_migration,
    )

    assert get_migration_plan("profile", 0) == [(0, 1)]
    assert get_migration_plan("profile", PROFILE_SCHEMA_VERSION) == []
    assert get_migration_plan("sample_metadata", 0) == [(0, 1), (1, 2)]
    assert get_migration_plan("sample_metadata", 1) == [(1, 2)]
    assert get_migration_plan("sample_metadata", SAMPLE_METADATA_VERSION) == []

    assert needs_migration({}, PROFILE_SCHEMA_VERSION)
    assert needs_migration({"version": 1}, SAMPLE_METADATA_VERSION)
    assert not needs_migration({"version": SAMPLE_METADATA_VERSION},
                               SAMPLE_METADATA_VERSION)

    desc = describe_migrations()
    assert f"v{PROFILE_SCHEMA_VERSION}" in desc
    assert "v0 -> v1" in desc and "v1 -> v2" in desc


def test_catalog_flow(speakers_dir, tmp_path):
    wav = make_wav(tmp_path / "rec.wav", seconds=2.0, seed=3)
    catalog.create_context("standup", speakers=["alice", "bob"])
    entry = catalog.add_recording(wav, context="standup")
    b3 = entry["recording"]["b3sum"]
    assert entry["context"]["expected_speakers"] == ["alice", "bob"]
    assert catalog.compute_status(entry) == "unprocessed"
    with pytest.raises(FileExistsError):
        catalog.add_recording(wav)

    # register transcript -> transcribed
    import json
    tr = tmp_path / "t.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "A", "start": 0, "end": 1000, "text": "hi"}]}))
    entry = catalog.register_transcript(b3, tr, "assemblyai")
    assert entry["transcriptions"][0]["speakers"] == ["A"]
    assert catalog.compute_status(entry) == "transcribed"

    # assignments -> assigned
    assignments.save_assignments(b3, tr, {"A": {"speaker_id": "alice"}}, "test-v1")
    assert catalog.compute_status(entry) == "assigned"

    # review progression
    entry = catalog.set_review_status(b3, "partial")
    assert entry["status"] == "reviewed"
    entry = catalog.set_review_status(b3, "complete")
    assert entry["status"] == "complete"

    # prefix resolution
    assert catalog.resolve_b3sum(b3[:8]) == b3
    assert catalog.resolve_b3sum(str(wav)) == b3

    # removal also removes assignments
    assert catalog.remove_recording(b3)
    assert assignments.load_assignments(b3) is None


def test_queue(speakers_dir, tmp_path):
    a = tmp_path / "a.wav"; a.write_bytes(b"RIFFaaaa")
    b = tmp_path / "b.wav"; b.write_bytes(b"RIFFbbbb")
    q = queue.ProcessingQueue(tmp_path / "q.yaml")
    assert q.add(tmp_path / "missing.wav") is None  # reference :273-274
    q.add(a)
    q.add(b)
    item = q.next_pending()
    assert item["status"] == "processing"
    q.mark(item["audio_path"], "failed", error="boom")
    assert q.counts()["failed"] == 1
    # re-add resets failed -> pending
    q.add(item["audio_path"])
    assert q.counts()["failed"] == 0 and q.counts()["pending"] == 2
    # duplicate add updates context (reference :275-280)
    q.add(a, context="ctx2")
    assert any(i.get("context") == "ctx2" for i in q.items())
    # persistence: processing items revert to pending on reload
    item = q.next_pending()
    q2 = queue.ProcessingQueue(tmp_path / "q.yaml")
    assert q2.counts()["processing"] == 0
    assert q2.counts()["pending"] == 2
    assert q2.get_stats()["total"] == 2
