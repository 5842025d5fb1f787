"""End-to-end black-box pipeline tests.

Mirrors the reference's e2e tier (evals/speaker_detection/test_e2e_pipeline.py:
catalog add → register-transcript → assign → review status → report status,
all via subprocess against a temp $SPEAKERS_EMBEDDINGS_DIR, no network).
Here the "cloud" tier is the deterministic fake backend
(SPEAKER_DETECTION_BACKEND=fake), so the full chain runs hermetically.

Every test shells out with ``python -m sdtk_tpu ...`` exactly as a user
would — no in-process shortcuts.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from conftest import REPO_ROOT, make_wav

pytestmark = pytest.mark.e2e


def _env(root):
    env = dict(os.environ)
    env["SPEAKERS_EMBEDDINGS_DIR"] = str(root)
    env["SPEAKER_DETECTION_BACKEND"] = "fake"
    env["PYTHONPATH"] = str(REPO_ROOT)
    # keep subprocesses on CPU: no TPU tunnel needed for the fake tier
    env["SDTK_FORCE_CPU"] = "1"
    env.pop("SPEAKER_LLM_CACHE_DIR", None)
    return env


def run(env, *argv, rc=0, stdin=None):
    r = subprocess.run(
        [sys.executable, "-m", "sdtk_tpu", *argv],
        capture_output=True, text=True, env=env, timeout=120, input=stdin,
    )
    assert r.returncode == rc, f"{argv}: rc={r.returncode}\n{r.stderr}"
    return r


@pytest.fixture()
def world(tmp_path):
    """Temp DB root + two distinct voice WAVs + a mock transcript."""
    root = tmp_path / "db"
    env = _env(root)
    wav = make_wav(tmp_path / "meeting.wav", seconds=6.0, freq=300, seed=11)
    transcript = tmp_path / "meeting.assemblyai.json"
    transcript.write_text(json.dumps({
        "utterances": [
            {"speaker": "A", "start": 0, "end": 2800,
             "text": "Hi, I'm Alice and I'll kick us off."},
            {"speaker": "B", "start": 3000, "end": 5800,
             "text": "Thanks Alice. Bob here with the update."},
        ]
    }))
    return {"env": env, "root": root, "wav": wav, "transcript": transcript,
            "tmp": tmp_path}


def test_catalog_add_and_status(world):
    env, wav = world["env"], world["wav"]
    r = run(env, "catalog", "add", str(wav), "--context", "standup")
    run(env, "catalog", "status", str(wav))
    r = run(env, "catalog", "list", "--format", "json")
    entries = json.loads(r.stdout)
    assert len(entries) == 1 and entries[0]["status"] == "unprocessed"


def test_register_transcript_advances_status(world):
    env, wav, tr = world["env"], world["wav"], world["transcript"]
    run(env, "catalog", "add", str(wav))
    run(env, "catalog", "register-transcript", str(wav), str(tr),
        "--backend", "assemblyai")
    r = run(env, "catalog", "list", "--format", "json")
    row = json.loads(r.stdout)[0]
    assert row["status"] == "transcribed"
    assert row["transcriptions"] == 1  # list rows carry the count
    r = run(env, "catalog", "show", row["b3sum"], "--format", "json")
    entry = json.loads(r.stdout)
    assert entry["transcriptions"][0]["speaker_count"] == 2


def test_enroll_identify_verify_chain(world):
    env, wav = world["env"], world["wav"]
    run(env, "detection", "add", "alice", "--name", "Alice")
    run(env, "detection", "enroll", "alice", str(wav), "--segments", "0-2.8")
    r = run(env, "detection", "identify", str(wav), "--format", "json")
    results = json.loads(r.stdout)
    assert results and results[0]["speaker_id"] == "alice"
    r = run(env, "detection", "verify", "alice", str(wav))
    assert r.stdout.startswith("MATCH")


def test_assign_full_chain_and_show(world):
    env, wav, tr = world["env"], world["wav"], world["transcript"]
    run(env, "detection", "add", "alice", "--name", "Alice")
    # high trust so the single embedding signal clears the default 0.3
    # threshold (0.4 weight x 1.0 trust x cosine) — reference semantics:
    # fresh low-trust enrollments need corroborating signals
    run(env, "detection", "enroll", "alice", str(wav), "--segments", "0-2.8",
        "--trust-level", "high")
    run(env, "catalog", "add", str(wav))
    run(env, "catalog", "register-transcript", str(wav), str(tr),
        "--backend", "assemblyai")
    r = run(env, "assign", "assign", str(wav), "--transcript", str(tr),
            "--format", "json")
    mappings = json.loads(r.stdout)["mappings"]
    assert "A" in mappings and "B" in mappings
    assert mappings["A"]["speaker_id"] == "alice"
    # assignments file exists, catalog status advanced
    r = run(env, "catalog", "list", "--format", "json")
    assert json.loads(r.stdout)[0]["status"] == "assigned"
    r = run(env, "assign", "show", str(wav), "--format", "json")
    assert "mappings" in json.loads(r.stdout)
    # text is the reference's default show format (speaker-assign:765)
    r = run(env, "assign", "show", str(wav))
    assert "alice" in r.stdout


def test_assign_apply_rewrites_labels(world):
    env, wav, tr, tmp = (world["env"], world["wav"], world["transcript"],
                         world["tmp"])
    run(env, "detection", "add", "alice", "--name", "Alice")
    run(env, "detection", "enroll", "alice", str(wav), "--segments", "0-2.8",
        "--trust-level", "high")
    run(env, "assign", "assign", str(wav), "--transcript", str(tr))
    out = tmp / "named.json"
    run(env, "assign", "apply", str(wav), "--transcript", str(tr),
        "--output", str(out))
    doc = json.loads(out.read_text())
    speakers = {u["speaker"] for u in doc["utterances"]}
    assert "Alice" in speakers


def test_report_status_and_coverage(world):
    env, wav, tr = world["env"], world["wav"], world["transcript"]
    run(env, "detection", "add", "alice", "--name", "Alice")
    run(env, "catalog", "add", str(wav))
    run(env, "catalog", "register-transcript", str(wav), str(tr),
        "--backend", "assemblyai")
    r = run(env, "report", "status", "--format", "json")
    st = json.loads(r.stdout)
    assert st["recordings"]["total"] == 1
    assert st["speakers"]["total"] == 1
    r = run(env, "report", "coverage", "--format", "json")
    json.loads(r.stdout)  # machine-consumable


def test_samples_extract_and_review(world):
    env, wav, tr = world["env"], world["wav"], world["transcript"]
    run(env, "samples", "extract", "alice", str(wav), "--transcript", str(tr),
        "--speaker-label", "A", "--max-segments", "1")
    r = run(env, "samples", "list", "alice", "--format", "json")
    samples = json.loads(r.stdout)
    assert len(samples) == 1
    sid = samples[0]["sample_id"]
    run(env, "samples", "review", "alice", "--sample-id", sid, "--approve")
    r = run(env, "samples", "list", "alice", "--format", "json")
    assert json.loads(r.stdout)[0]["review"]["status"] == "reviewed"


def test_segments_tool_formats(world):
    env, tr = world["env"], world["transcript"]
    r = run(env, "segments", str(tr), "A", "--format", "tuples")
    assert "(0.0, 2.8)" in r.stdout
    r = run(env, "segments", str(tr), "--list-speakers")
    assert set(r.stdout.split()) == {"A", "B"}


def test_process_queue_lifecycle(world):
    env, tmp = world["env"], world["tmp"]
    audio_dir = tmp / "incoming"
    audio_dir.mkdir()
    make_wav(audio_dir / "a.wav", seconds=2.0, freq=260, seed=21)
    make_wav(audio_dir / "b.wav", seconds=2.0, freq=420, seed=22)
    run(env, "process", "queue", str(audio_dir))
    r = run(env, "process", "status", "--format", "json")
    st = json.loads(r.stdout)["stats"]
    assert st["pending"] == 2
    run(env, "process", "run", "--parallel", "2")
    r = run(env, "process", "status", "--format", "json")
    st = json.loads(r.stdout)["stats"]
    assert st["pending"] == 0 and st["completed"] == 2
    run(env, "process", "clear-queue", "--force")


def test_contexts_registry(world):
    env = world["env"]
    run(env, "detection", "add", "alice", "--name", "Alice")
    run(env, "catalog", "create-context", "standup",
        "--description", "daily standup")
    run(env, "catalog", "context-add-speaker", "standup", "alice")
    r = run(env, "catalog", "list-contexts", "--format", "json")
    ctxs = json.loads(r.stdout)
    assert "standup" in ctxs
    r = run(env, "catalog", "show-context", "standup", "--format", "json")
    assert "alice" in json.loads(r.stdout)["standup"]["expected_speakers"]


def test_validate_and_check_validity(world):
    env, wav = world["env"], world["wav"]
    run(env, "detection", "add", "alice", "--name", "Alice")
    run(env, "detection", "enroll", "alice", str(wav), "--segments", "0-2.8")
    r = run(env, "detection", "validate")
    assert "All files valid." in r.stdout
    run(env, "detection", "check-validity")


def test_diarize_to_assign_roundtrip(world):
    """NEW capability e2e: on-device re-diarization feeds speaker-assign."""
    env, tmp = world["env"], world["tmp"]
    sr = 16000
    t = np.arange(3 * sr) / sr
    a = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    b = (0.4 * np.sin(2 * np.pi * 520 * t)).astype(np.float32)
    import wave

    wav_path = tmp / "two.wav"
    pcm = (np.clip(np.concatenate([a, b]), -1, 1) * 32767).astype("<i2")
    with wave.open(str(wav_path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())

    skel = tmp / "skeleton.json"
    run(env, "diarize", str(wav_path), "--backend", "fake",
        "--num-speakers", "2", "--format", "transcript", "-o", str(skel))
    doc = json.loads(skel.read_text())
    assert "results" in doc  # speechmatics-format skeleton
    r = run(env, "assign", "assign", str(wav_path), "--transcript", str(skel),
            "--format", "json")
    assert "mappings" in json.loads(r.stdout)


def test_quiet_and_version_flags(world):
    env = world["env"]
    r = run(env, "detection", "--version")
    assert r.stdout.strip() or r.stderr.strip()
    r = run(env, "detection", "-q", "add", "zed", "--name", "Zed")
    assert r.stderr == ""


def test_error_paths_missing_files(world):
    env, tmp = world["env"], world["tmp"]
    run(env, "detection", "identify", str(tmp / "nope.wav"), rc=1)
    run(env, "catalog", "add", str(tmp / "nope.wav"), rc=1)
    run(env, "assign", "show", str(tmp / "nope.wav"), rc=1)


def test_llm_pattern_provider_offline(world):
    env, tr = world["env"], world["transcript"]
    env = dict(env)
    env["SPEAKER_LLM_CACHE_DIR"] = str(world["tmp"] / "llmcache")
    env.pop("ANTHROPIC_API_KEY", None)
    env.pop("OPENAI_API_KEY", None)
    env["OLLAMA_HOST"] = "http://127.0.0.1:1"
    r = run(env, "llm", "analyze", str(tr), "--provider", "pattern")
    det = json.loads(r.stdout)["detections"]
    assert {d["speaker_label"]: d["detected_name"] for d in det}.get("A") == "Alice"
