"""CLI black-box tests — reference test strategy: redirect the DB via env,
invoke commands, assert on rc/stdout/files (SURVEY.md §4).

Most tests call main(argv) in-process (same surface, faster); one true
subprocess smoke test guards the `python -m` entry points.
"""

import json
import sys

import pytest

from sdtk_tpu.cli import assign as cli_assign
from sdtk_tpu.cli import catalog as cli_catalog
from sdtk_tpu.cli import detection as cli_detection
from sdtk_tpu.cli import diarize as cli_diarize
from sdtk_tpu.cli import llm as cli_llm
from sdtk_tpu.cli import process as cli_process
from sdtk_tpu.cli import report as cli_report
from sdtk_tpu.cli import review as cli_review
from sdtk_tpu.cli import samples as cli_samples
from sdtk_tpu.cli import segments as cli_segments


@pytest.fixture(autouse=True)
def _env(speakers_dir, monkeypatch, tmp_path):
    monkeypatch.setenv("SPEAKER_DETECTION_BACKEND", "fake")
    monkeypatch.setenv("SPEAKER_LLM_CACHE_DIR", str(tmp_path / "llmcache"))
    monkeypatch.setenv("SPEAKER_REVIEW_SESSION_DIR", str(tmp_path / "rvsess"))
    monkeypatch.delenv("ANTHROPIC_API_KEY", raising=False)
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    monkeypatch.setenv("OLLAMA_HOST", "http://127.0.0.1:1")


def voice_wav(path, freq, seconds=4.0, seed=0):
    import numpy as np

    from sdtk_tpu.utils.audio import save_wav

    sr = 16000
    t = np.arange(int(seconds * sr)) / sr
    x = sum((0.5 / (k + 1)) * np.sin(2 * np.pi * freq * (k + 1) * t) for k in range(4))
    x += 0.01 * np.random.default_rng(seed).standard_normal(len(t))
    save_wav(path, (0.5 * x / np.max(np.abs(x))).astype(np.float32), sr)
    return path


def test_detection_profile_lifecycle(capsys):
    assert cli_detection.main(["add", "alice", "--name", "Alice", "--tag", "eng"]) == 0
    assert cli_detection.main(["add", "alice", "--name", "Alice"]) == 1  # duplicate
    assert cli_detection.main(["list", "--format", "json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out[0]["id"] == "alice" and out[0]["tags"] == ["eng"]

    assert cli_detection.main(["update", "alice", "--nickname", "Al"]) == 0
    assert cli_detection.main(["show", "alice"]) == 0
    shown = json.loads(capsys.readouterr().out)
    assert shown["nicknames"] == ["Al"]

    assert cli_detection.main(["tag", "alice", "--add", "vip"]) == 0
    assert "vip" in capsys.readouterr().out

    assert cli_detection.main(["delete", "alice"]) == 1  # needs --force
    assert cli_detection.main(["delete", "alice", "--force"]) == 0
    assert cli_detection.main(["show", "alice"]) == 1


def test_detection_enroll_identify_verify(tmp_path, capsys):
    a1 = voice_wav(tmp_path / "a1.wav", 220, seed=1)
    a2 = voice_wav(tmp_path / "a2.wav", 220, seed=2)
    b1 = voice_wav(tmp_path / "b1.wav", 520, seed=3)

    cli_detection.main(["add", "alice", "--name", "Alice"])
    cli_detection.main(["add", "bob", "--name", "Bob"])
    assert cli_detection.main(["enroll", "alice", str(a1)]) == 0
    assert cli_detection.main(["enroll", "bob", str(b1)]) == 0
    capsys.readouterr()

    assert cli_detection.main(["identify", str(a2), "--format", "json"]) == 0
    results = json.loads(capsys.readouterr().out)
    assert results[0]["speaker_id"] == "alice"

    assert cli_detection.main(["verify", "alice", str(a2)]) == 0
    assert cli_detection.main(["verify", "bob", str(a2)]) == 1  # no match

    assert cli_detection.main(["embeddings", "alice", "--show-trust"]) == 0
    assert "low" in capsys.readouterr().out

    assert cli_detection.main(["check-validity", "alice"]) == 0
    assert cli_detection.main(["validate"]) == 0
    assert cli_detection.main(["backends"]) == 0
    assert "fake" in capsys.readouterr().out


def test_detection_enroll_segments_flag(tmp_path, capsys):
    wav = voice_wav(tmp_path / "s.wav", 260, seconds=6, seed=4)
    cli_detection.main(["add", "carol", "--name", "Carol"])
    assert cli_detection.main(["enroll", "carol", str(wav), "--segments", "0-2,3-5"]) == 0
    cli_detection.main(["show", "carol"])
    prof = json.loads(capsys.readouterr().out)
    rec = prof["embeddings"]["fake"][0]
    assert rec["source_segments"] == [{"start": 0.0, "end": 2.0}, {"start": 3.0, "end": 5.0}]


def test_catalog_flow(tmp_path, capsys):
    wav = voice_wav(tmp_path / "rec.wav", 330, seed=5)
    tr = tmp_path / "t.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "S1", "start": 0, "end": 2000, "text": "hi"}]}))

    assert cli_catalog.main(["create-context", "standup", "--speakers", "alice,bob"]) == 0
    assert cli_catalog.main(["add", str(wav), "--context", "standup"]) == 0
    assert cli_catalog.main(["add", str(wav)]) == 1  # duplicate without --force
    capsys.readouterr()  # drop the stdout 'Added:' confirmation block
    assert cli_catalog.main(["list", "--format", "ids"]) == 0
    b3 = capsys.readouterr().out.strip()
    assert len(b3) == 32

    assert cli_catalog.main(["status", b3[:8]]) == 0
    assert capsys.readouterr().out.strip() == "unprocessed"

    assert cli_catalog.main(["register-transcript", b3, str(tr), "--backend", "assemblyai"]) == 0
    capsys.readouterr()  # drop the 'Registered transcript:' block
    assert cli_catalog.main(["status", b3]) == 0
    assert capsys.readouterr().out.strip() == "transcribed"

    assert cli_catalog.main(["show", b3[:8], "--format", "json"]) == 0
    entry = json.loads(capsys.readouterr().out)
    assert entry["context"]["expected_speakers"] == ["alice", "bob"]

    assert cli_catalog.main(["list-contexts"]) == 0
    assert "standup" in capsys.readouterr().out
    assert cli_catalog.main(["context-add-speaker", "standup", "carol"]) == 0
    assert cli_catalog.main(["remove", b3, "--force"]) == 0


def test_segments_cli(tmp_path, capsys):
    tr = tmp_path / "t.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "A", "start": 0, "end": 1500, "text": "x"},
        {"speaker": "B", "start": 2000, "end": 3000, "text": "y"},
    ]}))
    assert cli_segments.main([str(tr)]) == 0
    assert capsys.readouterr().out.split() == ["A", "B"]
    assert cli_segments.main([str(tr), "A", "--format", "csv"]) == 0
    assert "0.0,1.5" in capsys.readouterr().out
    assert cli_segments.main([str(tr), "Z"]) == 1


def test_samples_cli(tmp_path, capsys):
    wav = voice_wav(tmp_path / "src.wav", 220, seconds=5, seed=6)
    tr = tmp_path / "t.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "S1", "start": 0, "end": 2000, "text": "one"},
        {"speaker": "S1", "start": 2500, "end": 4500, "text": "two"},
    ]}))
    assert cli_samples.main([
        "extract", "alice", str(wav), "--transcript", str(tr),
        "--max-segments", "2", "-l", "S1", "-v",
    ]) == 0
    out = capsys.readouterr().out
    assert "sample-001" in out

    assert cli_samples.main(["list", "--format", "json"]) == 0
    metas = json.loads(capsys.readouterr().out)
    assert metas and metas[0]["speaker_id"] == "alice"

    assert cli_samples.main(["review", "alice", "--sample-id", "sample-001", "--approve"]) == 0
    assert "pending -> reviewed" in capsys.readouterr().out
    assert cli_samples.main(["info", "alice", "sample-001", "--format", "json"]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["review"]["status"] == "reviewed"

    assert cli_samples.main(["speakers"]) == 0
    assert "alice" in capsys.readouterr().out
    assert cli_samples.main(["remove", "alice", "sample-001"]) == 0


def test_assign_and_report_cli(tmp_path, capsys):
    a = voice_wav(tmp_path / "a.wav", 220, seed=1)
    b = voice_wav(tmp_path / "b.wav", 520, seed=2)
    import numpy as np

    from sdtk_tpu.utils.audio import load_audio, save_wav

    conv = tmp_path / "conv.wav"
    save_wav(conv, np.concatenate([load_audio(a)[0], load_audio(b)[0]]), 16000)
    tr = tmp_path / "conv.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "S1", "start": 0, "end": 4000, "text": "Hi, I'm Alice."},
        {"speaker": "S2", "start": 4000, "end": 8000, "text": "My name is Bob."},
    ]}))

    cli_detection.main(["add", "alice", "--name", "Alice"])
    cli_detection.main(["add", "bob", "--name", "Bob"])
    cli_detection.main(["enroll", "alice", str(a)])
    cli_detection.main(["enroll", "bob", str(b)])
    cli_catalog.main(["add", str(conv)])
    capsys.readouterr()

    assert cli_assign.main([
        "assign", str(conv), "--transcript", str(tr), "--use-llm",
        "--threshold", "0.2", "--format", "json",
    ]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["mappings"]["S1"]["speaker_id"] == "alice"
    assert out["mappings"]["S2"]["speaker_id"] == "bob"

    assert cli_assign.main(["show", str(conv)]) == 0
    capsys.readouterr()
    assert cli_report.main(["status"]) == 0
    assert "Recordings:     1 total" in capsys.readouterr().out
    assert cli_report.main(["status", "--format", "json"]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["speakers"]["total"] == 2
    assert cli_assign.main(["clear", str(conv)]) == 0


def test_llm_cli(tmp_path, capsys):
    tr = tmp_path / "t.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "S1", "start": 0, "end": 2000, "text": "Hello, I'm Dave."}]}))
    assert cli_llm.main(["analyze", str(tr), "--provider", "pattern"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["detections"][0]["detected_name"] == "Dave"
    assert cli_llm.main(["detect-names", str(tr), "--provider", "pattern"]) == 0
    assert json.loads(capsys.readouterr().out) == {"S1": "Dave"}
    assert cli_llm.main(["providers"]) == 0
    assert "pattern" in capsys.readouterr().out
    assert cli_llm.main(["clear-cache"]) == 0


def test_process_and_diarize_cli(tmp_path, capsys):
    import numpy as np

    from sdtk_tpu.utils.audio import load_audio, save_wav

    a = voice_wav(tmp_path / "indir" / "m.wav", 220, seconds=5, seed=7)
    cli_detection.main(["add", "alice", "--name", "Alice"])
    cli_detection.main(["enroll", "alice", str(a)])
    capsys.readouterr()

    assert cli_process.main(["process", str(tmp_path / "indir"), "--parallel", "1"]) == 0
    assert cli_process.main(["status"]) == 0
    capsys.readouterr()

    assert cli_diarize.main([str(a), "--format", "rttm"]) == 0
    out = capsys.readouterr().out
    assert out.startswith("SPEAKER rec 1 ")

    assert cli_diarize.main([str(a), "--num-speakers", "1"]) == 0
    res = json.loads(capsys.readouterr().out)
    assert res["n_speakers"] == 1


def test_review_cli_noninteractive(tmp_path, capsys, monkeypatch):
    wav = voice_wav(tmp_path / "conv.wav", 220, seconds=6, seed=8)
    tr = tmp_path / "conv.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "S1", "start": 0, "end": 3000, "text": "hello"},
        {"speaker": "S1", "start": 3000, "end": 6000, "text": "again"},
    ]}))
    cli_detection.main(["add", "alice", "--name", "Alice"])
    cli_detection.main(["enroll", "alice", str(wav)])
    cli_catalog.main(["add", str(wav)])
    cli_catalog.main(["register-transcript", str(wav), str(tr), "--backend", "assemblyai"])
    cli_assign.main(["assign", str(wav), "--transcript", str(tr), "--threshold", "0.1"])
    capsys.readouterr()

    # feed decisions through stdin (a=approve, then q=quit)
    monkeypatch.setattr("sys.stdin", __import__("io").StringIO("a\nq\n"))
    assert cli_review.main(["review", str(wav)]) == 0
    capsys.readouterr()
    assert cli_review.main(["status", "--format", "json"]) == 0
    st = json.loads(capsys.readouterr().out)
    assert st["decided"] == 1
    assert cli_review.main(["clear"]) == 0


def test_module_entrypoints_subprocess(tmp_path, speakers_dir):
    """True `python -m` smoke test (the reference tests use subprocess
    exclusively)."""
    import subprocess, os

    env = dict(os.environ)
    env["SPEAKERS_EMBEDDINGS_DIR"] = str(speakers_dir)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "-m", "sdtk_tpu.cli.detection", "add", "zoe", "--name", "Zoe"],
        capture_output=True, text=True, env=env, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "sdtk_tpu.cli.detection", "list", "--format", "ids"],
        capture_output=True, text=True, env=env, timeout=60,
    )
    assert r.stdout.strip() == "zoe"


def test_umbrella_dispatcher_subprocess(tmp_path, speakers_dir):
    """`python -m sdtk_tpu <tool>` routes to the per-tool CLI."""
    import subprocess, os

    env = dict(os.environ)
    env["SPEAKERS_EMBEDDINGS_DIR"] = str(speakers_dir)
    env["PYTHONPATH"] = "/root/repo"
    r = subprocess.run(
        [sys.executable, "-m", "sdtk_tpu", "detection", "add", "kai", "--name", "Kai"],
        capture_output=True, text=True, env=env, timeout=60,
    )
    assert r.returncode == 0, r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "sdtk_tpu", "detection", "list", "--format", "ids"],
        capture_output=True, text=True, env=env, timeout=60,
    )
    assert r.stdout.strip() == "kai"
    r = subprocess.run(
        [sys.executable, "-m", "sdtk_tpu", "nope"],
        capture_output=True, text=True, env=env, timeout=60,
    )
    assert r.returncode == 2
    assert "unknown tool" in r.stderr


def test_review_edit_prev_context_keys(speakers_dir, tmp_path, monkeypatch, capsys):
    """Reference keybindings e/N/c/? (speaker-review:71-84,641-667)."""
    import io

    from sdtk_tpu.cli import review as cli_review
    from sdtk_tpu.pipeline import identify as ID
    from sdtk_tpu.store import catalog, profiles
    from conftest import make_wav

    monkeypatch.setenv("SPEAKER_DETECTION_BACKEND", "fake")
    wav = make_wav(tmp_path / "rv.wav", seconds=3.0, freq=300, seed=61)
    tr = tmp_path / "tr.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "A", "start": 0, "end": 1400, "text": "one"},
        {"speaker": "A", "start": 2800, "end": 2900, "text": "two"},
    ]}))
    ID.enroll("rex", wav, create_missing=True, name="Rex",
              segments=[(0.0, 1.4)])
    entry = catalog.add_recording(wav)
    b3 = entry["recording"]["b3sum"]
    catalog.register_transcript(b3, tr, "assemblyai")
    from sdtk_tpu.pipeline import assign as A

    A.assign(wav, tr, threshold=0.0)
    capsys.readouterr()

    # ? help, e rename, c set context, N previous (no-op at 0), q quit
    monkeypatch.setattr(
        "sys.stdin", io.StringIO("?\ne\nRexford\nc\nboard\nN\nq\n"))
    assert cli_review.main(["review", str(wav)]) == 0
    out = capsys.readouterr().out
    assert "updated rex" in out
    assert "context set: board" in out
    assert profiles.load_speaker("rex")["names"]["default"] == "Rexford"
    assert catalog.load_entry(b3)["context"]["name"] == "board"
