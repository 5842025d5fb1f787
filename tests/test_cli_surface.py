"""Per-subcommand CLI surface tests (in-process).

Fills the long tail of the reference's per-tool unit tiers
(test_cli.py / test_speaker_catalog.py / test_samples_and_trust.py):
update/tag/export/delete, embeddings CRUD, catalog set-context/remove,
samples info/remove/speakers, llm providers/clear-cache.
"""

import json

import numpy as np
import pytest

from conftest import make_wav
from sdtk_tpu.cli import (
    catalog as cli_cat,
    detection as cli_det,
    llm as cli_llm,
    samples as cli_smp,
)


def out_json(capsys):
    return json.loads(capsys.readouterr().out)


@pytest.fixture()
def fake_env(speakers_dir, monkeypatch):
    monkeypatch.setenv("SPEAKER_DETECTION_BACKEND", "fake")
    return speakers_dir


# --- detection CRUD ------------------------------------------------------


def test_detection_update_names_and_nicknames(fake_env, capsys):
    assert cli_det.main(["-q", "add", "ada", "--name", "Ada"]) == 0
    assert cli_det.main([
        "-q", "update", "ada", "--name", "Ada L.", "--nickname", "The Countess",
        "--name-context", "work=Dr. Lovelace", "--metadata", "role=analyst",
    ]) == 0
    assert cli_det.main(["show", "ada"]) == 0
    prof = out_json(capsys)
    assert prof["names"]["default"] == "Ada L."
    assert prof["names"]["work"] == "Dr. Lovelace"
    assert "The Countess" in prof["nicknames"]
    assert prof["metadata"]["role"] == "analyst"
    assert cli_det.main(["-q", "update", "ada",
                         "--remove-nickname", "The Countess"]) == 0
    assert cli_det.main(["show", "ada"]) == 0
    assert out_json(capsys)["nicknames"] == []


def test_detection_tag_lifecycle_and_filters(fake_env, capsys):
    cli_det.main(["-q", "add", "t1", "--name", "T1", "--tag", "eng"])
    cli_det.main(["-q", "add", "t2", "--name", "T2", "--tag", "sales"])
    assert cli_det.main(["-q", "tag", "t1", "--add", "lead"]) == 0
    capsys.readouterr()
    assert cli_det.main(["list", "--tags", "eng,lead", "--format", "ids"]) == 0
    assert capsys.readouterr().out.split() == ["t1"]
    assert cli_det.main(["list", "--any-tag", "eng,sales", "--format", "ids"]) == 0
    assert sorted(capsys.readouterr().out.split()) == ["t1", "t2"]
    assert cli_det.main(["-q", "tag", "t1", "--remove", "lead"]) == 0
    capsys.readouterr()
    assert cli_det.main(["list", "--tags", "lead", "--format", "ids"]) == 0
    assert capsys.readouterr().out.split() == []


def test_detection_export_formats(fake_env, tmp_path, capsys):
    cli_det.main(["-q", "add", "exp", "--name", "Exported"])
    assert cli_det.main(["export"]) == 0
    data = out_json(capsys)
    # Reference contract (speaker_detection:675-691): wrapped object.
    assert data["speakers"][0]["id"] == "exp"
    assert data["speakers"][0]["name"] == "Exported"
    assert data["context"] == "default"
    assert "exported_at" in data
    assert cli_det.main(["export", "--format", "speechmatics"]) == 0
    sm = out_json(capsys)
    assert sm == {"speakers": [{"id": "exp", "name": "Exported"}]}


def test_detection_delete_and_dry_run(fake_env, capsys):
    cli_det.main(["-q", "add", "gone", "--name", "Gone"])
    assert cli_det.main(["-q", "delete", "gone", "-n"]) == 0  # dry run
    assert cli_det.main(["list", "--format", "ids"]) == 0
    assert "gone" in capsys.readouterr().out
    assert cli_det.main(["-q", "delete", "gone", "--force"]) == 0
    assert cli_det.main(["list", "--format", "ids"]) == 0
    assert "gone" not in capsys.readouterr().out


def test_detection_embedding_crud(fake_env, tmp_path, capsys):
    wav = make_wav(tmp_path / "e.wav", seconds=2.0, freq=333, seed=5)
    cli_det.main(["-q", "add", "emb", "--name", "Emb"])
    assert cli_det.main(["-q", "enroll", "emb", str(wav),
                         "--segments", "0-1.5"]) == 0
    assert cli_det.main(["embeddings", "emb"]) == 0
    listing = capsys.readouterr().out
    assert "emb-" in listing
    emb_id = [w for w in listing.split() if w.startswith("emb-")][0]
    assert cli_det.main(["-q", "update-embedding", "emb", emb_id,
                         "--trust-level", "high"]) == 0
    assert cli_det.main(["show", "emb"]) == 0
    prof = out_json(capsys)
    recs = next(iter(prof["embeddings"].values()))
    assert recs[0]["trust_level"] == "high"
    assert cli_det.main(["-q", "remove-embedding", "emb", emb_id]) == 0
    assert cli_det.main(["show", "emb"]) == 0
    prof = out_json(capsys)
    assert all(not v for v in prof["embeddings"].values())


# --- catalog -------------------------------------------------------------


def test_catalog_set_context_and_remove(fake_env, tmp_path, capsys):
    wav = make_wav(tmp_path / "c.wav", seconds=1.0, freq=260, seed=6)
    assert cli_cat.main(["-q", "add", str(wav)]) == 0
    assert cli_cat.main(["-q", "set-context", str(wav), "standup",
                         "--expected-speakers", "alice,bob"]) == 0
    assert cli_cat.main(["show", str(wav), "--format", "json"]) == 0
    entry = out_json(capsys)
    assert entry["context"]["name"] == "standup"
    assert entry["context"]["expected_speakers"] == ["alice", "bob"]
    assert cli_cat.main(["-q", "remove", str(wav), "--force"]) == 0
    assert cli_cat.main(["list", "--format", "json"]) == 0
    assert out_json(capsys) == []


def test_catalog_status_filter_and_prefix_resolution(fake_env, tmp_path, capsys):
    w1 = make_wav(tmp_path / "s1.wav", seconds=1.0, freq=260, seed=7)
    w2 = make_wav(tmp_path / "s2.wav", seconds=1.0, freq=420, seed=8)
    cli_cat.main(["-q", "add", str(w1)])
    cli_cat.main(["-q", "add", str(w2)])
    assert cli_cat.main(["list", "--status", "unprocessed", "--format",
                         "json"]) == 0
    entries = out_json(capsys)
    assert len(entries) == 2
    b3 = entries[0]["b3sum"]
    # b3sum-prefix resolution (reference speaker-catalog:164-179)
    assert cli_cat.main(["show", b3[:8], "--format", "json"]) == 0
    assert out_json(capsys)["recording"]["b3sum"] == b3
    # text is the reference's default show format (speaker-catalog:865)
    assert cli_cat.main(["show", b3[:8]]) == 0
    assert "B3SUM:" in capsys.readouterr().out


def test_catalog_reference_calling_conventions(fake_env, tmp_path, capsys):
    """Reference CLI shapes (speaker-catalog:845-926): register-transcript
    -t flag, set-context -c flag + tag editing, list --needs-review/--limit,
    status --format json, -V."""
    wav = make_wav(tmp_path / "rc.wav", seconds=1.0, freq=270, seed=31)
    tr = tmp_path / "t.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "A", "start": 0, "end": 900, "text": "hi"}]}))
    assert cli_cat.main(["-q", "add", str(wav), "-t", "meeting,q3"]) == 0
    assert cli_cat.main(["-q", "register-transcript", str(wav),
                         "-t", str(tr), "-b", "assemblyai",
                         "--tool-version", "stt-1.2"]) == 0
    assert cli_cat.main(["show", str(wav), "-f", "json"]) == 0
    entry = out_json(capsys)
    assert entry["transcriptions"][0]["tool_version"] == "stt-1.2"

    assert cli_cat.main(["-q", "set-context", str(wav), "-c", "standup",
                         "--tags", "weekly", "--remove-tags", "q3"]) == 0
    assert cli_cat.main(["show", str(wav), "-f", "json"]) == 0
    ctx = out_json(capsys)["context"]
    assert ctx["name"] == "standup"
    assert "weekly" in ctx["tags"] and "q3" not in ctx["tags"]

    assert cli_cat.main(["status", str(wav), "--format", "json"]) == 0
    assert out_json(capsys)["status"] == "transcribed"

    # transcribed → mid-pipeline → shows under --needs-review
    assert cli_cat.main(["list", "--needs-review", "-f", "ids"]) == 0
    assert capsys.readouterr().out.strip()
    assert cli_cat.main(["list", "-f", "json", "--limit", "1"]) == 0
    assert len(out_json(capsys)) == 1

    with pytest.raises(SystemExit) as e:
        cli_cat.main(["-V"])
    assert e.value.code == 0


def test_catalog_register_transcript_force(fake_env, tmp_path, capsys):
    wav = make_wav(tmp_path / "f.wav", seconds=1.0, freq=260, seed=9)
    tr = tmp_path / "t.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "A", "start": 0, "end": 900, "text": "hi"}]}))
    cli_cat.main(["-q", "add", str(wav)])
    assert cli_cat.main(["-q", "register-transcript", str(wav), str(tr),
                         "--backend", "assemblyai"]) == 0
    # duplicate without --force fails
    assert cli_cat.main(["-q", "register-transcript", str(wav), str(tr),
                         "--backend", "assemblyai"]) == 1
    assert cli_cat.main(["-q", "register-transcript", str(wav), str(tr),
                         "--backend", "assemblyai", "--force"]) == 0
    assert cli_cat.main(["show", str(wav), "--format", "json"]) == 0
    assert len(out_json(capsys)["transcriptions"]) == 1


# --- samples -------------------------------------------------------------


@pytest.fixture()
def extracted_sample(fake_env, tmp_path):
    wav = make_wav(tmp_path / "s.wav", seconds=3.0, freq=300, seed=10)
    tr = tmp_path / "tr.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "A", "start": 0, "end": 2500, "text": "hello world"}]}))
    assert cli_smp.main(["-q", "extract", "spk", str(wav), "--transcript",
                         str(tr), "--speaker-label", "A"]) == 0
    return wav


def test_samples_info_remove_speakers(extracted_sample, capsys):
    assert cli_smp.main(["speakers"]) == 0
    assert "spk" in capsys.readouterr().out
    assert cli_smp.main(["list", "spk", "--format", "json"]) == 0
    samples = out_json(capsys)
    sid = samples[0]["sample_id"]
    assert cli_smp.main(["info", "spk", sid, "--format", "json"]) == 0
    meta = out_json(capsys)
    assert meta["segment"]["text"] == "hello world"
    assert cli_smp.main(["-q", "remove", "spk", sid]) == 0
    assert cli_smp.main(["list", "spk", "--format", "json"]) == 0
    assert out_json(capsys) == []


def test_samples_review_by_source_b3sum(extracted_sample, capsys):
    from sdtk_tpu.utils.hashing import compute_b3sum

    b3 = compute_b3sum(extracted_sample)
    assert cli_smp.main(["-q", "review", "spk", "--source-b3sum", b3,
                         "--reject", "--notes", "clipping"]) == 0
    capsys.readouterr()  # drop the 'sample-001: pending -> rejected' line
    assert cli_smp.main(["list", "spk", "--format", "json"]) == 0
    meta = out_json(capsys)[0]
    assert meta["review"]["status"] == "rejected"
    assert meta["review"]["notes"] == "clipping"


def test_samples_reference_calling_conventions(fake_env, tmp_path, capsys):
    """The reference's exact CLI shapes work (speaker_samples:940-1004):
    extract <audio> -s ID, segments -t F -l L, speakers <transcript>,
    remove --all -f, review <id> <sample_id> positional, info yaml."""
    wav = make_wav(tmp_path / "r.wav", seconds=3.0, freq=310, seed=21)
    tr = tmp_path / "tr.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "A", "start": 0, "end": 2500, "text": "ref style"}]}))

    # dry-run extracts nothing
    assert cli_smp.main(["-q", "extract", str(wav), "-s", "ref", "-t",
                         str(tr), "-l", "A", "-n"]) == 0
    capsys.readouterr()  # drop the dry-run JSONL preview
    assert cli_smp.main(["list", "ref", "--format", "json"]) == 0
    assert out_json(capsys) == []

    assert cli_smp.main(["-q", "extract", str(wav), "-s", "ref",
                         "-t", str(tr), "-l", "A", "--format", "mp3"]) == 0
    capsys.readouterr()

    # segments via flags, enriched record shape
    assert cli_smp.main(["segments", "-t", str(tr), "-l", "A",
                         "-s", "ref", "-a", str(wav)]) == 0
    rec = json.loads(capsys.readouterr().out.splitlines()[0])
    assert rec["speaker_id"] == "ref" and rec["audio"] == str(wav)
    assert rec["text"] == "ref style"

    # speakers <transcript> lists transcript speakers + format
    assert cli_smp.main(["speakers", str(tr)]) == 0
    out = capsys.readouterr().out
    assert "assemblyai" in out and "A" in out

    # review by positional sample id; info defaults to yaml
    assert cli_smp.main(["-q", "review", "ref", "sample-001", "--approve"]) == 0
    assert cli_smp.main(["info", "ref", "sample-001"]) == 0
    out = capsys.readouterr().out
    assert "status: reviewed" in out  # yaml, not json

    # remove --all with -f
    assert cli_smp.main(["-q", "remove", "ref", "--all", "-f"]) == 0
    assert cli_smp.main(["list", "ref", "--format", "json"]) == 0
    assert out_json(capsys) == []


def test_samples_list_pagination(fake_env, tmp_path, capsys):
    wav = make_wav(tmp_path / "p.wav", seconds=6.0, freq=280, seed=12)
    tr = tmp_path / "tr.json"
    # gaps of 1.3 s > the 1.0 s merge threshold → 4 distinct segments
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "A", "start": i * 2500, "end": i * 2500 + 1200,
         "text": f"seg {i}"} for i in range(4)]}))
    assert cli_smp.main(["-q", "extract", "pag", str(wav), "--transcript",
                         str(tr), "--speaker-label", "A"]) == 0
    capsys.readouterr()
    assert cli_smp.main(["list", "pag", "--format", "json"]) == 0
    all_samples = out_json(capsys)
    assert len(all_samples) >= 3
    assert cli_smp.main(["list", "pag", "--format", "json", "--limit", "2",
                         "--offset", "1"]) == 0
    page = out_json(capsys)
    assert len(page) == 2
    assert page[0]["sample_id"] == all_samples[1]["sample_id"]


# --- llm auxiliary commands ---------------------------------------------


def test_llm_providers_and_clear_cache(fake_env, tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("SPEAKER_LLM_CACHE_DIR", str(tmp_path / "cache"))
    monkeypatch.delenv("ANTHROPIC_API_KEY", raising=False)
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    monkeypatch.setenv("OLLAMA_HOST", "http://127.0.0.1:1")
    assert cli_llm.main(["providers"]) == 0
    txt = capsys.readouterr().out
    assert "pattern" in txt
    tr = tmp_path / "t.json"
    tr.write_text(json.dumps({"utterances": [
        {"speaker": "A", "start": 0, "end": 900, "text": "I'm Zara."}]}))
    assert cli_llm.main(["analyze", str(tr), "--provider", "pattern"]) == 0
    capsys.readouterr()
    assert cli_llm.main(["clear-cache"]) == 0
