"""Recursive speaker-mapper (reference test_stt_assemblyai_speaker_mapper.py
contract)."""

import json

from sdtk_tpu.transcripts.mapper import (
    apply_assignments_to_transcript,
    detect_speakers_in_json,
    mapping_from_assignments,
    replace_speakers_recursive,
)


def test_detect_simple():
    obj = {"utterances": [{"speaker": "A", "text": "Hello"},
                          {"speaker": "B", "text": "Hi"},
                          {"speaker": "A", "text": "How are you?"}]}
    assert detect_speakers_in_json(obj) == {"A", "B"}


def test_detect_nested_only_speaker_keys():
    obj = {"data": {"segments": [{"speaker": "X"}, {"speaker": "Y"}],
                    "metadata": {"primary_speaker": "Z"}}}
    assert detect_speakers_in_json(obj) == {"X", "Y"}


def test_detect_deep_and_multiple_lists():
    obj = {"l1": {"l2": {"l3": [{"speaker": "A"}, {"speaker": "B"}]}},
           "section2": [{"speaker": "C"}]}
    assert detect_speakers_in_json(obj) == {"A", "B", "C"}


def test_detect_none():
    assert detect_speakers_in_json({"text": "x", "confidence": 0.9}) == set()


def test_replace_recursive_and_words():
    obj = {"utterances": [{"speaker": "A", "text": "Hello world",
                           "words": [{"text": "Hello", "speaker": "A"},
                                     {"text": "world", "speaker": "A"}]}]}
    out = replace_speakers_recursive(obj, {"A": "Alice"})
    assert out["utterances"][0]["speaker"] == "Alice"
    assert out["utterances"][0]["words"][1]["speaker"] == "Alice"
    # original untouched, unknown labels kept
    assert obj["utterances"][0]["speaker"] == "A"
    out2 = replace_speakers_recursive(obj, {"Z": "Nobody"})
    assert out2["utterances"][0]["speaker"] == "A"


def test_mapping_from_assignments(speakers_dir):
    from sdtk_tpu.store.profiles import create_speaker_profile, save_speaker

    save_speaker(create_speaker_profile("alice", "Alice Smith"))
    assignments = {"mappings": {
        "S1": {"speaker_id": "alice"},
        "S2": {"speaker_id": None},
        "S3": {"speaker_id": "ghost"},  # no profile → id passthrough
    }}
    m = mapping_from_assignments(assignments)
    assert m == {"S1": "Alice Smith", "S3": "ghost"}
    assert mapping_from_assignments(assignments, use_names=False)["S1"] == "alice"


def test_apply_to_file(speakers_dir, tmp_path):
    from sdtk_tpu.store.profiles import create_speaker_profile, save_speaker

    save_speaker(create_speaker_profile("bob", "Bob"))
    tr = tmp_path / "t.json"
    tr.write_text(json.dumps({"utterances": [{"speaker": "S1", "text": "yo"}]}))
    out = tmp_path / "mapped.json"
    mapped = apply_assignments_to_transcript(
        tr, {"mappings": {"S1": {"speaker_id": "bob"}}}, output_path=out
    )
    assert mapped["utterances"][0]["speaker"] == "Bob"
    assert json.loads(out.read_text())["utterances"][0]["speaker"] == "Bob"


def test_mapper_benchmark_pattern_provider(tmp_path, monkeypatch):
    """The 7-scenario mapper benchmark passes 7/7 with the offline pattern
    provider (reference gpt-4o-mini scored 100%, local LLMs 0% —
    benchmark.FINDINGS.md:19-31)."""
    import sys
    from pathlib import Path

    monkeypatch.setenv("SPEAKER_LLM_CACHE_DIR", str(tmp_path / "cache"))
    repo = Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo / "evals"))
    try:
        import benchmark_mapper
    finally:
        sys.path.pop(0)
    rc = benchmark_mapper.main(["--format", "json"])
    assert rc == 0
