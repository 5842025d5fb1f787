"""First-party jq-subset engine (replaces the reference's jq subprocess,
speaker_detection:705-728 / speaker-catalog:655-688)."""

import pytest

from sdtk_tpu.utils.jqlite import JqError, query, query_lines

DATA = [
    {"id": "alice", "names": {"default": "Alice"}, "tags": ["eng", "lead"],
     "score": 0.9, "active": True},
    {"id": "bob", "names": {"default": "Bob"}, "tags": ["eng"],
     "score": 0.4, "active": False},
    {"id": "carol", "names": {"default": "Carol"}, "tags": [],
     "score": 0.7, "active": True},
]


def test_identity_and_paths():
    assert query(".", DATA) == [DATA]
    assert query(".[].id", DATA) == ["alice", "bob", "carol"]
    assert query(".[] | .names.default", DATA) == ["Alice", "Bob", "Carol"]
    assert query(".[].missing", DATA) == [None, None, None]
    assert query(".[].missing?", DATA) == [None, None, None]


def test_select_filters():
    assert query('.[] | select(.id == "bob") | .score', DATA) == [0.4]
    assert query(".[] | select(.score > 0.5) | .id", DATA) == ["alice", "carol"]
    assert query(".[] | select(.active) | .id", DATA) == ["alice", "carol"]
    assert query(
        '.[] | select(.active and .score >= 0.9) | .id', DATA) == ["alice"]
    assert query(
        '.[] | select(.id == "bob" or .id == "carol") | .id', DATA
    ) == ["bob", "carol"]


def test_length_keys_iteration():
    assert query("length", DATA) == [3]
    assert query(".[] | .tags | length", DATA) == [2, 1, 0]
    assert query(".[] | keys", DATA)[0] == ["active", "id", "names", "score", "tags"]
    assert query(".[].tags[]", DATA) == ["eng", "lead", "eng"]


def test_object_construction():
    out = query('.[] | {id: .id, name: .names.default}', DATA)
    assert out[0] == {"id": "alice", "name": "Alice"}
    assert len(out) == 3


def test_lines_output_and_errors():
    assert query_lines(".[].id", DATA).splitlines() == ['"alice"', '"bob"', '"carol"']
    with pytest.raises(JqError):
        query("reduce .[] as $x (0; .+1)", DATA)  # unsupported → explicit error


def test_cli_query_wired(speakers_dir, capsys):
    from sdtk_tpu.cli import detection as cli_det

    assert cli_det.main(["add", "zoe", "--name", "Zoe", "--tag", "host"]) == 0
    capsys.readouterr()
    assert cli_det.main(["query", '.[] | select(.id == "zoe") | .names.default']) == 0
    assert capsys.readouterr().out.strip() == '"Zoe"'
    assert cli_det.main(["query", "reduce .[] as $x (0; .+1)"]) == 1
