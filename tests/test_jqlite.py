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
    assert query("reduce .[] as $x (0; .+1)", DATA) == [3]


SEGS = [
    {"start": 1.25, "end": 3.75, "status": "transcribed",
     "tags": ["podcast", "x"], "trust_level": "low", "speaker_id": "a"},
    {"start": 4.0, "end": 9.0, "status": "new", "tags": [],
     "trust_level": "high", "speaker_id": "b"},
]


def test_arithmetic_and_builtin_math():
    assert query(".[] | .end - .start", SEGS) == [2.5, 5.0]
    assert query(".[] | .end - .start | floor", SEGS) == [2, 5]
    assert query("[.[].start] | add", SEGS) == [5.25]
    assert query(".[0].start * 2", SEGS) == [2.5]
    assert query("10 % 3", None) == [1]
    assert query("-.[0].start", SEGS) == [-1.25]


def test_string_interpolation():
    # The reference's documented pattern (speaker_segments.README.md:155).
    out = query(r'.[] | "[\(.start)s - \(.end)s] dur: \(.end - .start | floor)s"',
                SEGS)
    assert out == ["[1.25s - 3.75s] dur: 2s", "[4.0s - 9.0s] dur: 5s"]
    assert query('"a" + "b"', None) == ["ab"]


def test_contains_and_pipe_inside_select():
    # speaker_detection.README.md:146 pattern.
    assert query('.[] | select(.tags | contains(["podcast"])) | .speaker_id',
                 SEGS) == ["a"]
    assert query('"podcast-hosts" | contains("host")', None) == [True]


def test_map_select_chain():
    # speaker-report.README.md:413 pattern.
    out = query('map(select(.trust_level != "high")) | map(.speaker_id)', SEGS)
    assert out == [["a"]]


def test_sort_group_unique():
    assert query("sort_by(.start) | reverse | .[0].speaker_id", SEGS) == ["b"]
    out = query("group_by(.status) | map({status: .[0].status, count: length})",
                SEGS)
    assert out == [[{"status": "new", "count": 1},
                    {"status": "transcribed", "count": 1}]]
    assert query("unique", [3, 1, 3, 2]) == [[1, 2, 3]]
    assert query("unique_by(.trust_level) | length", SEGS) == [2]
    assert query("min, max", [[3, 1, 2]][0]) == [1, 3]


def test_comma_alternative_slices():
    assert query(".[] | .speaker_id, .status", SEGS) == [
        "a", "transcribed", "b", "new"]
    assert query('.[] | .missing // "dflt"', SEGS) == ["dflt", "dflt"]
    assert query(".[0:1] | length", SEGS) == [1]
    assert query(".[-1].speaker_id", SEGS) == ["b"]
    assert query('"abcdef" | .[1:3]', None) == ["bc"]


def test_object_shorthand_and_expr_values():
    out = query(".[] | {speaker_id, s: (.start + 1)}", SEGS)
    assert out[0] == {"speaker_id": "a", "s": 2.25}


def test_reserved_words_as_field_names():
    # jq allows .end / .and / .not in key position.
    assert query(".[0].end", SEGS) == [3.75]
    assert query(".[] | select(.end > 4) | .speaker_id", SEGS) == ["b"]


def test_any_all_has_entries():
    assert query('any(.[]; .status == "new")', SEGS) == [True]
    assert query('all(.[]; .status == "new")', SEGS) == [False]
    assert query('.[] | has("tags")', SEGS) == [True, True]
    assert query("to_entries | from_entries", {"a": 1}) == [{"a": 1}]
    assert query('{"a": 1} | keys', None) == [["a"]]


def test_strings_and_conversions():
    assert query('"A,B" | split(",") | join("-")', None) == ["A-B"]
    assert query('"HostX" | ascii_downcase | startswith("host")', None) == [True]
    assert query(".[0].start | tostring", SEGS) == ["1.25"]
    assert query('"42" | tonumber', None) == [42]
    assert query(".[0] | type", SEGS) == ["object"]
    assert query('"\\u0041"', None) == ["A"]


def test_flatten_range_first_last():
    assert query("flatten", [[1, [2, [3]]]][0] if False else [1, [2, [3]]]) \
        == [[1, 2, 3]]
    assert query("[range(3)]", None) == [[0, 1, 2]]
    assert query("first, last", [[5, 6, 7]][0]) == [5, 7]


def test_jq_total_order():
    # null < false < true < numbers < strings
    assert query("sort", [["b", 1, None, True, False]][0]) == [
        [None, False, True, 1, "b"]]


def test_unsupported_fails_loudly():
    for bad in ("$undefined_var", ".a = 3", ".a |= 3", "..",
                "@base64", "nosuchfn(.)", ". as [$a] | $a"):
        with pytest.raises(JqError):
            query(bad, SEGS)


def test_variables_if_reduce_foreach():
    """The jq constructs the reference's ad-hoc workflows lean on
    (r2 VERDICT weak #6): bindings, conditionals, folds."""
    assert query("if .[0].start > 1 then \"late\" else \"early\" end",
                 SEGS) == ["late"]
    assert query("if false then 1 end", {"a": 1}) == [{"a": 1}]  # default else
    assert query("if .x then 1 elif .y then 2 else 3 end",
                 {"y": True}) == [2]
    assert query(". as $all | .[0].end - $all[0].start", SEGS) == [2.5]
    assert query(".[] as $s | $s.trust_level", SEGS) == ["low", "high"]
    assert query("reduce .[] as $s (0; . + ($s.end - $s.start))",
                 SEGS) == [7.5]
    assert query("reduce .[] as $x (0; if $x > . then $x else . end)",
                 [3, 9, 4]) == [9]
    assert query("foreach .[] as $x (0; . + $x)", [1, 2, 3]) == [1, 3, 6]
    assert query("foreach .[] as $x (0; . + $x; . * 10)",
                 [1, 2, 3]) == [10, 30, 60]
    assert query("(1, 2) as $x | $x * 10", None) == [10, 20]
    # keyword-named FIELDS still work (.end is a field, `. as` a binding)
    assert query(".[] | .end", SEGS) == [3.75, 9.0]


def test_optional_suppresses_type_errors():
    with pytest.raises(JqError):
        query(".x[]", {"x": 3})
    assert query(".x[]?", {"x": 3}) == []
    assert query(".x?", 3) == []


def test_cli_query_wired(speakers_dir, capsys):
    from sdtk_tpu.cli import detection as cli_det

    assert cli_det.main(["add", "zoe", "--name", "Zoe", "--tag", "host"]) == 0
    capsys.readouterr()
    assert cli_det.main(["query", '.[] | select(.id == "zoe") | .names.default']) == 0
    assert capsys.readouterr().out.strip() == '"Zoe"'
    capsys.readouterr()
    assert cli_det.main(["query", "reduce .[] as $x (0; .+1)"]) == 0
    assert capsys.readouterr().out.strip() == "1"  # one profile counted
    assert cli_det.main(["query", ".a = 3"]) == 1  # assignment stays loud


def test_def_user_functions():
    """r4 VERDICT #9: ``def`` — zero-arg, filter params, $-params,
    recursion, builtin shadowing, mid-pipe defs (jq semantics; the jq
    binary the reference assumes accepts all of these)."""
    assert query("def double: . * 2; double", 21) == [42]
    assert query("def double: . * 2; [.[] | double]", [1, 2]) == [[2, 4]]
    # filter param = call-site closure
    assert query("def apply(f): [.[] | f]; apply(. + 1)", [1, 2]) == [[2, 3]]
    # $-param evaluates the arg stream at the call site
    assert query("def addn($n): . + $n; addn(10)", 5) == [15]
    assert query("def addn($n): . + $n; addn(1, 2)", 5) == [6, 7]
    # recursion
    assert query(
        "def fact: if . <= 1 then 1 else . * (. - 1 | fact) end; fact",
        5) == [120]
    # defs shadow builtins at matching arity
    assert query("def length: 99; length", [1, 2, 3]) == [99]
    # mid-pipe def scopes over the remainder
    assert query(".x | def inc: . + 1; inc | inc", {"x": 1}) == [3]
    # same name, different arity = different functions (jq semantics)
    assert query("def f: 1; def f(g): g + 1; f + f(10)", None) == [12]


def test_try_catch():
    assert query("try .x[]", {"x": 3}) == []
    assert query('try error("boom") catch .', None) == ["boom"]
    assert query("try (1, 2)", None) == [1, 2]
    assert query('try (.a + 1) catch "bad"', {"a": "s"}) == ["bad"]


def test_regex_test_match_capture():
    """r4 VERDICT #9: the regex builtins the jq binary provides."""
    assert query('test("^S[0-9]+$")', "S12") == [True]
    assert query('test("^s"; "i")', "S12") == [True]
    assert query('test("^s")', "S12") == [False]
    m = query('match("l+")', "hello")[0]
    assert (m["offset"], m["length"], m["string"]) == (2, 2, "ll")
    assert m["captures"] == []
    # global flag yields every match
    assert [m["string"] for m in query('match("[0-9]+"; "g")',
                                       "a1 b22 c333")] == ["1", "22", "333"]
    # named captures, jq (?<name>) spelling
    m = query('match("(?<num>[0-9]+)")', "spk42")[0]
    assert m["captures"][0]["name"] == "num"
    assert m["captures"][0]["string"] == "42"
    assert query('capture("(?<id>S[0-9]+)") | .id', "label S7 end") == ["S7"]
    assert query('[scan("[0-9]+")]', "a1 b22") == [["1", "22"]]
    assert query('[splits("[, ]+")]', "a, b,c") == [["a", "b", "c"]]
    assert query('split("[, ]+"; "")', "a, b,c") == [["a", "b", "c"]]
    assert query('sub("[0-9]+"; "N")', "a1 b2") == ["aN b2"]
    assert query('gsub("[0-9]+"; "N")', "a1 b2") == ["aN bN"]
    # replacement sees the capture object
    assert query('gsub("(?<d>[0-9])"; "<\\(.d)>")', "a1b2") == ["a<1>b<2>"]
    with pytest.raises(JqError):
        query('test("(")', "x")  # invalid regex stays loud
    with pytest.raises(JqError):
        query('test("a"; "q")', "x")  # bad modifier stays loud
    with pytest.raises(JqError):
        query('test("a")', 3)  # non-string input stays loud
