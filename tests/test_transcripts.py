"""Transcript parsing parity tests (both STT formats)."""

from sdtk_tpu import transcripts as T

AAI = {
    "utterances": [
        {"speaker": "A", "start": 0, "end": 2000, "text": "hello there"},
        {"speaker": "B", "start": 2100, "end": 4000, "text": "hi"},
        {"speaker": "A", "start": 4500, "end": 9000, "text": "how are you"},
        {"speaker": "A", "start": 9100, "end": 9300, "text": "ok"},  # 0.2s, filtered
    ]
}


def sm_word(content, start, end, speaker=None, typ="word", alt_speaker=None):
    alt = {"content": content}
    if alt_speaker:
        alt["speaker"] = alt_speaker
    item = {"type": typ, "start_time": start, "end_time": end, "alternatives": [alt]}
    if speaker:
        item["speaker"] = speaker
    return item


SM = {
    "results": [
        sm_word("hello", 0.0, 0.5, speaker="S1"),
        sm_word("there", 0.6, 1.0, speaker="S1"),
        sm_word(",", 1.0, 1.0, typ="punctuation"),
        sm_word("hi", 1.2, 1.6, speaker="S2"),
        sm_word("back", 1.7, 2.4, speaker="S2"),
        sm_word("again", 4.0, 4.8, speaker="S1"),
        sm_word("friend", 4.9, 5.6, speaker="S1"),
    ]
}


def test_format_detection():
    assert T.detect_transcript_format(AAI) == "assemblyai"
    assert T.detect_transcript_format(SM) == "speechmatics"
    assert T.detect_transcript_format({"results": []}) == "unknown"
    assert T.detect_transcript_format({"foo": 1}) == "unknown"
    # speechmatics detected via start_time even without alternatives
    assert (
        T.detect_transcript_format({"results": [{"start_time": 0.0}]}) == "speechmatics"
    )


def test_available_speakers():
    assert T.get_available_speakers(AAI) == ["A", "B"]
    assert T.get_available_speakers(SM) == ["S1", "S2"]
    # speaker inside alternatives counts too
    sm2 = {"results": [sm_word("x", 0, 1, alt_speaker="S9")]}
    assert T.get_available_speakers(sm2) == ["S9"]


def test_assemblyai_ms_to_seconds():
    segs = T.extract_segments_as_tuples(AAI, "A")
    assert segs == [(0.0, 2.0), (4.5, 9.0), (9.1, 9.3)]


def test_speechmatics_runlength_grouping():
    segs = T.extract_segments_as_tuples(SM, "S1")
    assert segs == [(0.0, 1.0), (4.0, 5.6)]
    segs2 = T.extract_segments_as_tuples(SM, "S2")
    assert segs2 == [(1.2, 2.4)]


def test_unknown_label_uu():
    sm = {"results": [sm_word("mystery", 0.0, 1.0)]}
    assert T.extract_segments_as_tuples(sm, "UU") == [(0.0, 1.0)]


def test_merge_and_filter():
    # A: (0,2) and (4.5,9) gap 2.5 > max_gap 1.0 → not merged; 0.2s seg dropped
    segs = T.extract_segments_from_transcript(AAI, "A")
    assert [(s["start"], s["end"]) for s in segs] == [(0.0, 2.0), (4.5, 9.0)]
    assert segs[0]["text"] == "hello there"
    # with a big max_gap everything merges, text joins
    segs = T.extract_segments_from_transcript(AAI, "A", max_gap=10.0)
    assert [(s["start"], s["end"]) for s in segs] == [(0.0, 9.0)]
    assert segs[0]["text"] == "hello there how are you"


def test_speechmatics_text_join():
    segs = T.extract_segments_from_transcript(SM, "S1", min_duration=0.1, max_gap=0.1)
    assert segs[0]["text"] == "hello there"
    assert segs[1]["text"] == "again friend"


def test_merge_segments_by_gap():
    segs = [(0.0, 1.0), (1.5, 2.0), (5.0, 6.0)]
    assert T.merge_segments_by_gap(segs, 0.6) == [(0.0, 2.0), (5.0, 6.0)]
    assert T.merge_segments_by_gap(segs, 0.0) == segs
    assert T.merge_segments_by_gap([], 1.0) == []


def test_segments_to_array():
    arr = T.segments_to_array([(0.0, 1.0), (2.0, 3.0)])
    assert arr.shape == (2, 2)
    assert T.segments_to_array([]).shape == (0, 2)
