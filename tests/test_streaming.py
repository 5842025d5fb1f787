"""Streaming diarizer: chunked feeding, incremental assignment, finalize,
online enrollment."""

import numpy as np
import pytest

from sdtk_tpu.pipeline.streaming import OnlineDiarizer, StreamingConfig


def two_speaker_stream():
    from sdtk_tpu.data.synth import synth_utterance

    # A(0-4s) B(4-8s) A(8-12s)
    return np.concatenate(
        [
            synth_utterance(0, 1, 4.0),
            synth_utterance(1, 2, 4.0),
            synth_utterance(0, 3, 4.0),
        ]
    )


def test_streaming_two_speakers(speakers_dir):
    wav = two_speaker_stream()
    d = OnlineDiarizer("fake", StreamingConfig(new_speaker_threshold=0.5))
    events = []
    # feed in uneven chunks (0.3 s to 1.7 s)
    rng = np.random.default_rng(0)
    pos = 0
    while pos < len(wav):
        n = int(rng.uniform(0.3, 1.7) * 16000)
        events += d.feed(wav[pos : pos + n])
        pos += n
    assert events, "no live events emitted"
    # events are causal and labeled
    assert all(e["speaker"].startswith("S") for e in events)

    result = d.finalize()
    assert result["n_speakers"] == 2
    segs = result["segments"]
    # first and last segments share a speaker (A returns), middle differs
    assert segs[0][2] == segs[-1][2]
    assert any(s[2] != segs[0][2] for s in segs)


def test_streaming_online_enrollment(speakers_dir):
    from sdtk_tpu.store import profiles as P

    wav = two_speaker_stream()
    d = OnlineDiarizer("fake")
    d.feed(wav)
    d.finalize()
    created = d.enroll_discovered(min_windows=3)
    assert len(created) == 2
    for sid in created:
        prof = P.load_speaker(sid)
        assert prof and prof["embeddings"]["fake"]

    # the enrolled profiles can now identify the same voices
    pm = P.ProfileMatrix.build("fake")
    assert len(pm) == 2


def test_streaming_empty_and_silence(speakers_dir):
    d = OnlineDiarizer("fake")
    assert d.feed(np.zeros(0, np.float32)) == []
    events = d.feed(np.zeros(32000, np.float32))
    # all-silence stream: VAD keeps the first (peak-defining) window at most
    assert len(events) <= 1
    out = d.finalize()
    assert out["n_speakers"] <= 1
