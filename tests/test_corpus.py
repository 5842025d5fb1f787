"""Real-corpus readiness: wav+RTTM manifest loading and the --corpus eval
path, exercised against a synthesized 2-recording fixture corpus."""

from __future__ import annotations

import json
import subprocess
import sys
import wave
from pathlib import Path

import numpy as np
import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent

from sdtk_tpu.data.corpus import parse_rttm, scan_corpus  # noqa: E402


def _write_wav(path: Path, wav: np.ndarray, sr: int = 16000) -> None:
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes((np.clip(wav, -1, 1) * 32767).astype(np.int16).tobytes())


def _voice(freq: float, seconds: float, sr: int = 16000) -> np.ndarray:
    t = np.arange(int(seconds * sr)) / sr
    x = sum((0.5 / (k + 1)) * np.sin(2 * np.pi * freq * (k + 1) * t)
            for k in range(4))
    return (0.4 * x / np.max(np.abs(x))).astype(np.float32)


@pytest.fixture
def fixture_corpus(tmp_path):
    """AMI-layout corpus: audio/ and rttm/ subtrees paired by stem."""
    rng = np.random.default_rng(0)
    (tmp_path / "audio").mkdir()
    (tmp_path / "rttm").mkdir()
    for rec, (f1, f2) in (("meet_a", (220, 520)), ("meet_b", (330, 640))):
        a, b = _voice(f1, 4), _voice(f2, 4)
        wav = np.concatenate([a, b, a])
        wav += 0.004 * rng.standard_normal(len(wav)).astype(np.float32)
        _write_wav(tmp_path / "audio" / f"{rec}.wav", wav)
        (tmp_path / "rttm" / f"{rec}.rttm").write_text(
            f";; reference for {rec}\n"
            f"SPEAKER {rec} 1 0.000 4.000 <NA> <NA> alice <NA> <NA>\n"
            f"SPEAKER {rec} 1 4.000 4.000 <NA> <NA> bob <NA> <NA>\n"
            f"SPEAKER {rec} 1 8.000 4.000 <NA> <NA> alice <NA> <NA>\n"
        )
    # an unpaired wav must be skipped, not fail the scan
    _write_wav(tmp_path / "audio" / "orphan.wav", _voice(200, 1))
    return tmp_path


def test_parse_rttm():
    import textwrap

    p = Path(__import__("tempfile").mkdtemp()) / "x.rttm"
    p.write_text(textwrap.dedent("""\
        ;; comment
        SPEAKER rec 1 0.50 2.00 <NA> <NA> spk1 <NA> <NA>
        LEXEME rec 1 0.50 0.10 hello lex spk1 0.9
        SPEAKER rec 1 2.50 1.50 <NA> <NA> spk2 <NA>
        SPEAKER rec 1 9.00 0.00 <NA> <NA> spk1 <NA> <NA>
    """))
    segs = parse_rttm(p)
    assert segs == [(0.5, 2.5, "spk1"), (2.5, 4.0, "spk2")]


def test_parse_rttm_malformed():
    p = Path(__import__("tempfile").mkdtemp()) / "bad.rttm"
    p.write_text("SPEAKER rec 1 0.5\n")
    with pytest.raises(ValueError, match="malformed"):
        parse_rttm(p)


def test_scan_corpus(fixture_corpus, capsys):
    entries = scan_corpus(fixture_corpus)
    assert [e.recording_id for e in entries] == ["meet_a", "meet_b"]
    assert all(e.wav.exists() and e.rttm.exists() for e in entries)
    assert "orphan" in capsys.readouterr().err


def test_benchmark_der_corpus_mode(fixture_corpus):
    """The eval driver runs a real-corpus directory unchanged the moment
    one exists (VERDICT r3 missing #5)."""
    res = subprocess.run(
        [sys.executable, str(REPO_ROOT / "evals" / "benchmark_der.py"),
         "--corpus", str(fixture_corpus), "--backend", "fake",
         # tone fixtures: the trained VAD rightly rejects harmonic tones
         # as non-speech, so pin the energy gate (this test pins the
         # corpus plumbing, not the VAD)
         "--vad", "energy"],
        capture_output=True, text=True, cwd=str(REPO_ROOT),
    )
    assert res.returncode == 0, res.stderr[-2000:]
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["meetings"] == 2
    assert set(out["per_recording_der"]) == {"meet_a", "meet_b"}
    # the fake backend separates synthetic tones cleanly
    assert out["mean_der"] < 0.3, out
