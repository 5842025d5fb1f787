"""First-party audio IO tests (WAV decode, resample, slice)."""

import numpy as np
import pytest

from sdtk_tpu.utils import audio

from conftest import make_wav


def test_wav_roundtrip(tmp_path):
    sr = 16000
    t = np.arange(sr) / sr
    x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = tmp_path / "tone.wav"
    audio.save_wav(p, x, sr)
    y, sr2 = audio.load_audio(p)
    assert sr2 == sr
    assert y.shape == x.shape
    assert np.max(np.abs(y - x)) < 1e-3  # 16-bit quantization


def test_probe(tmp_path):
    p = make_wav(tmp_path / "a.wav", seconds=2.5, sr=8000)
    info = audio.probe(p)
    assert info.sample_rate == 8000
    assert abs(info.duration - 2.5) < 1e-6
    assert info.channels == 1


def test_resample_on_load(tmp_path):
    p = make_wav(tmp_path / "b.wav", seconds=1.0, sr=44100, freq=1000)
    y, sr = audio.load_audio(p, target_sr=16000)
    assert sr == 16000
    assert abs(len(y) - 16000) <= 2
    # 1 kHz tone survives resampling: dominant FFT bin near 1000 Hz
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak_hz = np.argmax(spec) * sr / len(y)
    assert abs(peak_hz - 1000) < 10


def test_stereo_mixdown(tmp_path):
    import wave

    sr = 16000
    left = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr) * 32767).astype("<i2")
    right = np.zeros(sr, dtype="<i2")
    inter = np.empty(2 * sr, dtype="<i2")
    inter[0::2], inter[1::2] = left, right
    p = tmp_path / "st.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(inter.tobytes())
    y, _ = audio.load_audio(p)
    assert y.ndim == 1
    assert abs(np.max(np.abs(y)) - 0.25) < 0.01  # mixdown halves amplitude


def test_slice_segments():
    sr = 100
    x = np.arange(1000, dtype=np.float32)
    out = audio.slice_segments(x, sr, [(0.0, 1.0), (5.0, 6.0)])
    assert len(out) == 200
    assert out[0] == 0 and out[100] == 500
    # out-of-range clamped, empty ok
    assert len(audio.slice_segments(x, sr, [(9.5, 20.0)])) == 50
    assert len(audio.slice_segments(x, sr, [])) == 0


def test_unsupported_format(tmp_path):
    p = tmp_path / "x.mp3"
    p.write_bytes(b"\xff\xfb junk")
    with pytest.raises(audio.AudioFormatError):
        audio.load_audio(p)


def test_float32_wav(tmp_path):
    import struct

    sr = 8000
    x = (0.25 * np.sin(2 * np.pi * 200 * np.arange(sr) / sr)).astype("<f4")
    payload = x.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32)
    dat = b"data" + struct.pack("<I", len(payload)) + payload
    p = tmp_path / "f32.wav"
    p.write_bytes(hdr + fmt + dat)
    y, sr2 = audio.load_audio(p, target_sr=None)
    assert sr2 == sr
    assert np.allclose(y, x, atol=1e-6)
