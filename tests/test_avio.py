"""Tests for the in-process system AV codec tier (utils/avio.py).

The AV tier replaces the reference's ffmpeg-subprocess handling of
.m4a/.ogg/.opus/.aac/.wma (reference speaker-process:52,
speechmatics_backend.py:231-281) with ctypes calls into the ffmpeg
shared libraries, every ABI assumption probe-verified.  These tests
exercise availability reporting, decode of a known file, and encode
round-trips — skipping (never failing) on hosts without the libraries,
mirroring the reference's tolerate-missing-tool discipline.
"""

from __future__ import annotations

import numpy as np
import pytest

from sdtk_tpu.utils import audio, avio


def _tone(sr: int, seconds: float = 0.5, hz: float = 440.0) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    return (0.3 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_disabled_reason_contract():
    # Exactly one of (available, disabled_reason) is truthy.
    if avio.available():
        assert avio.disabled_reason() is None
    else:
        reason = avio.disabled_reason()
        assert isinstance(reason, str) and reason


def test_unavailable_paths_raise_averror_with_reason(tmp_path):
    if avio.available():
        pytest.skip("AV libraries available on this host")
    with pytest.raises(avio.AvError):
        avio.decode_file(str(tmp_path / "x.m4a"))
    with pytest.raises(avio.AvError):
        avio.encode_file(str(tmp_path / "x.m4a"), _tone(16000), 16000)


@pytest.mark.skipif(not avio.available(), reason="AV libraries absent")
def test_decode_known_wav_bit_exact(tmp_path):
    sr = 16000
    x = _tone(sr)
    p = tmp_path / "tone.wav"
    audio.save_wav(p, x, sr)
    decoded, got_sr = avio.decode_file(str(p))
    assert got_sr == sr
    assert decoded.shape == (len(x), 1)
    # save_wav quantizes to int16; the decode must match that quantization
    expected = (np.clip(x, -1, 1) * 32767.0).astype(np.int16) / 32768.0
    assert float(np.abs(decoded[:, 0] - expected.astype(np.float32)).max()) < 1e-6


@pytest.mark.skipif(not avio.available(), reason="AV libraries absent")
def test_version_info_populated():
    info = avio.version_info()
    assert info.get("avformat", 0) > 0 and info.get("avcodec", 0) > 0


@pytest.mark.parametrize("ext", [".m4a", ".ogg", ".opus", ".wma"])
def test_encode_roundtrip(tmp_path, ext):
    if not avio.available():
        pytest.skip("AV libraries absent")
    if not avio.can_encode(ext):
        pytest.skip(f"no verified encoder for {ext} on this host")
    sr = 16000
    x = _tone(sr, seconds=1.0)
    p = tmp_path / f"tone{ext}"
    avio.encode_file(str(p), x, sr, bitrate_kbps=96)
    assert p.stat().st_size > 200
    decoded, got_sr = avio.decode_file(str(p))
    assert got_sr > 0 and decoded.shape[0] > sr // 2
    # lossy codecs: require the energy to survive, not the bits
    rms_in = float(np.sqrt(np.mean(x**2)))
    rms_out = float(np.sqrt(np.mean(decoded[:, 0] ** 2)))
    assert 0.3 * rms_in < rms_out < 3.0 * rms_in


@pytest.mark.skipif(not avio.available(), reason="AV libraries absent")
def test_load_audio_av_extension(tmp_path):
    """load_audio routes AV-tier extensions through avio and lands on the
    canonical 16 kHz mono float32 contract."""
    enc_ext = next(
        (e for e in (".m4a", ".ogg", ".opus") if avio.can_encode(e)), None
    )
    if enc_ext is None:
        pytest.skip("no verified encoder on this host")
    sr = 16000
    p = tmp_path / f"tone{enc_ext}"
    avio.encode_file(str(p), _tone(sr, seconds=1.0), sr)
    x, got_sr = audio.load_audio(p)
    assert got_sr == audio.TARGET_SR
    assert x.dtype == np.float32 and x.ndim == 1 and len(x) > sr // 2


@pytest.mark.skipif(not avio.available(), reason="AV libraries absent")
def test_concurrent_decodes(tmp_path):
    """Decodes run without the old module-global lock; hammer the path from
    several threads to shake out context-sharing bugs."""
    from concurrent.futures import ThreadPoolExecutor

    sr = 16000
    paths = []
    for i in range(6):
        p = tmp_path / f"t{i}.wav"
        audio.save_wav(p, _tone(sr, seconds=0.3, hz=300.0 + 50 * i), sr)
        paths.append(str(p))
    with ThreadPoolExecutor(max_workers=4) as pool:
        results = list(pool.map(avio.decode_file, paths * 3))
    for decoded, got_sr in results:
        assert got_sr == sr and decoded.shape[0] == int(sr * 0.3)
