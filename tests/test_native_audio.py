"""Native C++ audio loader vs Python oracle."""

import numpy as np
import pytest

from sdtk_tpu.utils import audio
from sdtk_tpu.utils.nativelib import get_lib

from conftest import make_wav

pytestmark = pytest.mark.skipif(get_lib() is None, reason="native lib unavailable")


def test_native_decode_matches_python(tmp_path):
    p = make_wav(tmp_path / "t.wav", seconds=2.0, sr=16000, freq=330, seed=1)
    native = audio._load_audio_native(p, 16000)
    assert native is not None
    x_n, sr_n = native
    x_p, sr_p = audio._decode_wav(p)
    x_p = x_p.mean(axis=1)
    assert sr_n == 16000 == sr_p
    np.testing.assert_allclose(x_n, x_p, atol=1e-6)


def test_native_resample_close_to_scipy(tmp_path):
    p = make_wav(tmp_path / "r.wav", seconds=1.0, sr=44100, freq=1000)
    x_n, sr = audio._load_audio_native(p, 16000)
    assert sr == 16000
    assert abs(len(x_n) - 16000) <= 2
    # spectral check: 1 kHz peak survives
    spec = np.abs(np.fft.rfft(x_n * np.hanning(len(x_n))))
    peak_hz = np.argmax(spec) * sr / len(x_n)
    assert abs(peak_hz - 1000) < 10
    # amplitude preserved within a few percent
    assert abs(np.abs(x_n).max() - 0.5) < 0.05


def test_native_corrupt_wav_raises(tmp_path):
    p = tmp_path / "bad.wav"
    p.write_bytes(b"RIFFxxxxWAVEjunkjunkjunk" + b"\x00" * 100)
    with pytest.raises(audio.AudioFormatError):
        audio.load_audio(p)


def test_batch_loader(tmp_path):
    paths = [
        make_wav(tmp_path / f"b{i}.wav", seconds=0.5, sr=16000, freq=200 + 50 * i, seed=i)
        for i in range(6)
    ]
    batch = audio.load_audio_batch(paths, 16000, n_threads=3)
    assert len(batch) == 6
    for i, (p, x) in enumerate(zip(paths, batch)):
        ref, _ = audio.load_audio(p, 16000)
        np.testing.assert_allclose(x, ref, atol=1e-6)


def test_batch_loader_mixed_errors(tmp_path):
    good = make_wav(tmp_path / "g.wav", seconds=0.5)
    # stereo python-fallback case is exercised via a fine file + a 8kHz file
    other = make_wav(tmp_path / "o.wav", seconds=0.5, sr=8000)
    batch = audio.load_audio_batch([good, other], 16000)
    assert len(batch) == 2
    assert abs(len(batch[1]) - 8000) <= 2  # resampled 0.5s → 8000 samples


def test_native_resample_parity_all_ratios(tmp_path):
    """Polyphase table rewrite must stay within 0.5% of scipy across
    down/up/awkward ratios (44.1k/22.05k/48k/8k → 16k)."""
    from sdtk_tpu.utils.audio import load_audio, resample, save_wav

    for sr_in in (44100, 22050, 48000, 8000):
        t = np.arange(int(0.5 * sr_in)) / sr_in
        x = (0.5 * np.sin(2 * np.pi * 440 * t)
             + 0.2 * np.sin(2 * np.pi * 1234 * t)).astype(np.float32)
        p = tmp_path / f"r{sr_in}.wav"
        save_wav(p, x, sr_in)
        y_native, sr = load_audio(p, target_sr=16000)
        assert sr == 16000
        y_scipy = resample(x, sr_in, 16000)
        m = min(len(y_native), len(y_scipy))
        a, b = y_native[200:m - 200], y_scipy[200:m - 200]
        rel = np.max(np.abs(a - b)) / max(np.max(np.abs(b)), 1e-9)
        assert rel < 0.005, (sr_in, rel)


# --- first-party codecs: FLAC + MPEG Layer I (r1 VERDICT item 6) ---------


def test_flac_roundtrip_bit_exact(tmp_path):
    """encode→decode is lossless, MD5-signed, and load_audio dispatches
    on the .flac extension."""
    from sdtk_tpu.utils import flacio

    rng = np.random.default_rng(2)
    t = np.arange(16000) / 16000
    sig = 0.4 * np.sin(2 * np.pi * 330 * t) + 0.05 * rng.standard_normal(16000)
    pcm = np.clip(np.round(sig * 32767), -32768, 32767).astype(np.int16)

    data = flacio.encode(pcm, 16000)
    assert data[:4] == b"fLaC"
    assert len(data) < len(pcm) * 2  # genuinely compresses
    dec, sr, bits = flacio.decode(data)
    assert (sr, bits) == (16000, 16)
    np.testing.assert_array_equal(dec[:, 0], pcm.astype(np.int32))

    p = tmp_path / "x.flac"
    p.write_bytes(data)
    x, sr = audio.load_audio(p, target_sr=16000)
    assert sr == 16000
    np.testing.assert_allclose(x, pcm.astype(np.float32) / 32768.0, atol=2e-5)
    info = audio.probe(p)
    assert info.format == "flac" and abs(info.duration - 1.0) < 1e-6


def test_flac_stereo_roundtrip():
    from sdtk_tpu.utils import flacio

    rng = np.random.default_rng(3)
    st = (rng.integers(-2000, 2000, size=(8000, 2))).astype(np.int16)
    dec, sr, _ = flacio.decode(flacio.encode(st, 22050))
    assert sr == 22050
    np.testing.assert_array_equal(dec, st.astype(np.int32))


def _layer1_snr(sig: np.ndarray, dec: np.ndarray, scan: int = 1000) -> float:
    """Best SNR over decoder-delay alignments (nominal filterbank delay
    is 481 but the prototype-window group delay may shift it slightly)."""
    best = -np.inf
    for d in range(scan):
        n = min(len(dec) - d, len(sig))
        if n < len(sig) // 2:
            break
        err = np.mean((dec[d : d + n] - sig[:n]) ** 2)
        best = max(best, 10 * np.log10(np.mean(sig[:n] ** 2) / (err + 1e-20)))
    return best


def test_mpeg_layer1_roundtrip_snr():
    """First-party Layer I encode → decode keeps speech-band SNR above
    30 dB (Kaiser-prototype filterbank; see utils/mpegaudio.py notes).
    The save_mp3 → load_audio product path (which prefers genuine Layer
    III via the system codec when present) is covered in
    tests/test_syscodec.py."""
    from sdtk_tpu.utils import mpegaudio

    sr = 16000
    t = np.arange(sr * 2) / sr
    sig = (
        0.3 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 700 * t + 1.0)
    ) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    sig = sig.astype(np.float32)
    dec, got_sr = mpegaudio.decode(mpegaudio.encode_layer1(sig, sr, 128))
    assert got_sr == sr
    assert _layer1_snr(sig, dec) > 30.0


def test_mpeg_layer3_rejected_loudly(tmp_path):
    """Real-world Layer III streams must fail with an explicit message,
    never silently decode garbage."""
    from sdtk_tpu.utils.mpegaudio import UnsupportedFormatError, decode

    # minimal Layer III header: sync + MPEG1 + layer 01 + bitrate/rate bits
    frame = bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 412
    with pytest.raises(UnsupportedFormatError, match="Layer III"):
        decode(frame)
    p = tmp_path / "song.mp3"
    p.write_bytes(frame)
    with pytest.raises(audio.AudioFormatError, match="Layer III"):
        audio.load_audio(p)


def test_process_queue_skips_undecodable_with_reason(tmp_path, speakers_dir,
                                                     monkeypatch):
    """Discovery accepts .mp3, but an undecodable (Layer III) file is
    marked `skipped` with the codec's reason — not enqueue-then-fail
    (r1 VERDICT item 6)."""
    monkeypatch.setenv("SPEAKER_DETECTION_BACKEND", "fake")
    from sdtk_tpu.pipeline import process as PR
    from sdtk_tpu.store.queue import ProcessingQueue

    bad = tmp_path / "song.mp3"
    bad.write_bytes(bytes([0xFF, 0xFB, 0x90, 0x00]) + b"\x00" * 412)
    q = ProcessingQueue(tmp_path / "q.yaml")
    item = q.add(bad, backends=["tpu-diarize"])
    results = PR.process_batch([item], queue=q, parallel=1, quiet=True,
                               embed_backend="fake")
    assert not results[0].success and results[0].unsupported_format
    (it,) = q.items()
    assert it["status"] == "skipped"
    assert "Layer III" in it["error"]


def test_flac_roundtrip_awkward_lengths():
    """Bit-exact at block-boundary-straddling and degenerate lengths:
    1 sample, sub-block, exactly-one-block (4096), one-over, prime."""
    from sdtk_tpu.utils import flacio

    rng = np.random.default_rng(7)
    for n in (1, 3, 100, 4095, 4096, 4097, 16001):
        pcm = rng.integers(-32768, 32768, size=n).astype(np.int16)
        dec, sr, bits = flacio.decode(flacio.encode(pcm, 16000))
        assert (sr, bits) == (16000, 16)
        np.testing.assert_array_equal(dec[:, 0], pcm.astype(np.int32), err_msg=f"n={n}")


def test_flac_roundtrip_extremes():
    """Full-scale square, DC, silence, single impulse — all lossless."""
    from sdtk_tpu.utils import flacio

    cases = {
        "fullscale": np.tile(np.array([32767, -32768], np.int16), 2000),
        "dc": np.full(5000, 12345, np.int16),
        "silence": np.zeros(5000, np.int16),
        "impulse": np.zeros(5000, np.int16),
    }
    cases["impulse"][2500] = 32767
    for name, pcm in cases.items():
        dec, _, _ = flacio.decode(flacio.encode(pcm, 16000))
        np.testing.assert_array_equal(dec[:, 0], pcm.astype(np.int32), err_msg=name)


def test_mpeg_layer1_snr_sweep():
    """Round-trip SNR holds across frequencies and levels (quantization
    tracks scalefactors, so quiet signals keep proportional fidelity)."""
    from sdtk_tpu.utils import mpegaudio

    sr = 16000
    t = np.arange(sr) / sr
    for freq in (120.0, 440.0, 1500.0, 3000.0):
        for amp in (0.9, 0.1):
            sig = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
            dec, _ = mpegaudio.decode(mpegaudio.encode_layer1(sig, sr, 128))
            assert _layer1_snr(sig, dec) > 25.0, (freq, amp)


def test_mpeg_layer1_nonmultiple_frame_length():
    """Lengths that are not a multiple of the 384-sample Layer I frame
    round-trip without crashing and preserve duration within one frame."""
    from sdtk_tpu.utils import mpegaudio

    sr = 16000
    for n in (100, 383, 385, 5000):
        sig = (0.3 * np.sin(2 * np.pi * 300 * np.arange(n) / sr)).astype(np.float32)
        dec, _ = mpegaudio.decode(mpegaudio.encode_layer1(sig, sr, 128))
        assert abs(len(dec) - n) <= 384 + 481


def test_mpeg_layer2_roundtrip_snr():
    """First-party Layer II encode → decode at 64 kbps/16 kHz keeps a
    voice-band multitone above 25 dB (Layer II reaches Layer I quality
    at roughly half the bitrate)."""
    from sdtk_tpu.utils import mpegaudio

    sr = 16000
    t = np.arange(sr * 2) / sr
    sig = (
        0.35 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * np.sin(2 * np.pi * 700 * t + 1.0)
    ) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    sig = sig.astype(np.float32)
    dec, got_sr = mpegaudio.decode(mpegaudio.encode_layer2(sig, sr, 64))
    assert got_sr == sr
    assert _layer1_snr(sig, dec) > 25.0


def test_mpeg_layer2_nonmultiple_frame_length():
    """Non-multiple-of-1152 lengths round-trip without crashing."""
    from sdtk_tpu.utils import mpegaudio

    sr = 16000
    for n in (100, 1151, 1153, 5000):
        sig = (0.3 * np.sin(2 * np.pi * 300 * np.arange(n) / sr)).astype(np.float32)
        dec, _ = mpegaudio.decode(mpegaudio.encode_layer2(sig, sr, 64))
        assert abs(len(dec) - n) <= 1152 + 481
