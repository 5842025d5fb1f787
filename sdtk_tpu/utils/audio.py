"""First-party audio IO: decode, resample, slice, encode.

The reference delegates all audio handling to external CLIs — ffmpeg for
segment extraction/concat (speechmatics_backend.py:231-281,
speaker_samples:280-326), ffprobe for duration (speaker-catalog:120-137).
This framework does it in-process: WAV parsing with numpy, polyphase
resampling with scipy, float32 mono output ready for the device frontend.

The canonical device format mirrors the reference's ``AudioProfile`` default
(audio_profiles.py:12-29): 16 kHz mono 16-bit — here held as float32 in
[-1, 1] at 16 kHz.
"""

from __future__ import annotations

import io
import struct
import wave
from dataclasses import dataclass
from pathlib import Path

import numpy as np

TARGET_SR = 16000


@dataclass(frozen=True)
class AudioInfo:
    """Container metadata (the ffprobe replacement)."""

    sample_rate: int
    channels: int
    n_frames: int
    duration: float
    format: str


class AudioFormatError(ValueError):
    pass


def _decode_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Decode a WAV file to float32 (frames, channels) + sample rate.

    Handles PCM 8/16/24/32-bit and IEEE float 32/64 via manual RIFF parsing
    (the stdlib ``wave`` module rejects float WAVs).
    """
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioFormatError(f"not a RIFF/WAVE file: {path}")

    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)
    if fmt is None or payload is None:
        raise AudioFormatError(f"missing fmt/data chunk: {path}")

    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE and len(data) >= 2:  # WAVE_FORMAT_EXTENSIBLE
        audio_format = 1  # assume PCM subformat; float ext is rare for us
    if audio_format == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(payload, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(payload, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(payload, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            raw = np.frombuffer(payload, dtype=np.uint8)
            n = len(raw) // 3
            raw = raw[: n * 3].reshape(n, 3)
            vals = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
            x = vals.astype(np.float32) / float(1 << 23)
        else:
            raise AudioFormatError(f"unsupported PCM bit depth {bits}: {path}")
    elif audio_format == 3:  # IEEE float
        dt = "<f4" if bits == 32 else "<f8"
        x = np.frombuffer(payload, dtype=dt).astype(np.float32)
    else:
        raise AudioFormatError(f"unsupported WAV codec {audio_format}: {path}")

    if channels > 1:
        x = x[: (len(x) // channels) * channels].reshape(-1, channels)
    else:
        x = x.reshape(-1, 1)
    return x, sample_rate


def _decode_flac(path: str | Path) -> tuple[np.ndarray, int]:
    """First-party FLAC decode (utils/flacio.py) -> float32 [T, C] + rate."""
    from .flacio import FlacError, decode

    with open(path, "rb") as f:
        data = f.read()
    try:
        pcm, sr, bits = decode(data)
    except FlacError as e:
        raise AudioFormatError(f"FLAC decode failed for {path}: {e}") from e
    x = pcm.astype(np.float32) / float(1 << (bits - 1))
    return x, sr


def _decode_mpeg(path: str | Path) -> tuple[np.ndarray, int]:
    """MPEG audio decode: first-party codec first (utils/mpegaudio.py),
    then the in-process system codec (libmpg123 via utils/syscodec.py)
    for streams outside the first-party scope.

    Only when BOTH are unable (e.g. a Layer III file on a host without
    libmpg123) does this raise AudioFormatError with the explicit
    unsupported-format reason — which speaker-process turns into a
    skip-with-codec-reason queue entry."""
    from .mpegaudio import UnsupportedFormatError, decode

    with open(path, "rb") as f:
        data = f.read()
    try:
        pcm, sr = decode(data)
        return pcm.astype(np.float32)[:, None], sr
    except UnsupportedFormatError as first_party_err:
        from . import syscodec

        sys_err: Exception | None = None
        if syscodec.mpg123_available():
            try:
                return syscodec.decode_mpeg(data)
            except syscodec.SysCodecError as e:
                sys_err = e  # fall through to the widest (AV) tier
        try:
            return _decode_av(path)
        except AudioFormatError:
            pass
        if sys_err is not None:
            raise AudioFormatError(
                f"{path}: {first_party_err} (system codec also "
                f"failed: {sys_err})"
            ) from sys_err
        raise AudioFormatError(f"{path}: {first_party_err}") from first_party_err


def _decode_av(path: str | Path) -> tuple[np.ndarray, int]:
    """System AV-library decode (utils/avio.py): the in-process stand-in
    for the reference's ffmpeg subprocess tier (speaker-process:52 accepts
    .m4a/.ogg/.opus/.aac/.wma).  Raises the explicit skip-with-codec-reason
    AudioFormatError when the host lacks the ffmpeg shared libraries."""
    from . import avio

    if not avio.available():
        raise AudioFormatError(
            f"cannot decode {path}: requires the system AV libraries "
            f"(libavformat/libavcodec) — {avio.disabled_reason()}"
        )
    try:
        return avio.decode_file(str(path))
    except avio.AvError as e:
        raise AudioFormatError(f"AV decode failed for {path}: {e}") from e


# extension -> decoder producing (float32 [T, C], sample_rate)
_DECODERS = {
    ".wav": _decode_wav,
    ".flac": _decode_flac,
    ".mp3": _decode_mpeg,
    ".mp2": _decode_mpeg,
    ".mpga": _decode_mpeg,
    ".m4a": _decode_av,
    ".aac": _decode_av,
    ".mp4": _decode_av,
    ".ogg": _decode_av,
    ".opus": _decode_av,
    ".wma": _decode_av,
    ".webm": _decode_av,
    ".mka": _decode_av,
}


def probe(path: str | Path) -> AudioInfo:
    """Duration/format metadata (replaces ffprobe, speaker-catalog:120-137)."""
    path = Path(path)
    ext = path.suffix.lower()
    decoder = _DECODERS.get(ext)
    if decoder is None:
        raise AudioFormatError(f"unsupported container: {path.suffix} ({path})")
    x, sr = decoder(path)
    return AudioInfo(sr, x.shape[1], x.shape[0], x.shape[0] / sr, ext[1:])


def _load_audio_native(path: Path, target_sr: int | None) -> tuple[np.ndarray, int] | None:
    """C++ decode+resample (native/audioio.cc); None → use the Python path."""
    import ctypes

    from .nativelib import get_lib

    lib = get_lib()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_float)()
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    rc = lib.sdtk_decode_wav(
        str(path).encode(), int(target_sr or 0), ctypes.byref(data),
        ctypes.byref(n), ctypes.byref(sr),
    )
    if rc != 0:
        if rc == 2:
            raise AudioFormatError(f"unsupported or corrupt WAV: {path}")
        return None
    try:
        x = np.ctypeslib.as_array(data, shape=(n.value,)).copy()
    finally:
        lib.sdtk_free(data)
    return x, sr.value


def load_audio(
    path: str | Path, target_sr: int = TARGET_SR, mono: bool = True
) -> tuple[np.ndarray, int]:
    """Decode → mono mixdown → resample to target rate. Returns (float32, sr).

    Uses the native C++ decoder when built (mono only); falls back to the
    NumPy parser.
    """
    path = Path(path)
    ext = path.suffix.lower()
    decoder = _DECODERS.get(ext)
    if decoder is None:
        raise AudioFormatError(
            f"unsupported container: {path.suffix} — supported: "
            f"{', '.join(sorted(_DECODERS))} (first-party + in-process "
            f"system codecs; no ffmpeg CLI required)"
        )
    if mono and ext == ".wav":
        native = _load_audio_native(path, target_sr)
        if native is not None:
            return native
    x, sr = decoder(path)
    if mono:
        x = x.mean(axis=1)
    if target_sr and sr != target_sr:
        x = resample(x, sr, target_sr)
        sr = target_sr
    return np.ascontiguousarray(x, dtype=np.float32), sr


def load_audio_batch(
    paths: list[str | Path], target_sr: int = TARGET_SR, n_threads: int = 0
) -> list[np.ndarray]:
    """Threaded batch decode (native pool when available) — the host input
    pipeline for data-parallel embedding (SURVEY.md §2.3 DP row)."""
    import ctypes

    from .nativelib import get_lib

    lib = get_lib()
    if lib is None:
        return [load_audio(p, target_sr)[0] for p in paths]

    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    datas = (ctypes.POINTER(ctypes.c_float) * n)()
    lens = (ctypes.c_int64 * n)()
    srs = (ctypes.c_int * n)()
    errs = (ctypes.c_int * n)()
    lib.sdtk_decode_wav_batch(
        c_paths, n, int(target_sr or 0), int(n_threads), datas, lens, srs, errs
    )
    out: list[np.ndarray] = []
    for i in range(n):
        if errs[i] != 0:
            out.append(load_audio(paths[i], target_sr)[0])  # python fallback
            continue
        try:
            out.append(np.ctypeslib.as_array(datas[i], shape=(lens[i],)).copy())
        finally:
            lib.sdtk_free(datas[i])
    return out


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling (the ffmpeg -ar replacement)."""
    if sr_in == sr_out:
        return x
    from math import gcd

    from scipy.signal import resample_poly

    g = gcd(sr_in, sr_out)
    return resample_poly(x, sr_out // g, sr_in // g).astype(np.float32)


def slice_segments(
    x: np.ndarray, sr: int, segments: list[tuple[float, float]]
) -> np.ndarray:
    """Concatenate [start, end) second-ranges of a waveform — the in-process
    equivalent of the reference's ffmpeg atrim+concat filter graph
    (speechmatics_backend.py:231-281)."""
    parts = []
    n = len(x)
    for start, end in segments:
        a = max(0, int(round(start * sr)))
        b = min(n, int(round(end * sr)))
        if b > a:
            parts.append(x[a:b])
    if not parts:
        return np.zeros(0, dtype=np.float32)
    return np.concatenate(parts)


def save_wav(path: str | Path, x: np.ndarray, sr: int = TARGET_SR) -> None:
    """Write float32 [-1,1] mono/stereo to 16-bit PCM WAV."""
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    pcm = (np.clip(x, -1.0, 1.0) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(x.shape[1])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    from .ioutil import atomic_write_bytes

    atomic_write_bytes(path, buf.getvalue())


def save_mp3(path: str | Path, x: np.ndarray, sr: int = TARGET_SR,
             bitrate_kbps: int = 128) -> None:
    """Write float32 [-1,1] mono as ``.mp3`` — the in-process stand-in for
    the reference's ffmpeg mp3 sample encode (speaker_samples:280-326).

    Prefers a genuine, universally interoperable MPEG Layer III stream
    via the in-process system encoder (libmp3lame, utils/syscodec.py);
    falls back to the first-party MPEG Layer I encoder
    (utils/mpegaudio.py) when the system library is absent."""
    from .ioutil import atomic_write_bytes
    from . import syscodec

    if syscodec.lame_available():
        try:
            atomic_write_bytes(
                path, syscodec.encode_mp3(np.asarray(x), sr, bitrate_kbps)
            )
            return
        except syscodec.SysCodecError:
            pass  # fall through to the first-party encoder
    from .mpegaudio import encode_layer2

    atomic_write_bytes(path, encode_layer2(np.asarray(x), sr, bitrate_kbps))


def save_flac(path: str | Path, x: np.ndarray, sr: int = TARGET_SR) -> None:
    """Write float32 [-1,1] (mono/stereo) losslessly as FLAC
    (utils/flacio.py; 16-bit)."""
    from .flacio import encode
    from .ioutil import atomic_write_bytes

    atomic_write_bytes(path, encode(np.asarray(x), sr, 16))
