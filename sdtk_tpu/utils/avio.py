"""In-process system AV codec tier (libavformat/libavcodec via ctypes).

The reference toolkit accepts eight audio extensions and hands every one
of them to an external ``ffmpeg`` subprocess (reference speaker-process:52
discovers .wav/.mp3/.flac/.m4a/.ogg/.opus/.aac/.wma; sample extraction
speechmatics_backend.py:231-281 shells out per segment).  This framework
decodes WAV/FLAC/MPEG first-party (utils/{audio,flacio,mpegaudio}.py) and
Layer III via libmpg123 (utils/syscodec.py); this module is the widest
tier below those: when the host has the ffmpeg *shared libraries* (no CLI
needed), every remaining real-world container/codec — M4A/AAC, Ogg/Vorbis,
Opus, WMA, and anything else libavformat demuxes — decodes in-process, and
review samples can be written back in those same formats.

Why ctypes and not a compiled shim: the environment ships the ffmpeg
``.so`` files but not their headers, and ffmpeg's public structs are NOT
ABI-stable across major versions.  So this module never hardcodes a
volatile struct layout.  It uses three classes of access:

1. **Opaque API calls only** wherever possible (open/decode/encode loops).
2. **Decade-stable struct prefixes** (AVPacket.{pts,dts,stream_index},
   AVFrame.{data,linesize,extended_data,nb_samples,format,pts},
   AVFormatContext.{pb,nb_streams,streams}) — each one end-to-end
   *verified* during the probe below before anything trusts it.
3. **Runtime-probed offsets** for everything else: AVCodecContext field
   offsets come from the library's own AVOption table (name → offset);
   AVStream.codecpar and the AVFrame sample_rate / ch_layout offsets are
   discovered by decoding a self-generated known WAV and scanning for its
   unique signature, with /proc/self/maps guarding every speculative
   dereference.

The probe ends by bit-checking the decoded samples against the generated
ones; if ANY assumption fails on a future library version, ``available()``
turns False and callers fall back to skip-with-reason — mirroring the
reference's tolerate-missing-tool discipline (speaker-assign:325-326).
"""

from __future__ import annotations

import ctypes
import struct
import threading

import numpy as np

__all__ = [
    "AvError",
    "available",
    "decode_file",
    "disabled_reason",
    "encode_file",
    "encoder_for_extension",
    "version_info",
]


class AvError(RuntimeError):
    pass


# ---------------------------------------------------------------------------
# stable struct-prefix offsets (verified by the probe before use)
# ---------------------------------------------------------------------------
_FMT_PB = 32  # AVFormatContext.pb
_FMT_NB_STREAMS = 44  # AVFormatContext.nb_streams
_FMT_STREAMS = 48  # AVFormatContext.streams
_PKT_PTS = 8  # AVPacket.pts
_PKT_DTS = 16  # AVPacket.dts
_PKT_STREAM_INDEX = 36  # AVPacket.stream_index
_FRM_DATA = 0  # AVFrame.data[8]
_FRM_LINESIZE = 64  # AVFrame.linesize[8]
_FRM_EXT = 96  # AVFrame.extended_data
_FRM_NB_SAMPLES = 112  # AVFrame.nb_samples
_FRM_FORMAT = 116  # AVFrame.format
_FRM_PTS = 136  # AVFrame.pts

_AVERROR_EOF = -0x20464F45  # FFERRTAG('E','O','F',' ') == MKTAG as negative
_AV_NOPTS = -(2**63)

# AVSampleFormat: enum value -> (numpy dtype, planar?)
_SAMPLE_FMTS = {
    0: (np.uint8, False),
    1: (np.int16, False),
    2: (np.int32, False),
    3: (np.float32, False),
    4: (np.float64, False),
    5: (np.uint8, True),
    6: (np.int16, True),
    7: (np.int32, True),
    8: (np.float32, True),
    9: (np.float64, True),
    10: (np.int64, False),
    11: (np.int64, True),
}

# extension -> ordered encoder candidates (first available+openable wins)
_ENCODERS_BY_EXT = {
    ".m4a": ("aac",),
    ".aac": ("aac",),
    ".mp4": ("aac",),
    ".ogg": ("libvorbis", "vorbis"),
    ".opus": ("libopus", "opus"),
    ".wma": ("wmav2", "wmav1"),
}
_EXPERIMENTAL_ENCODERS = {"vorbis", "opus"}

_lock = threading.Lock()
_abi: "_Abi | None | bool" = None


class _Abi:
    """Loaded libraries + probed offsets; built once per process."""

    def __init__(self) -> None:
        self.avformat = self._load("libavformat", (59, 60, 61, 58))
        self.avcodec = self._load("libavcodec", (59, 60, 61, 58))
        self.avutil = self._load("libavutil", (57, 58, 59, 56))
        self._declare()
        # probed offsets, filled by _probe()
        self.st_codecpar = -1
        self.st_time_base = -1
        self.ctx: dict[str, int] = {}
        self.ctx_sample_fmt = -1
        self.frm_sample_rate = -1
        self.frm_ch_layout = -1
        # Set by _probe_encode: the encode path writes raw memory through
        # offsets the decode probe never exercises (_FMT_PB, _FRM_PTS,
        # manual AVFrame writes), so it earns its own verified flag via a
        # full encode→decode round trip instead of riding decode's.
        self.encode_verified = False
        self.encode_error: str | None = None
        self._probe()

    # -- library loading ----------------------------------------------------
    @staticmethod
    def _load(stem: str, majors: tuple[int, ...]) -> ctypes.CDLL:
        last: Exception | None = None
        for name in [f"{stem}.so.{m}" for m in majors] + [f"{stem}.so"]:
            try:
                return ctypes.CDLL(name)
            except OSError as e:
                last = e
        raise AvError(f"{stem} not loadable: {last}")

    def _declare(self) -> None:
        P, I, I64 = ctypes.c_void_p, ctypes.c_int, ctypes.c_int64
        PP, CS = ctypes.POINTER(P), ctypes.c_char_p
        f, c, u = self.avformat, self.avcodec, self.avutil
        for fn, at, rt in (
            (f.avformat_version, [], ctypes.c_uint),
            (f.avformat_open_input, [PP, CS, P, P], I),
            (f.avformat_find_stream_info, [P, P], I),
            (f.av_find_best_stream, [P, I, I, I, PP, I], I),
            (f.av_read_frame, [P, P], I),
            (f.avformat_close_input, [PP], None),
            (f.avformat_alloc_output_context2, [PP, P, CS, CS], I),
            (f.avformat_free_context, [P], None),
            (f.avformat_new_stream, [P, P], P),
            (f.avio_open, [PP, CS, I], I),
            (f.avio_closep, [PP], I),
            (f.avformat_write_header, [P, P], I),
            (f.av_interleaved_write_frame, [P, P], I),
            (f.av_write_trailer, [P], I),
            (c.avcodec_version, [], ctypes.c_uint),
            (c.avcodec_find_decoder_by_name, [CS], P),
            (c.avcodec_find_encoder_by_name, [CS], P),
            (c.avcodec_alloc_context3, [P], P),
            (c.avcodec_free_context, [PP], None),
            (c.avcodec_parameters_to_context, [P, P], I),
            (c.avcodec_parameters_from_context, [P, P], I),
            (c.avcodec_open2, [P, P, P], I),
            (c.avcodec_send_packet, [P, P], I),
            (c.avcodec_receive_frame, [P, P], I),
            (c.avcodec_send_frame, [P, P], I),
            (c.avcodec_receive_packet, [P, P], I),
            (c.av_packet_alloc, [], P),
            (c.av_packet_free, [PP], None),
            (c.av_packet_unref, [P], None),
            (c.avcodec_get_class, [], P),
            (u.av_frame_alloc, [], P),
            (u.av_frame_free, [PP], None),
            (u.av_frame_unref, [P], None),
            (u.av_opt_next, [P, P], P),
            (u.av_opt_set, [P, CS, CS, I], I),
            (u.av_opt_get_int, [P, CS, I, ctypes.POINTER(I64)], I),
        ):
            fn.argtypes = at
            fn.restype = rt

    # -- tiny typed memory accessors ----------------------------------------
    @staticmethod
    def r32(addr: int, off: int = 0) -> int:
        return ctypes.cast(addr + off, ctypes.POINTER(ctypes.c_int32))[0]

    @staticmethod
    def ru32(addr: int, off: int = 0) -> int:
        return ctypes.cast(addr + off, ctypes.POINTER(ctypes.c_uint32))[0]

    @staticmethod
    def r64(addr: int, off: int = 0) -> int:
        return ctypes.cast(addr + off, ctypes.POINTER(ctypes.c_int64))[0]

    @staticmethod
    def rptr(addr: int, off: int = 0) -> int:
        return ctypes.cast(addr + off, ctypes.POINTER(ctypes.c_void_p))[0] or 0

    @staticmethod
    def w32(addr: int, off: int, v: int) -> None:
        ctypes.cast(addr + off, ctypes.POINTER(ctypes.c_int32))[0] = v

    @staticmethod
    def w64(addr: int, off: int, v: int) -> None:
        ctypes.cast(addr + off, ctypes.POINTER(ctypes.c_int64))[0] = v

    @staticmethod
    def wptr(addr: int, off: int, v: int) -> None:
        ctypes.cast(addr + off, ctypes.POINTER(ctypes.c_void_p))[0] = v

    # -- probing -------------------------------------------------------------
    @staticmethod
    def _readable_ranges() -> list[tuple[int, int]]:
        out = []
        with open("/proc/self/maps") as fh:
            for line in fh:
                parts = line.split()
                if len(parts) >= 2 and "r" in parts[1]:
                    a, b = parts[0].split("-")
                    out.append((int(a, 16), int(b, 16)))
        out.sort()
        return out

    def _option_offsets(self) -> dict[str, int]:
        """Read AVCodecContext field offsets out of the library's own
        AVOption table (AVOption layout {name, help, offset@16, type@20}
        has been stable since 2011)."""
        cls = self.avcodec.avcodec_get_class()
        fake = ctypes.pointer(ctypes.c_void_p(cls))  # object is just class*
        offsets: dict[str, int] = {}
        prev = None
        while True:
            o = self.avutil.av_opt_next(fake, prev)
            if not o:
                break
            prev = o
            name = ctypes.string_at(self.rptr(o)).decode()
            off = self.r32(o, 16)
            typ = self.r32(o, 20)
            if typ != 10 and name not in offsets:  # 10 == AV_OPT_TYPE_CONST
                offsets[name] = off
        return offsets

    def _probe(self) -> None:
        import os
        import tempfile

        rate, n = 11025, 11025
        t = np.arange(n) / rate
        ref = np.clip(np.sin(2 * np.pi * 440.0 * t), -1, 1)
        pcm = (ref * 12000).astype("<i2")
        body = pcm.tobytes()
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + struct.pack("<I", len(body))
        )
        fd, path = tempfile.mkstemp(suffix=".wav", prefix="avprobe-")
        fd2, path2 = tempfile.mkstemp(suffix=".mp2", prefix="avprobe-")
        try:
            with os.fdopen(fd, "wb") as fh:
                fh.write(hdr + body)
            self._probe_offsets(path, rate)

            # The raw-PCM decoder leaves the frame channel layout
            # unspecified, so the ch_layout signature is probed on an MPEG
            # Layer II stream (first-party encoder, utils/mpegaudio.py)
            # whose libav decoder fills in the native mono mask.
            from .mpegaudio import encode_layer2

            mp2_rate = 16000
            tt = np.arange(mp2_rate // 2) / mp2_rate
            with os.fdopen(fd2, "wb") as fh:
                fh.write(encode_layer2(np.sin(2 * np.pi * 330.0 * tt), mp2_rate))
            sr1, _ = self._probe_frame_offsets(path, rate)
            sr2, chl2 = self._probe_frame_offsets(path2, mp2_rate)
            sr_cands = sorted(set(sr1) & set(sr2))
            if len(sr_cands) != 1 or len(chl2) != 1:
                raise AvError(
                    f"probe: AVFrame offsets ambiguous (sr={sr_cands} chl={chl2})"
                )
            self.frm_sample_rate = sr_cands[0]
            self.frm_ch_layout = chl2[0]

            decoded, got_rate = self.decode(path)
            if got_rate != rate or decoded.shape[0] != n:
                raise AvError("probe decode shape mismatch")
            # Compare against the int16-quantized signal actually encoded
            # in the probe WAV, not the unquantized float reference.
            expected = pcm.astype(np.float32) / 32768.0
            err = float(np.abs(decoded[:, 0] - expected).max())
            if err > 1e-3:
                raise AvError(f"probe decode sample mismatch ({err})")
            self._probe_encode(rate)
        finally:
            for p in (path, path2):
                try:
                    os.unlink(p)
                except OSError:
                    pass

    def _probe_encode(self, rate: int) -> None:
        """Encode a short tone through the first available encoder/muxer
        pair and decode it back.  Success flips ``encode_verified``; any
        failure leaves encode disabled (with the reason recorded) WITHOUT
        touching decode availability — the encode path writes through
        probed offsets that decode never exercises."""
        import os
        import tempfile

        tone = np.sin(
            2 * np.pi * 440.0 * np.arange(rate // 2) / rate
        ).astype(np.float32) * 0.3
        for ext in (".m4a", ".ogg", ".opus", ".wma"):
            names = _ENCODERS_BY_EXT[ext]
            if not any(
                self.avcodec.avcodec_find_encoder_by_name(n.encode())
                for n in names
            ):
                continue
            fd, path = tempfile.mkstemp(suffix=ext, prefix="avprobe-enc-")
            os.close(fd)
            try:
                enc_rate = 16000  # codec-safe rate (opus/aac support it)
                t2 = np.arange(enc_rate // 2) / enc_rate
                sig = (np.sin(2 * np.pi * 440.0 * t2) * 0.3).astype(np.float32)
                self.encode(path, sig, enc_rate, names, 96000)
                decoded, got_rate = self.decode(path)
                if decoded.shape[0] < enc_rate // 4 or got_rate <= 0:
                    raise AvError(
                        f"encode probe round-trip too short via {ext}"
                    )
                # lossy codec: require rough energy agreement, not bits
                rms = float(np.sqrt(np.mean(decoded[:, 0] ** 2)))
                if not (0.05 < rms < 0.6):
                    raise AvError(f"encode probe energy off via {ext} ({rms})")
                self.encode_verified = True
                return
            except Exception as e:  # noqa: BLE001 - record, don't raise
                self.encode_error = f"{ext}: {e}"
            finally:
                try:
                    os.unlink(path)
                except OSError:
                    pass
        if self.encode_error is None:
            self.encode_error = "no known encoder present in libavcodec"

    def _probe_offsets(self, wav_path: str, rate: int) -> None:
        f, c, u = self.avformat, self.avcodec, self.avutil
        ic = ctypes.c_void_p()
        if f.avformat_open_input(ctypes.byref(ic), wav_path.encode(), None, None) != 0:
            raise AvError("probe: avformat_open_input failed")
        try:
            if f.avformat_find_stream_info(ic, None) < 0:
                raise AvError("probe: find_stream_info failed")
            dec = ctypes.c_void_p()
            idx = f.av_find_best_stream(ic, 1, -1, -1, ctypes.byref(dec), 0)
            if idx != 0 or not dec.value:
                raise AvError("probe: av_find_best_stream failed")
            base = ic.value
            if self.ru32(base, _FMT_NB_STREAMS) != 1:
                raise AvError("probe: AVFormatContext prefix drifted (nb_streams)")
            streams = self.rptr(base, _FMT_STREAMS)
            maps = self._readable_ranges()

            def readable(addr: int, size: int = 16) -> bool:
                if not addr or addr % 8:
                    return False
                for a, b in maps:
                    if a <= addr and addr + size <= b:
                        return True
                return False

            if not readable(streams):
                raise AvError("probe: AVFormatContext prefix drifted (streams)")
            st = self.rptr(streams, 0)
            if not readable(st, 512):
                raise AvError("probe: AVStream pointer unreadable")

            # AVStream.codecpar: unique pointer to {codec_type=AUDIO(1),
            # codec_id=PCM_S16LE(65536)}
            cands = []
            for off in range(0, 480, 8):
                p = self.rptr(st, off)
                if readable(p, 16) and self.r32(p) == 1 and self.r32(p, 4) == 65536:
                    cands.append(off)
            if len(cands) != 1:
                raise AvError(f"probe: codecpar ambiguous ({cands})")
            self.st_codecpar = cands[0]

            # AVStream.time_base: the wav demuxer sets 1/sample_rate
            tb_cands = [
                off for off in range(8, 64, 4)
                if self.r32(st, off) == 1 and self.r32(st, off + 4) == rate
            ]
            if not tb_cands:
                raise AvError("probe: AVStream.time_base not found")
            self.st_time_base = tb_cands[0]

            # AVCodecContext offsets via the option table
            opts = self._option_offsets()
            need = ("ar", "ac", "b", "frame_size", "time_base", "flags")
            missing = [k for k in need if k not in opts]
            if missing:
                raise AvError(f"probe: AVOptions missing {missing}")
            self.ctx = {k: opts[k] for k in opts
                        if k in need + ("channel_layout", "ch_layout")}
            # classic layout: int sample_rate; int channels; enum sample_fmt
            if opts["ac"] != opts["ar"] + 4:
                raise AvError("probe: sample_rate/channels not adjacent")
            self.ctx_sample_fmt = opts["ar"] + 8

            # open the decoder, decode one frame, probe AVFrame offsets
            par = self.rptr(st, self.st_codecpar)
            avctx = c.avcodec_alloc_context3(dec)
            try:
                if c.avcodec_parameters_to_context(avctx, par) < 0:
                    raise AvError("probe: parameters_to_context failed")
                if c.avcodec_open2(avctx, dec, None) != 0:
                    raise AvError("probe: avcodec_open2 failed")
                got = ctypes.c_int64(0)
                u.av_opt_get_int(avctx, b"ar", 0, ctypes.byref(got))
                if got.value != rate:
                    raise AvError("probe: option table offsets wrong (ar)")
                if self.r32(avctx, self.ctx_sample_fmt) != 1:  # S16
                    raise AvError("probe: sample_fmt offset wrong")
            finally:
                c.avcodec_free_context(ctypes.byref(ctypes.c_void_p(avctx)))
        finally:
            f.avformat_close_input(ctypes.byref(ic))

    def _probe_frame_offsets(
        self, path: str, rate: int
    ) -> tuple[list[int], list[int]]:
        """Decode the first audio frame of ``path`` and return candidate
        offsets for AVFrame.sample_rate (int == rate) and AVFrame.ch_layout
        (the mono native signature {order=1, nb_channels=1, mask=4})."""
        f, c, u = self.avformat, self.avcodec, self.avutil
        ic = ctypes.c_void_p()
        if f.avformat_open_input(ctypes.byref(ic), path.encode(), None, None) != 0:
            raise AvError(f"probe: cannot reopen {path}")
        avctx = pkt = frm = 0
        try:
            if f.avformat_find_stream_info(ic, None) < 0:
                raise AvError("probe: find_stream_info failed")
            dec = ctypes.c_void_p()
            idx = f.av_find_best_stream(ic, 1, -1, -1, ctypes.byref(dec), 0)
            if idx < 0 or not dec.value:
                raise AvError("probe: no audio stream")
            st = self.rptr(self.rptr(ic.value, _FMT_STREAMS), 8 * idx)
            avctx = c.avcodec_alloc_context3(dec)
            if (
                c.avcodec_parameters_to_context(
                    avctx, self.rptr(st, self.st_codecpar)
                ) < 0
                or c.avcodec_open2(avctx, dec, None) != 0
            ):
                raise AvError("probe: decoder open failed")
            pkt = c.av_packet_alloc()
            frm = u.av_frame_alloc()
            got = False
            while not got and f.av_read_frame(ic, pkt) >= 0:
                if self.r32(pkt, _PKT_STREAM_INDEX) == idx:
                    c.avcodec_send_packet(avctx, pkt)
                    got = c.avcodec_receive_frame(avctx, frm) == 0
                c.av_packet_unref(pkt)
            if not got:
                raise AvError("probe: no frame decoded")
            if self.r32(frm, _FRM_FORMAT) not in _SAMPLE_FMTS:
                raise AvError("probe: AVFrame prefix drifted (format)")
            if not (0 < self.r32(frm, _FRM_NB_SAMPLES) <= rate):
                raise AvError("probe: AVFrame prefix drifted (nb_samples)")
            sr_cands = [o for o in range(120, 520, 4)
                        if self.r32(frm, o) == rate]
            chl_cands = [
                o for o in range(120, 520, 4)
                if self.r32(frm, o) == 1 and self.r32(frm, o + 4) == 1
                and self.r64(frm, o + 8) == 4
            ]
            return sr_cands, chl_cands
        finally:
            if pkt:
                c.av_packet_free(ctypes.byref(ctypes.c_void_p(pkt)))
            if frm:
                u.av_frame_free(ctypes.byref(ctypes.c_void_p(frm)))
            if avctx:
                c.avcodec_free_context(ctypes.byref(ctypes.c_void_p(avctx)))
            f.avformat_close_input(ctypes.byref(ic))

    # -- decode ---------------------------------------------------------------
    def decode(self, path: str) -> tuple[np.ndarray, int]:
        f, c, u = self.avformat, self.avcodec, self.avutil
        ic = ctypes.c_void_p()
        if f.avformat_open_input(ctypes.byref(ic), path.encode(), None, None) != 0:
            raise AvError(f"cannot open container: {path}")
        avctx = pkt = frm = 0
        try:
            if f.avformat_find_stream_info(ic, None) < 0:
                raise AvError(f"no stream info: {path}")
            dec = ctypes.c_void_p()
            idx = f.av_find_best_stream(ic, 1, -1, -1, ctypes.byref(dec), 0)
            if idx < 0 or not dec.value:
                raise AvError(f"no decodable audio stream: {path}")
            st = self.rptr(self.rptr(ic.value, _FMT_STREAMS), 8 * idx)
            par = self.rptr(st, self.st_codecpar)
            avctx = c.avcodec_alloc_context3(dec)
            if c.avcodec_parameters_to_context(avctx, par) < 0:
                raise AvError(f"bad codec parameters: {path}")
            if c.avcodec_open2(avctx, dec, None) != 0:
                raise AvError(f"decoder failed to open: {path}")
            pkt = c.av_packet_alloc()
            frm = u.av_frame_alloc()
            chunks: list[np.ndarray] = []
            state = {"rate": 0}

            def drain() -> None:
                while c.avcodec_receive_frame(avctx, frm) == 0:
                    ns = self.r32(frm, _FRM_NB_SAMPLES)
                    fmt_ = self.r32(frm, _FRM_FORMAT)
                    nch = self.r32(frm, self.frm_ch_layout + 4) or 1
                    if not state["rate"]:
                        state["rate"] = self.r32(frm, self.frm_sample_rate)
                    if fmt_ not in _SAMPLE_FMTS or ns <= 0:
                        continue
                    dt, planar = _SAMPLE_FMTS[fmt_]
                    bps = np.dtype(dt).itemsize
                    ext = self.rptr(frm, _FRM_EXT)
                    if planar:
                        planes = [
                            np.frombuffer(
                                ctypes.string_at(self.rptr(ext, 8 * ch), ns * bps),
                                dtype=dt,
                            )
                            for ch in range(nch)
                        ]
                        chunks.append(np.stack(planes, axis=1))
                    else:
                        raw = ctypes.string_at(self.rptr(ext), ns * bps * nch)
                        chunks.append(
                            np.frombuffer(raw, dtype=dt).reshape(-1, nch)
                        )
                    u.av_frame_unref(frm)

            while f.av_read_frame(ic, pkt) >= 0:
                if self.r32(pkt, _PKT_STREAM_INDEX) == idx:
                    c.avcodec_send_packet(avctx, pkt)
                    drain()
                c.av_packet_unref(pkt)
            c.avcodec_send_packet(avctx, None)
            drain()
            if not chunks or not state["rate"]:
                raise AvError(f"no decodable audio frames: {path}")
            return _to_float32(np.concatenate(chunks, axis=0)), state["rate"]
        finally:
            if pkt:
                c.av_packet_free(ctypes.byref(ctypes.c_void_p(pkt)))
            if frm:
                u.av_frame_free(ctypes.byref(ctypes.c_void_p(frm)))
            if avctx:
                c.avcodec_free_context(ctypes.byref(ctypes.c_void_p(avctx)))
            f.avformat_close_input(ctypes.byref(ic))

    # -- encode ---------------------------------------------------------------
    def _open_encoder(self, enc_name: str, sr: int, bitrate: int):
        """Try the encoder at each candidate sample format; return
        (avctx, enc, sample_fmt) or None if it never opens."""
        c, u = self.avcodec, self.avutil
        enc = c.avcodec_find_encoder_by_name(enc_name.encode())
        if not enc:
            return None
        for sfmt in (8, 3, 6, 1, 7, 2):  # FLTP, FLT, S16P, S16, S32P, S32
            avctx = c.avcodec_alloc_context3(enc)
            self.w32(avctx, self.ctx["ar"], sr)
            self.w32(avctx, self.ctx["ac"], 1)
            self.w32(avctx, self.ctx_sample_fmt, sfmt)
            if "channel_layout" in self.ctx:
                self.w64(avctx, self.ctx["channel_layout"], 4)  # MONO
            if "ch_layout" in self.ctx:
                o = self.ctx["ch_layout"]
                self.w32(avctx, o, 1)  # AV_CHANNEL_ORDER_NATIVE
                self.w32(avctx, o + 4, 1)  # nb_channels
                self.w64(avctx, o + 8, 4)  # mask = FRONT_CENTER
            self.w64(avctx, self.ctx["b"], bitrate)
            self.w32(avctx, self.ctx["time_base"], 1)
            self.w32(avctx, self.ctx["time_base"] + 4, sr)
            u.av_opt_set(avctx, b"flags", b"+global_header", 0)
            if enc_name in _EXPERIMENTAL_ENCODERS:
                u.av_opt_set(avctx, b"strict", b"experimental", 0)
            if c.avcodec_open2(avctx, enc, None) == 0:
                return avctx, enc, sfmt
            c.avcodec_free_context(ctypes.byref(ctypes.c_void_p(avctx)))
        return None

    def encode(self, path: str, x: np.ndarray, sr: int,
               enc_names: tuple[str, ...], bitrate: int) -> None:
        f, c, u = self.avformat, self.avcodec, self.avutil
        x = np.ascontiguousarray(np.asarray(x, dtype=np.float32).reshape(-1))
        opened = None
        for name in enc_names:
            opened = self._open_encoder(name, sr, bitrate)
            if opened:
                break
        if not opened:
            raise AvError(f"no encoder available among {enc_names} at {sr} Hz")
        avctx, _enc, sfmt = opened
        ic = ctypes.c_void_p()
        pb = ctypes.c_void_p()
        pkt = frm = 0
        try:
            if f.avformat_alloc_output_context2(
                ctypes.byref(ic), None, None, path.encode()
            ) != 0 or not ic.value:
                raise AvError(f"no muxer for {path}")
            st = f.avformat_new_stream(ic, None)
            if not st:
                raise AvError("avformat_new_stream failed")
            if c.avcodec_parameters_from_context(
                self.rptr(st, self.st_codecpar), avctx
            ) < 0:
                raise AvError("parameters_from_context failed")
            if f.avio_open(ctypes.byref(pb), path.encode(), 2) < 0:
                raise AvError(f"cannot open for writing: {path}")
            self.wptr(ic.value, _FMT_PB, pb.value)
            if f.avformat_write_header(ic, None) < 0:
                raise AvError(f"write_header failed: {path}")
            tb_num = self.r32(st, self.st_time_base)
            tb_den = self.r32(st, self.st_time_base + 4)
            fsz = self.r32(avctx, self.ctx["frame_size"]) or 4096
            pkt = c.av_packet_alloc()
            frm = u.av_frame_alloc()

            def pump() -> None:
                while c.avcodec_receive_packet(avctx, pkt) == 0:
                    # rescale encoder pts (1/sr) to the muxer's stream tb
                    for off in (_PKT_PTS, _PKT_DTS):
                        v = self.r64(pkt, off)
                        if v != _AV_NOPTS:
                            self.w64(pkt, off, v * tb_den // (sr * tb_num))
                    if f.av_interleaved_write_frame(ic, pkt) < 0:
                        raise AvError("write_frame failed")
                    c.av_packet_unref(pkt)

            dt = np.int16 if sfmt in (1, 6) else np.float32
            pos = 0
            pts = 0
            while pos < len(x):
                n = min(fsz, len(x) - pos)
                chunk = x[pos : pos + n]
                buf = np.ascontiguousarray(
                    (chunk * 32767.0).astype(np.int16)
                    if dt is np.int16 else chunk
                )
                self.w32(frm, _FRM_NB_SAMPLES, n)
                self.w32(frm, _FRM_FORMAT, sfmt)
                self.w32(frm, self.frm_sample_rate, sr)
                o = self.frm_ch_layout
                self.w32(frm, o, 1)
                self.w32(frm, o + 4, 1)
                self.w64(frm, o + 8, 4)
                self.wptr(frm, _FRM_DATA, buf.ctypes.data)
                self.w32(frm, _FRM_LINESIZE, buf.nbytes)
                self.wptr(frm, _FRM_EXT, frm + _FRM_DATA)
                self.w64(frm, _FRM_PTS, pts)
                rc = c.avcodec_send_frame(avctx, frm)
                if rc < 0:
                    raise AvError(f"send_frame failed ({rc})")
                pump()
                pts += n
                pos += n
            c.avcodec_send_frame(avctx, None)
            pump()
            if f.av_write_trailer(ic) < 0:
                raise AvError("write_trailer failed")
        finally:
            if pkt:
                c.av_packet_free(ctypes.byref(ctypes.c_void_p(pkt)))
            if frm:
                # data points at numpy memory the library must not free
                self.wptr(frm, _FRM_DATA, 0)
                self.wptr(frm, _FRM_EXT, 0)
                u.av_frame_free(ctypes.byref(ctypes.c_void_p(frm)))
            c.avcodec_free_context(ctypes.byref(ctypes.c_void_p(avctx)))
            if pb.value:
                f.avio_closep(ctypes.byref(pb))
            if ic.value:
                f.avformat_free_context(ic)


def _to_float32(a: np.ndarray) -> np.ndarray:
    if a.dtype == np.uint8:
        return (a.astype(np.float32) - 128.0) / 128.0
    if a.dtype == np.int16:
        return a.astype(np.float32) / 32768.0
    if a.dtype == np.int32:
        return a.astype(np.float32) / 2147483648.0
    if a.dtype == np.int64:
        return (a / 9223372036854775808.0).astype(np.float32)
    return a.astype(np.float32, copy=False)


_abi_error: str | None = None


def _get_abi() -> "_Abi | None":
    global _abi, _abi_error
    with _lock:
        if _abi is None:
            try:
                _abi = _Abi()
            except Exception as e:  # noqa: BLE001 - any probe failure disables
                _abi = False
                _abi_error = f"{type(e).__name__}: {e}"
    return _abi or None


def available() -> bool:
    """True when the ffmpeg shared libraries loaded AND every ABI probe
    verified (see module docstring)."""
    return _get_abi() is not None


def disabled_reason() -> str | None:
    """Why the AV tier is unavailable (None when it IS available).
    Surfaces the probe failure that would otherwise be silent."""
    if _get_abi() is not None:
        return None
    return _abi_error or "unknown probe failure"


def version_info() -> dict[str, int]:
    abi = _get_abi()
    if abi is None:
        return {}
    return {
        "avformat": int(abi.avformat.avformat_version()),
        "avcodec": int(abi.avcodec.avcodec_version()),
    }


def decode_file(path: str) -> tuple[np.ndarray, int]:
    """Decode ANY container/codec libavformat recognizes → (float32 [T, C],
    sample_rate).  Raises AvError when unavailable or undecodable."""
    abi = _get_abi()
    if abi is None:
        raise AvError(
            "system AV libraries unavailable on this host"
            f" ({_abi_error or 'not found'})"
        )
    # No module lock here: each decode allocates independent contexts and
    # libavformat/libavcodec are thread-safe across independent contexts;
    # serializing decodes process-wide starved the threaded producer.
    return abi.decode(str(path))


def encoder_for_extension(ext: str) -> tuple[str, ...]:
    return _ENCODERS_BY_EXT.get(ext.lower(), ())


def can_encode(ext: str) -> bool:
    abi = _get_abi()
    if abi is None or not abi.encode_verified:
        return False
    return any(
        abi.avcodec.avcodec_find_encoder_by_name(n.encode())
        for n in encoder_for_extension(ext)
    )


def encode_file(
    path: str, x: np.ndarray, sample_rate: int, bitrate_kbps: int = 96
) -> None:
    """Encode float32 [-1,1] mono PCM into the container/codec implied by
    the file extension (.m4a/.aac → AAC, .ogg → Vorbis, .opus → Opus,
    .wma → WMAv2)."""
    from pathlib import Path

    abi = _get_abi()
    if abi is None:
        raise AvError(
            "system AV libraries unavailable on this host"
            f" ({_abi_error or 'not found'})"
        )
    if not abi.encode_verified:
        raise AvError(
            f"AV encode path not probe-verified on this host"
            f" ({abi.encode_error})"
        )
    names = encoder_for_extension(Path(str(path)).suffix)
    if not names:
        raise AvError(f"no encoder mapping for extension of {path}")
    abi.encode(str(path), x, int(sample_rate), names, bitrate_kbps * 1000)
