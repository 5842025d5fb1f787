"""First-party MPEG-audio Layer I codec (encode + decode), pure numpy.

Why this exists: the reference toolkit stores review samples as ``.mp3``
files produced by shelling out to ffmpeg (reference
``speaker_samples:280-326`` — ``extract_audio_segment`` with
``output_format="mp3"``), and its acceptance tests discover samples by
globbing ``samples/<speaker>/*.mp3``.  This image has no ffmpeg and no
codec libraries, so the framework carries its own MPEG audio codec the
same way it carries its own BLAKE3 (``utils/hashing.py``).

Scope (honest statement):

- **Layer I** is implemented completely from the ISO 11172-3 / 13818-3
  *formulas*: the cosine-modulated 32-band polyphase filterbank
  (analysis modulation ``cos((2i+1)(k-16)pi/64)`` over the newest-first
  512-sample X buffer; synthesis via the V/U/W flowchart with matrixing
  ``cos((16+k)(2i+1)pi/64)``), ``2.0*2^(-i/3)`` scalefactors, and the
  ISO ``(2c-(2^nb-2))/(2^nb-1)`` requantization law.  The one numeric
  table the spec has — the 512-tap filterbank window — was recovered
  bit-exactly by linear probing of a real ISO decoder (see the
  provenance note at ``_D_Q16``), so round-trips are interoperable:
  ~52 dB (quantizer-limited) through BOTH this decoder and libmpg123
  (tests/test_syscodec.py, tests/test_native_audio.py).
- **Layer III decode is NOT implemented here** (its Huffman tables are
  large spec data blobs); real-world ``.mp3`` files decode through the
  in-process system codec (utils/syscodec.py, libmpg123) when present.
  Without it, :func:`decode` raises :class:`UnsupportedFormatError`
  with a clear message so callers (``speaker-process`` queue) can skip
  with a reason instead of crashing.

Frame layout (mono Layer I): 32-bit header, 32x4-bit allocation,
6-bit scalefactor per active band, then 12 granules x (alloc+1)-bit
codes per active band, padded to 4-byte slots.
"""

from __future__ import annotations

import numpy as np

SUBBANDS = 32
GRANULES = 12
FRAME_SAMPLES = SUBBANDS * GRANULES  # 384 per Layer I frame
_TAPS = 512

# Header enumerations (spec header fields, not DSP data tables).
_BITRATES_V1_L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448]
_BITRATES_V2_L1 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256]
_RATES_V1 = [44100, 48000, 32000]
_RATES_V2 = [22050, 24000, 16000]

# 63 scalefactors: 2.0 * 2^(-i/3)  (ISO Layer I/II scalefactor law)
_SCALEFACTORS = 2.0 * np.power(2.0, -np.arange(63) / 3.0)


class UnsupportedFormatError(ValueError):
    """Raised for MPEG streams outside the first-party codec's scope."""


# ------------------------------------------------------------- filterbank
#
# 512-tap synthesis window of the ISO polyphase filterbank (the spec's
# table-B.3 "D[i]" coefficients), expressed in this module's folded
# V/U/W-flowchart convention and stored as Q16 fixed-point integers.
#
# Provenance (recovered, not transcribed): the r2 square-root-raised-
# cosine prototype self-decoded at ~40 dB but was only ~5 dB
# interoperable with real ISO decoders — near-perfect-reconstruction
# alone does not pin the window shape.  These taps were therefore
# MEASURED from a real decoder (libmpg123, loaded in-process via
# utils/syscodec.py): crafted Layer I streams with single-subband,
# single-granule impulses make the decoder emit each subband's synthesis
# impulse response, and the synthesis flowchart is linear and exactly
# determined, so the window solves out tap by tap (least squares across
# all 32 subbands; max model residual 2.5e-6).  The recovered taps
# snapped onto the 2^-16 grid at float32-noise residual (1.9e-7),
# i.e. the spec table was recovered bit-exactly.  Taps multiplied by an
# exactly-zero modulation cosine (j=16 at even r) are unobservable AND
# unused by the flowchart; they are stored as 0.
#
# With this window the encoder's streams decode identically (~52 dB,
# quantizer-limited) on this module's decoder and on libmpg123
# (tests/test_syscodec.py), replacing the r2 untested-interop claim.
_D_Q16 = np.array([
    0, -1, -1, -1, -1, -1, -1, -2,
    -2, -2, -2, -3, -3, -4, -4, -5,
    0, -6, -7, -7, -8, -9, -10, -11,
    -13, -14, -16, -17, -19, -21, -24, -26,
    -29, -31, -35, -38, -41, -45, -49, -53,
    -58, -63, -68, -73, -79, -85, -91, -97,
    -104, -111, -117, -125, -132, -139, -147, -154,
    -161, -169, -176, -183, -190, -196, -202, -208,
    213, 218, 222, 225, 227, 228, 228, 227,
    224, 221, 215, 208, 200, 189, 177, 163,
    0, 127, 106, 83, 57, 29, -2, -36,
    -72, -111, -153, -197, -244, -294, -347, -401,
    -459, -519, -581, -645, -711, -779, -848, -919,
    -991, -1064, -1137, -1210, -1283, -1356, -1428, -1498,
    -1567, -1634, -1698, -1759, -1817, -1870, -1919, -1962,
    -2001, -2032, -2057, -2075, -2085, -2087, -2080, -2063,
    2037, 2000, 1952, 1893, 1822, 1739, 1644, 1535,
    1414, 1280, 1131, 970, 794, 605, 402, 185,
    0, -288, -545, -814, -1095, -1388, -1692, -2006,
    -2330, -2663, -3004, -3351, -3705, -4063, -4425, -4788,
    -5153, -5517, -5879, -6237, -6589, -6935, -7271, -7597,
    -7910, -8209, -8491, -8755, -8998, -9219, -9416, -9585,
    -9727, -9838, -9916, -9959, -9966, -9935, -9863, -9750,
    -9592, -9389, -9139, -8840, -8492, -8092, -7640, -7134,
    6574, 5959, 5288, 4561, 3776, 2935, 2037, 1082,
    70, -998, -2122, -3300, -4533, -5818, -7154, -8540,
    0, -11455, -12980, -14548, -16155, -17799, -19478, -21189,
    -22929, -24694, -26482, -28289, -30112, -31947, -33791, -35640,
    -37489, -39336, -41176, -43006, -44821, -46617, -48390, -50137,
    -51853, -53534, -55178, -56778, -58333, -59838, -61289, -62684,
    -64019, -65290, -66494, -67629, -68692, -69679, -70590, -71420,
    -72169, -72835, -73415, -73908, -74313, -74630, -74856, -74992,
    75038, 74992, 74856, 74630, 74313, 73908, 73415, 72835,
    72169, 71420, 70590, 69679, 68692, 67629, 66494, 65290,
    0, 62684, 61289, 59838, 58333, 56778, 55178, 53534,
    51853, 50137, 48390, 46617, 44821, 43006, 41176, 39336,
    37489, 35640, 33791, 31947, 30112, 28289, 26482, 24694,
    22929, 21189, 19478, 17799, 16155, 14548, 12980, 11455,
    9975, 8540, 7154, 5818, 4533, 3300, 2122, 998,
    -70, -1082, -2037, -2935, -3776, -4561, -5288, -5959,
    6574, 7134, 7640, 8092, 8492, 8840, 9139, 9389,
    9592, 9750, 9863, 9935, 9966, 9959, 9916, 9838,
    0, 9585, 9416, 9219, 8998, 8755, 8491, 8209,
    7910, 7597, 7271, 6935, 6589, 6237, 5879, 5517,
    5153, 4788, 4425, 4063, 3705, 3351, 3004, 2663,
    2330, 2006, 1692, 1388, 1095, 814, 545, 288,
    45, -185, -402, -605, -794, -970, -1131, -1280,
    -1414, -1535, -1644, -1739, -1822, -1893, -1952, -2000,
    2037, 2063, 2080, 2087, 2085, 2075, 2057, 2032,
    2001, 1962, 1919, 1870, 1817, 1759, 1698, 1634,
    0, 1498, 1428, 1356, 1283, 1210, 1137, 1064,
    991, 919, 848, 779, 711, 645, 581, 519,
    459, 401, 347, 294, 244, 197, 153, 111,
    72, 36, 2, -29, -57, -83, -106, -127,
    -146, -163, -177, -189, -200, -208, -215, -221,
    -224, -227, -228, -228, -227, -225, -222, -218,
    213, 208, 202, 196, 190, 183, 176, 169,
    161, 154, 147, 139, 132, 125, 117, 111,
    0, 97, 91, 85, 79, 73, 68, 63,
    58, 53, 49, 45, 41, 38, 35, 31,
    29, 26, 24, 21, 19, 17, 16, 14,
    13, 11, 10, 9, 8, 7, 7, 6,
    5, 5, 4, 4, 3, 3, 2, 2,
    2, 2, 1, 1, 1, 1, 1, 1,
], dtype=np.int64)

_DWIN_RAW = _D_Q16.astype(np.float64) / 65536.0
_N_IDX = np.arange(_TAPS, dtype=np.float64)
_I_IDX = np.arange(SUBBANDS, dtype=np.float64)[:, None]
# Synthesis matrixing N[k,i] = cos((16+k)(2i+1)pi/64), k = 0..63 (spec
# formula, not table data).
_K64 = np.arange(64, dtype=np.float64)[:, None]
_NMAT = np.cos((16.0 + _K64) * (2 * np.arange(SUBBANDS)[None, :] + 1) * np.pi / 64.0)
# The decoder below reproduces libmpg123's output exactly with unit gain.
_SYN_GAIN = 1.0

# Analysis bank: the matched (time-reversed) filters of the synthesis
# bank — the standard analysis/synthesis relationship for an (almost)
# paraunitary filterbank, so no separate analysis table is needed.
# F[band, 32r+j] = D[j+32r] * N[sel(r,j), band], sel = j (even r) or
# 32+j (odd r); the analysis matrix is F reversed in time, scaled below
# to unit passband gain + unit full-chain gain (ISO level convention, so
# streams from this encoder play at correct level everywhere).
_F = np.zeros((SUBBANDS, _TAPS))
for _r in range(16):
    _sel = slice(0, 32) if _r % 2 == 0 else slice(32, 64)
    _F[:, 32 * _r : 32 * _r + 32] = (
        _DWIN_RAW[32 * _r : 32 * _r + 32][None, :] * _NMAT[_sel, :].T
    )
_ANALYSIS = _F[:, ::-1].copy()


def _analyze(pcm: np.ndarray) -> np.ndarray:
    """float PCM [T*32] -> subband samples [T, 32] (ISO granule order)."""
    n = len(pcm)
    t = n // SUBBANDS
    pad = np.concatenate([pcm[::-1], np.zeros(_TAPS, dtype=np.float64)])
    wins = np.lib.stride_tricks.sliding_window_view(pad, _TAPS)
    starts = n - SUBBANDS * (np.arange(t) + 1)
    return wins[starts] @ _ANALYSIS.T


def _synthesize(sb: np.ndarray) -> np.ndarray:
    """Subband samples [T, 32] -> float PCM [T*32], ISO V/U/W flowchart
    vectorised over granules: out[32g+j] = sum_r D[j+32r] * V(g-r, sel),
    where sel = j for even r and 32+j for odd r."""
    t = sb.shape[0]
    vall = sb @ _NMAT.T  # [T, 64]
    vpad = np.concatenate([np.zeros((15, 64)), vall], axis=0)  # index g-r -> g-r+15
    out = np.zeros((t, SUBBANDS), dtype=np.float64)
    for r in range(16):
        dslice = _DWIN_RAW[32 * r : 32 * r + 32]  # D[j+32r], j=0..31
        sel = slice(0, 32) if r % 2 == 0 else slice(32, 64)
        out += dslice[None, :] * vpad[15 - r : 15 - r + t, sel]
    return (out * _SYN_GAIN).reshape(-1)


def _analysis_passband_gain() -> float:
    """Measured per-subband passband gain of the analysis bank (tone at
    the centre of subband 3) — the ISO convention is unit passband gain
    (full-scale input -> full-scale subband samples, the 2.0 max
    scalefactor giving 6 dB headroom)."""
    sr = 6400
    tone = np.sin(2 * np.pi * (3 + 0.5) / 64.0 * np.arange(sr))
    pad = np.concatenate([tone, np.zeros((-sr) % SUBBANDS)])
    sb = _analyze(pad)
    return float(np.abs(sb[:, 3]).max())


def _chain_gain() -> float:
    """Unit-gain calibration: measured analysis->synthesis passband gain
    correction for the full chain.  Deterministic; computed once."""
    fs = 6400
    n = np.arange(fs, dtype=np.float64)
    x = np.sin(2 * np.pi * 0.011 * n)  # in-band test tone
    y = _synthesize(_analyze(x))
    d = 481  # ISO filterbank delay
    return float(np.dot(y[d:], x[: len(y) - d]) / np.dot(y[d:], y[d:]))


# Fold all level calibration into the ANALYSIS side: the synthesis side
# must stay bit-compatible with ISO decoders (gain exactly 1), so the
# encoder normalises instead.
_ANALYSIS /= _analysis_passband_gain()
_ANALYSIS *= _chain_gain()


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (int(value) & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def pad_to(self, nbytes: int) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = 0
            self.nbits = 0
        self.buf.extend(b"\x00" * (nbytes - len(self.buf)))
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _rate_indices(sample_rate: int) -> tuple[int, int, list[int]]:
    """-> (version_bits, samplerate_index, bitrate_table)."""
    if sample_rate in _RATES_V1:
        return 3, _RATES_V1.index(sample_rate), _BITRATES_V1_L1
    if sample_rate in _RATES_V2:
        return 2, _RATES_V2.index(sample_rate), _BITRATES_V2_L1
    raise UnsupportedFormatError(
        f"sample rate {sample_rate} not representable in MPEG Layer I "
        f"(supported: {_RATES_V1 + _RATES_V2})"
    )


def _allocate_bits(scf_idx: np.ndarray, budget: int) -> np.ndarray:
    """Greedy waterfilling: spend `budget` bits across the 32 bands.

    A band at nb bits (2..15) costs 6 (scf) + 12*nb on first grant and
    12 per extra bit; repeatedly lower the loudest residual noise
    scf * 2^-nb.
    """
    nb = np.zeros(SUBBANDS, dtype=np.int64)
    amp = _SCALEFACTORS[scf_idx]
    noise = amp.copy()
    while True:
        granted = False
        for band in np.argsort(-noise):
            if noise[band] <= 1e-12:
                break
            if nb[band] == 0:
                cost, new = 6 + 12 * 2, 2
            elif nb[band] < 15:
                cost, new = 12, nb[band] + 1
            else:
                continue
            if cost <= budget:
                nb[band] = new
                noise[band] = amp[band] * 2.0 ** (-float(new))
                budget -= cost
                granted = True
                break
        if not granted:
            return nb


def encode_layer1(
    pcm: np.ndarray, sample_rate: int = 16000, bitrate_kbps: int = 128
) -> bytes:
    """Encode float/int16 mono PCM to an MPEG Layer I stream.

    Replaces the reference's ffmpeg mp3 encode for sample extraction
    (speaker_samples:280-326).
    """
    pcm = np.asarray(pcm)
    if pcm.ndim == 2:
        pcm = pcm.mean(axis=1)
    if pcm.dtype.kind in "iu":
        pcm = pcm.astype(np.float64) / 32768.0
    else:
        pcm = pcm.astype(np.float64)
    version_bits, sr_idx, table = _rate_indices(sample_rate)
    if bitrate_kbps not in table[1:]:
        bitrate_kbps = min(table[1:], key=lambda b: abs(b - bitrate_kbps))
    br_idx = table.index(bitrate_kbps)

    pad = (-len(pcm)) % FRAME_SAMPLES
    if pad:
        pcm = np.concatenate([pcm, np.zeros(pad)])
    frames = _analyze(pcm).reshape(-1, GRANULES, SUBBANDS)

    slots_exact = 12 * bitrate_kbps * 1000 / sample_rate
    out = bytearray()
    slot_frac = 0.0
    for frame in frames:
        slots = int(slots_exact)
        slot_frac += slots_exact - slots
        padding = 0
        if slot_frac >= 1.0:
            padding, slot_frac = 1, slot_frac - 1.0
        frame_bytes = (slots + padding) * 4

        bandmax = np.abs(frame).max(axis=0)
        # smallest scalefactor >= bandmax (_SCALEFACTORS is descending)
        scf_idx = np.clip(
            np.searchsorted(-_SCALEFACTORS, -bandmax, side="right") - 1, 0, 62
        )

        budget = frame_bytes * 8 - 32 - SUBBANDS * 4
        nb = _allocate_bits(scf_idx, budget)

        w = _BitWriter()
        w.write(0x7FF, 11)
        w.write(version_bits, 2)
        w.write(0b11, 2)  # Layer I
        w.write(1, 1)  # no CRC
        w.write(br_idx, 4)
        w.write(sr_idx, 2)
        w.write(padding, 1)
        w.write(0, 1)  # private
        w.write(0b11, 2)  # mono
        w.write(0, 2)  # mode extension
        w.write(0, 1)  # copyright
        w.write(1, 1)  # original
        w.write(0, 2)  # no emphasis
        for b in range(SUBBANDS):
            w.write(nb[b] - 1 if nb[b] else 0, 4)
        active = [b for b in range(SUBBANDS) if nb[b]]
        for b in active:
            w.write(int(scf_idx[b]), 6)
        sf = _SCALEFACTORS[scf_idx]
        for g in range(GRANULES):
            for b in active:
                # ISO Layer I dequant is s = (2c - (2^nb - 2)) / (2^nb - 1)
                # (verified against libmpg123's measured mapping); invert
                # it for the nearest code.
                bits = int(nb[b])
                levels = (1 << bits) - 1
                sn = frame[g, b] / sf[b]
                code = int(np.floor((sn * levels + levels - 1) * 0.5 + 0.5))
                w.write(max(0, min(levels, code)), bits)
        out.extend(w.pad_to(frame_bytes))
    return bytes(out)


def decode(data: bytes) -> tuple[np.ndarray, int]:
    """Decode an MPEG Layer I stream -> (float64 mono PCM in [-1,1], rate).

    Layer II/III streams raise UnsupportedFormatError with an explicit
    reason (see module docstring).
    """
    pos = 0
    if data[:3] == b"ID3" and len(data) > 10:
        size = (
            (data[6] & 0x7F) << 21
            | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7
            | (data[9] & 0x7F)
        )
        pos = 10 + size
    sb_frames: list[np.ndarray] = []
    sample_rate = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF or (data[pos + 1] & 0xE0) != 0xE0:
            pos += 1  # resync
            continue
        b1, b2 = data[pos + 1], data[pos + 2]
        version_bits = (b1 >> 3) & 0x3
        layer_bits = (b1 >> 1) & 0x3
        if layer_bits != 0b11:
            name = {0b01: "III", 0b10: "II"}.get(layer_bits, "reserved")
            raise UnsupportedFormatError(
                f"MPEG Layer {name} stream: only Layer I is supported by the "
                "first-party codec (Layer III needs the spec's Huffman tables; "
                "transcode to WAV/FLAC or MPEG Layer I)"
            )
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0x3
        padding = (b2 >> 1) & 0x1
        mode = (data[pos + 3] >> 6) & 0x3
        if version_bits == 3:
            rate, table = _RATES_V1[sr_idx] if sr_idx < 3 else 0, _BITRATES_V1_L1
        elif version_bits == 2:
            rate, table = _RATES_V2[sr_idx] if sr_idx < 3 else 0, _BITRATES_V2_L1
        else:
            raise UnsupportedFormatError("MPEG version 2.5 not supported")
        if br_idx in (0, 15) or sr_idx == 3:
            raise UnsupportedFormatError("free-format/invalid MPEG header")
        sample_rate = rate
        bitrate = table[br_idx] * 1000
        frame_bytes = (12 * bitrate // rate + padding) * 4
        frame = data[pos : pos + frame_bytes]
        if len(frame) < frame_bytes:
            break
        nch = 1 if mode == 0b11 else 2
        r = _BitReader(frame)
        r.read(32)
        if not (b1 & 1):  # protection bit 0 -> CRC present
            r.read(16)
        alloc = np.zeros((nch, SUBBANDS), dtype=np.int64)
        for b in range(SUBBANDS):
            for ch in range(nch):
                code = r.read(4)
                alloc[ch, b] = code + 1 if code else 0
        scf = np.zeros((nch, SUBBANDS), dtype=np.int64)
        for b in range(SUBBANDS):
            for ch in range(nch):
                if alloc[ch, b]:
                    scf[ch, b] = r.read(6)
        sbf = np.zeros((GRANULES, SUBBANDS), dtype=np.float64)
        for g in range(GRANULES):
            for b in range(SUBBANDS):
                acc = 0.0
                for ch in range(nch):
                    nb = int(alloc[ch, b])
                    if nb:
                        levels = (1 << nb) - 1
                        code = r.read(nb)
                        # ISO requantization (same mapping libmpg123 uses)
                        sn = (2.0 * code - (levels - 1)) / levels
                        acc += sn * _SCALEFACTORS[min(62, int(scf[ch, b]))]
                sbf[g, b] = acc / nch
        sb_frames.append(sbf)
        pos += frame_bytes
    if not sb_frames or not sample_rate:
        raise UnsupportedFormatError("no MPEG Layer I frames found")
    pcm = _synthesize(np.concatenate(sb_frames, axis=0))
    return np.clip(pcm, -1.0, 1.0), sample_rate
