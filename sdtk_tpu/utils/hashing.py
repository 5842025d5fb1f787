"""First-party BLAKE3 content addressing.

The reference shells out to the Rust ``b3sum`` CLI and truncates to 32 hex
chars (128 bits), falling back to SHA-256 when the binary is missing
(reference speaker_detection:253-269).  This framework has no external binary
dependencies, so BLAKE3 is implemented here from the public spec, three ways:

1. ``_native``  — C++ shared library (native/blake3.cc) via ctypes: the fast
   path (~GB/s) used for real audio files.
2. ``_numpy``   — chunk-parallel NumPy implementation (~100 MB/s): BLAKE3's
   1 KiB leaf chunks are independent, so the compression function vectorizes
   across chunks as uint32 array ops.
3. ``_scalar``  — plain-Python reference used for tests and tiny inputs.

All three produce identical digests; tests cross-check them against the
published empty-string / "abc" test vectors.
"""

from __future__ import annotations

import ctypes
import os
import struct
import threading
from pathlib import Path

import numpy as np

_IV = (
    0x6A09E667, 0xBB67AE85, 0x3C6EF372, 0xA54FF53A,
    0x510E527F, 0x9B05688C, 0x1F83D9AB, 0x5BE0CD19,
)
_MSG_PERM = (2, 6, 3, 10, 7, 0, 4, 13, 1, 11, 12, 5, 9, 14, 15, 8)
_CHUNK_START, _CHUNK_END, _PARENT, _ROOT = 1, 2, 4, 8
_MASK = 0xFFFFFFFF
_CHUNK_LEN = 1024
_BLOCK_LEN = 64

# (a, b, c, d, mx, my) per G application: 4 column mixes then 4 diagonal mixes.
_SCHEDULE = (
    (0, 4, 8, 12, 0, 1), (1, 5, 9, 13, 2, 3),
    (2, 6, 10, 14, 4, 5), (3, 7, 11, 15, 6, 7),
    (0, 5, 10, 15, 8, 9), (1, 6, 11, 12, 10, 11),
    (2, 7, 8, 13, 12, 13), (3, 4, 9, 14, 14, 15),
)


def _rotr(x: int, n: int) -> int:
    return ((x >> n) | (x << (32 - n))) & _MASK


def _compress(cv, m, counter, block_len, flags):
    """BLAKE3 compression; returns the 8-word chaining value."""
    v = list(cv) + list(_IV[:4]) + [
        counter & _MASK, (counter >> 32) & _MASK, block_len, flags,
    ]
    m = list(m)
    for rnd in range(7):
        for a, b, c, d, x, y in _SCHEDULE:
            va, vb, vc, vd = v[a], v[b], v[c], v[d]
            va = (va + vb + m[x]) & _MASK
            vd = _rotr(vd ^ va, 16)
            vc = (vc + vd) & _MASK
            vb = _rotr(vb ^ vc, 12)
            va = (va + vb + m[y]) & _MASK
            vd = _rotr(vd ^ va, 8)
            vc = (vc + vd) & _MASK
            vb = _rotr(vb ^ vc, 7)
            v[a], v[b], v[c], v[d] = va, vb, vc, vd
        if rnd < 6:
            m = [m[p] for p in _MSG_PERM]
    return [v[i] ^ v[i + 8] for i in range(8)]


def _chunk_cv(chunk: bytes, counter: int, is_only_chunk: bool):
    """Compress one ≤1024-byte leaf chunk to its chaining value."""
    blocks = [chunk[i : i + _BLOCK_LEN] for i in range(0, len(chunk), _BLOCK_LEN)] or [b""]
    cv = list(_IV)
    for i, blk in enumerate(blocks):
        flags = 0
        if i == 0:
            flags |= _CHUNK_START
        if i == len(blocks) - 1:
            flags |= _CHUNK_END
            if is_only_chunk:
                flags |= _ROOT
        words = struct.unpack("<16I", blk.ljust(_BLOCK_LEN, b"\0"))
        cv = _compress(cv, words, counter, len(blk), flags)
    return cv


def _merge_tree(cvs):
    """Left-pairing merge with odd carry — reproduces BLAKE3's binary tree
    (left subtree = largest power-of-two chunk count)."""
    while len(cvs) > 1:
        nxt = []
        for i in range(0, len(cvs) - 1, 2):
            flags = _PARENT | (_ROOT if len(cvs) == 2 else 0)
            nxt.append(_compress(list(_IV), cvs[i] + cvs[i + 1], 0, _BLOCK_LEN, flags))
        if len(cvs) % 2:
            nxt.append(cvs[-1])
        cvs = nxt
    return cvs[0]


def blake3_scalar(data: bytes) -> bytes:
    """Plain-Python one-shot BLAKE3 (32-byte digest)."""
    chunks = [data[i : i + _CHUNK_LEN] for i in range(0, len(data), _CHUNK_LEN)] or [b""]
    if len(chunks) == 1:
        return struct.pack("<8I", *_chunk_cv(chunks[0], 0, True))
    cvs = [_chunk_cv(c, t, False) for t, c in enumerate(chunks)]
    return struct.pack("<8I", *_merge_tree(cvs))


# ---------------------------------------------------------------------------
# NumPy chunk-parallel implementation
# ---------------------------------------------------------------------------


def _compress_np(cv, m, counter_lo, counter_hi, block_len, flags):
    """Vectorized compression over N independent nodes.

    cv: (8, N) uint32; m: (16, N) uint32; counter/block_len/flags: (N,) or
    scalar uint32.  Returns new cv (8, N).
    """
    n = cv.shape[1]
    u32 = np.uint32
    v = np.empty((16, n), dtype=u32)
    v[:8] = cv
    for i in range(4):
        v[8 + i] = u32(_IV[i])
    v[12] = counter_lo
    v[13] = counter_hi
    v[14] = block_len
    v[15] = flags
    m = [m[i] for i in range(16)]

    def rotr(x, r):
        return (x >> u32(r)) | (x << u32(32 - r))

    for rnd in range(7):
        for a, b, c, d, x, y in _SCHEDULE:
            v[a] += v[b] + m[x]
            v[d] = rotr(v[d] ^ v[a], 16)
            v[c] += v[d]
            v[b] = rotr(v[b] ^ v[c], 12)
            v[a] += v[b] + m[y]
            v[d] = rotr(v[d] ^ v[a], 8)
            v[c] += v[d]
            v[b] = rotr(v[b] ^ v[c], 7)
        if rnd < 6:
            m = [m[p] for p in _MSG_PERM]
    return v[:8] ^ v[8:]


def blake3_numpy(data: bytes) -> bytes:
    """Chunk-parallel BLAKE3: all full leaf chunks compressed simultaneously."""
    n_bytes = len(data)
    if n_bytes <= _CHUNK_LEN:
        return blake3_scalar(data)

    n_full = n_bytes // _CHUNK_LEN
    tail = data[n_full * _CHUNK_LEN :]
    if not tail:  # last chunk must be the final partial/full chunk
        n_full -= 1
        tail = data[n_full * _CHUNK_LEN :]

    # (n_full, 16 blocks, 16 words) little-endian words, → (block, word, chunk)
    words = np.frombuffer(data, dtype="<u4", count=n_full * 256).reshape(
        n_full, 16, 16
    )
    words = np.ascontiguousarray(words.transpose(1, 2, 0)).astype(np.uint32)
    counters = np.arange(n_full, dtype=np.uint64)
    c_lo = counters.astype(np.uint32)
    c_hi = (counters >> np.uint64(32)).astype(np.uint32)

    cv = np.tile(np.array(_IV, dtype=np.uint32)[:, None], (1, n_full))
    for blk in range(16):
        flags = (_CHUNK_START if blk == 0 else 0) | (_CHUNK_END if blk == 15 else 0)
        cv = _compress_np(
            cv, words[blk], c_lo, c_hi, np.uint32(_BLOCK_LEN), np.uint32(flags)
        )

    cvs = [list(int(x) for x in cv[:, i]) for i in range(n_full)]
    cvs.append(_chunk_cv(tail, n_full, False))

    # Parent levels, vectorized while wide enough to matter.
    while len(cvs) > 2:
        n_pairs = (len(cvs)) // 2
        left = np.array([cvs[2 * i] for i in range(n_pairs)], dtype=np.uint32).T
        right = np.array([cvs[2 * i + 1] for i in range(n_pairs)], dtype=np.uint32).T
        m = np.concatenate([left, right], axis=0)
        out = _compress_np(
            np.tile(np.array(_IV, dtype=np.uint32)[:, None], (1, n_pairs)),
            m,
            np.uint32(0),
            np.uint32(0),
            np.uint32(_BLOCK_LEN),
            np.uint32(_PARENT),
        )
        nxt = [list(int(x) for x in out[:, i]) for i in range(n_pairs)]
        if len(cvs) % 2:
            nxt.append(cvs[-1])
        cvs = nxt
    return struct.pack("<8I", *_merge_tree(cvs))


# ---------------------------------------------------------------------------
# Native (C++) implementation via ctypes
# ---------------------------------------------------------------------------

_native_lock = threading.Lock()
_native_lib: ctypes.CDLL | None | bool = None  # None=untried, False=unavailable


def _find_native() -> ctypes.CDLL | None:
    global _native_lib
    with _native_lock:
        if _native_lib is not None:
            return _native_lib or None
        lib_path = Path(__file__).resolve().parent.parent / "_native" / "libsdtk_native.so"
        if not lib_path.exists():
            # Try a one-shot build if the toolchain is present.
            src_dir = Path(__file__).resolve().parent.parent.parent / "native"
            if src_dir.exists() and os.environ.get("SDTK_NO_NATIVE_BUILD") != "1":
                import subprocess

                try:
                    subprocess.run(
                        ["make", "-s", "-C", str(src_dir)],
                        capture_output=True,
                        timeout=120,
                        check=True,
                    )
                except Exception:
                    pass
        if lib_path.exists():
            try:
                lib = ctypes.CDLL(str(lib_path))
                lib.sdtk_blake3.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_size_t,
                    ctypes.c_char_p,
                ]
                lib.sdtk_blake3.restype = None
                _native_lib = lib
                return lib
            except OSError:
                pass
        _native_lib = False
        return None


def blake3_native(data: bytes) -> bytes | None:
    lib = _find_native()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(32)
    lib.sdtk_blake3(data, len(data), out)
    return out.raw


def blake3(data: bytes) -> bytes:
    """One-shot BLAKE3 digest (32 bytes), fastest available implementation."""
    if len(data) >= 4096:
        d = blake3_native(data)
        if d is not None:
            return d
        return blake3_numpy(data)
    return blake3_scalar(data)


def blake3_hex(data: bytes) -> str:
    return blake3(data).hex()


def compute_b3sum(file_path: str | Path) -> str:
    """32-hex-char (128-bit) BLAKE3 of a file — the reference's content key
    (speaker_detection:253-269 truncates b3sum output to 32 chars)."""
    with open(file_path, "rb") as f:
        data = f.read()
    return blake3_hex(data)[:32]


def compute_b3sum_full(file_path: str | Path) -> str:
    """Full 64-hex-char BLAKE3 of a file."""
    with open(file_path, "rb") as f:
        return blake3_hex(f.read())
