"""Loader for the native runtime library (native/*.cc → libsdtk_native.so).

Builds lazily via make when the toolchain is present; callers treat a
``None`` return as "fall back to the Python implementation".
"""

from __future__ import annotations

import ctypes
import os
import threading
from pathlib import Path

_lock = threading.Lock()
_lib: ctypes.CDLL | None | bool = None  # None=untried, False=unavailable


def get_lib() -> ctypes.CDLL | None:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib or None
        lib_path = Path(__file__).resolve().parent.parent / "_native" / "libsdtk_native.so"
        if not lib_path.exists():
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
                _declare(lib)
                _lib = lib
                return lib
            except OSError:
                pass
        _lib = False
        return None


def _declare(lib: ctypes.CDLL) -> None:
    lib.sdtk_blake3.argtypes = [ctypes.c_char_p, ctypes.c_size_t, ctypes.c_char_p]
    lib.sdtk_blake3.restype = None

    lib.sdtk_decode_wav.argtypes = [
        ctypes.c_char_p,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.sdtk_decode_wav.restype = ctypes.c_int

    lib.sdtk_decode_wav_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.sdtk_decode_wav_batch.restype = None

    lib.sdtk_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.sdtk_free.restype = None
