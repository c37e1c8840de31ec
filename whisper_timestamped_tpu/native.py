"""ctypes bindings for the C++ host components (native/wtt_native.cpp).

Builds the shared library on first use (g++ is in the image; pybind11 is not,
so the ABI is plain C via ctypes). Every consumer has a pure-Python fallback;
``available()`` gates usage.
"""

from __future__ import annotations

import ctypes
import logging
import os
import struct
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

logger = logging.getLogger("whisper_timestamped_tpu")

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libwtt_native.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "wtt_native.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC_PATH, "-o", _LIB_PATH],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return True
    except Exception as e:  # pragma: no cover - toolchain issues
        logger.warning("native build failed (%s); using pure-Python fallbacks", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        have_lib = os.path.exists(_LIB_PATH)
        have_src = os.path.exists(_SRC_PATH)
        # a prebuilt .so without the source is fine (e.g. pruned install);
        # rebuild only when the source exists and is newer than the .so
        stale = (
            have_src
            and have_lib
            and os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC_PATH)
        )
        if not have_lib or stale:
            if not have_src or not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.wtt_bpe_new.restype = ctypes.c_void_p
        lib.wtt_bpe_new.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.wtt_bpe_free.argtypes = [ctypes.c_void_p]
        lib.wtt_bpe_encode_piece.restype = ctypes.c_int32
        lib.wtt_bpe_encode_piece.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_uint32,
        ]
        lib.wtt_dtw_path.restype = ctypes.c_int32
        lib.wtt_dtw_path.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# BPE
# ---------------------------------------------------------------------------


class NativeBPE:
    """C++ rank-based BPE core (same semantics as BytePairEncoder)."""

    def __init__(self, ranks: dict):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native library unavailable")
        parts = []
        for k, v in ranks.items():
            parts.append(struct.pack("<I", len(k)) + k + struct.pack("<i", v))
        blob = b"".join(parts)
        self._lib = lib
        self._handle = lib.wtt_bpe_new(blob, len(blob))

    def encode_piece(self, piece: bytes) -> List[int]:
        # per-call buffer: reentrant under threads, and sized to the piece
        # (worst case one id per input byte), so no length ever overflows
        buf = (ctypes.c_int32 * max(16, len(piece)))()
        n = self._lib.wtt_bpe_encode_piece(
            self._handle, piece, len(piece), buf, len(buf)
        )
        if n == -1:
            raise KeyError(f"byte sequence not in vocabulary: {piece!r}")
        if n == -2:  # pragma: no cover - buffer is provably large enough
            raise RuntimeError("native BPE output buffer too small")
        return list(buf[:n])

    def __del__(self):
        try:
            self._lib.wtt_bpe_free(self._handle)
        except Exception:
            pass


# ---------------------------------------------------------------------------
# DTW
# ---------------------------------------------------------------------------


def dtw_path_native(x: np.ndarray, allow_vertical: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float64)
    n, m = x.shape
    cap = n + m
    pi = (ctypes.c_int32 * cap)()
    pj = (ctypes.c_int32 * cap)()
    length = lib.wtt_dtw_path(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, m, int(allow_vertical), pi, pj, cap,
    )
    if length < 0:
        raise RuntimeError("native DTW path buffer too small")
    return np.array(pi[:length], np.int64), np.array(pj[:length], np.int64)
