"""ctypes bindings for libvapaudio (native/vapaudio.cpp).

Auto-builds the shared object on first use when a compiler is present
(`make -C native`); every entry point has a NumPy/SciPy fallback so the
framework works without the native library (e.g. no toolchain).
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libvapaudio.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_SO_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) and os.path.exists(
        os.path.join(_NATIVE_DIR, "vapaudio.cpp")
    ):
        _build()
    if not os.path.exists(_SO_PATH):
        return None
    lib = ctypes.CDLL(_SO_PATH)

    lib.vap_wav_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_long),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.vap_wav_info.restype = ctypes.c_int

    lib.vap_wav_read.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.vap_wav_read.restype = ctypes.c_long

    lib.vap_resample_poly.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.vap_resample_poly.restype = ctypes.c_long

    lib.vap_deinterleave_i16.argtypes = [
        ctypes.POINTER(ctypes.c_int16), ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.vap_deinterleave_i16.restype = None

    lib.vap_rle_i32.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_long,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.vap_rle_i32.restype = ctypes.c_long

    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def wav_info(path: str) -> Optional[Tuple[int, int, int, int]]:
    """(sample_rate, channels, n_frames, bits) or None."""
    lib = get_lib()
    if lib is None:
        return None
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    n = ctypes.c_long()
    bits = ctypes.c_int()
    rc = lib.vap_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                          ctypes.byref(n), ctypes.byref(bits))
    if rc != 0:
        return None
    return sr.value, ch.value, n.value, bits.value


def wav_read(
    path: str, start_frame: int = 0, n_frames: Optional[int] = None
) -> Optional[Tuple[np.ndarray, int]]:
    """((channels, n) float32, sample_rate) or None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    info = wav_info(path)
    if info is None:
        return None
    sr, ch, total, _ = info
    if n_frames is None:
        n_frames = total - start_frame
    n_frames = max(0, min(n_frames, total - start_frame))
    buf = np.empty(n_frames * ch, dtype=np.float32)
    got = lib.vap_wav_read(path.encode(), start_frame, n_frames, _fptr(buf))
    if got < 0:
        return None
    x = buf[: got * ch].reshape(got, ch).T
    return np.ascontiguousarray(x), sr


def resample_poly(x: np.ndarray, up: int, down: int) -> Optional[np.ndarray]:
    """Channel-major (ch, n) or (n,) polyphase resample; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    # the C kernel designs a ~20*max(up, down)-tap filter: an unreduced
    # ratio like (16000, 8000) would build a 320k-tap FIR and effectively
    # hang — reduce by gcd here so every caller is safe
    g = math.gcd(int(up), int(down))
    up, down = int(up) // g, int(down) // g
    x = np.ascontiguousarray(x, dtype=np.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    ch, n = x.shape
    n_out = -(-n * up // down)
    out = np.empty((ch, n_out), dtype=np.float32)
    got = lib.vap_resample_poly(_fptr(x), n, ch, up, down, _fptr(out))
    if got < 0:
        return None
    return out[0] if squeeze else out


def deinterleave_i16(raw: bytes, channels: int = 2) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.frombuffer(raw, dtype=np.int16)
    n = len(x) // channels
    out = np.empty((channels, n), dtype=np.float32)
    lib.vap_deinterleave_i16(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n, channels, _fptr(out)
    )
    return out


def rle_i32(x: np.ndarray) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.int32)
    n = len(x)
    starts = np.empty(n, dtype=np.int32)
    durs = np.empty(n, dtype=np.int32)
    vals = np.empty(n, dtype=np.int32)
    p = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    r = lib.vap_rle_i32(p(x), n, p(starts), p(durs), p(vals))
    return starts[:r].copy(), durs[:r].copy(), vals[:r].copy()
