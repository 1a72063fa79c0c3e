"""ctypes bridge to the native host runtime (csrc/native.cpp).

Builds build/libmvrt.so on demand with g++ (cached by source mtime) and
falls back to the pure-python implementations when no compiler is available.
This is the TPU build's version of the reference's compiled host layer
(hipUtil/prlib): compute stays on the TPU, host IO/generation stays native.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "csrc", "native.cpp")
_SO = os.path.join(_ROOT, "build", "libmvrt.so")

_lib = None
_tried = False


def get_lib():
    """Returns the loaded library or None (fallback to python paths)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            os.makedirs(os.path.dirname(_SO), exist_ok=True)
            subprocess.run(
                ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-Wall",
                 "-shared", "-o", _SO, _SRC, "-lz"],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.mvrt_png_encode.restype = ctypes.c_int64
        lib.mvrt_png_bound.restype = ctypes.c_int64
        lib.mvrt_hdr_decode.restype = ctypes.c_int32
        lib.mvrt_obj_parse.restype = ctypes.c_int64
        lib.mvrt_murmur3_32.restype = ctypes.c_uint32
        _lib = lib
    except Exception as e:
        import sys

        msg = e
        if isinstance(e, subprocess.CalledProcessError):
            msg = (e.stderr or b"").decode(errors="replace")[-400:]
        sys.stderr.write(
            f"[native] libmvrt build/load failed, using python fallbacks: {msg}\n"
        )
        _lib = None
    return _lib


def _ptr(a, t):
    return a.ctypes.data_as(ctypes.POINTER(t))


def png_encode(img: np.ndarray, level: int = 1) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    cap = lib.mvrt_png_bound(w, h, c)
    out = np.empty(cap, np.uint8)
    n = lib.mvrt_png_encode(
        _ptr(img, ctypes.c_uint8), w, h, c, level,
        _ptr(out, ctypes.c_uint8), cap,
    )
    if n <= 0:
        return None
    return out[:n].tobytes()


def hdr_decode(pix: bytes, w: int, h: int) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(pix, np.uint8)
    out = np.empty((h, w, 3), np.float32)
    rc = lib.mvrt_hdr_decode(
        _ptr(buf, ctypes.c_uint8), len(buf), w, h, _ptr(out, ctypes.c_float)
    )
    return out if rc == 0 else None


def obj_parse(path: str) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        text = f.read()
    buf = np.frombuffer(text, np.uint8)
    n = lib.mvrt_obj_parse(
        _ptr(buf, ctypes.c_char), len(buf), None, 0
    )
    if n < 0:
        return None
    out = np.empty((n, 3, 3), np.float32)
    n2 = lib.mvrt_obj_parse(
        _ptr(buf, ctypes.c_char), len(buf), _ptr(out, ctypes.c_float), n
    )
    return out if n2 == n else None


def pmj02_table(n_sequence: int, length: int, seed: int = 0,
                stream: int = 2525) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((n_sequence, length, 2), np.float32)
    lib.mvrt_pmj02_table(
        ctypes.c_int32(n_sequence), ctypes.c_int32(length),
        ctypes.c_uint64(seed), ctypes.c_uint64(stream),
        _ptr(out, ctypes.c_float),
    )
    return out


def morton_encode(x, y, z) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, np.uint32)
    y = np.ascontiguousarray(y, np.uint32)
    z = np.ascontiguousarray(z, np.uint32)
    out = np.empty(len(x), np.uint64)
    lib.mvrt_morton_encode(
        _ptr(x, ctypes.c_uint32), _ptr(y, ctypes.c_uint32),
        _ptr(z, ctypes.c_uint32), len(x), _ptr(out, ctypes.c_uint64),
    )
    return out


def morton_decode(m) -> tuple | None:
    lib = get_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(m, np.uint64)
    x = np.empty(len(m), np.uint32)
    y = np.empty(len(m), np.uint32)
    z = np.empty(len(m), np.uint32)
    lib.mvrt_morton_decode(
        _ptr(m, ctypes.c_uint64), len(m), _ptr(x, ctypes.c_uint32),
        _ptr(y, ctypes.c_uint32), _ptr(z, ctypes.c_uint32),
    )
    return x, y, z


def murmur3_32(data: bytes, seed: int = 0) -> int | None:
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    if len(buf) == 0:
        buf = np.zeros(1, np.uint8)
    return int(lib.mvrt_murmur3_32(_ptr(buf, ctypes.c_uint8), len(data), seed))
