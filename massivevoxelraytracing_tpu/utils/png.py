"""Minimal PNG writer (RGB/RGBA8), host-side.

Plays the role of prlib's Image2DRGBA8::saveAsPngUncompressed (used by
RTCamp.cpp:188-191 for async frame writeback). Uses zlib level 1 by default
(fast); level 0 matches the reference's uncompressed-store behavior.
A native C fast path can override `encode` later; this pure-python one is
already dominated by zlib's C core.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def encode(img: np.ndarray, compress_level: int = 1) -> bytes:
    """img: u8[H, W, 3|4] -> PNG bytes."""
    img = np.asarray(img)
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] in (3, 4)
    h, w, c = img.shape
    color_type = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.concatenate([np.zeros((h, 1), np.uint8), img.reshape(h, -1)], axis=1)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def write(path: str, img: np.ndarray, compress_level: int = 1) -> None:
    from . import native

    data = native.png_encode(np.asarray(img), compress_level)
    if data is None:
        data = encode(img, compress_level)
    with open(path, "wb") as f:
        f.write(data)


def read(path: str) -> np.ndarray:
    """Tiny PNG reader for round-trip tests (8-bit RGB/RGBA, no interlace)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    idat = b""
    w = h = c = None
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            assert depth == 8 and interlace == 0
            c = {2: 3, 6: 4}[color_type]
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    raw = np.frombuffer(zlib.decompress(idat), np.uint8).reshape(h, 1 + w * c)
    assert np.all(raw[:, 0] == 0), "only filter 0 supported"
    return raw[:, 1:].reshape(h, w, c).copy()
