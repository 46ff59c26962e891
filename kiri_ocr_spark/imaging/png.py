"""Minimal pure-stdlib PNG codec for 8-bit grayscale images.

The sandbox has no cv2/PIL, so media payloads are real PNG bytes produced
and consumed by this codec (zlib + struct only). Mirrors the role of
``cv2.imread``/``cv2.imencode`` in the reference
(/root/reference/kiri_ocr/core.py:762-764) for the media-span path.

Encoder writes color type 0 (grayscale), bit depth 8, filter 0 rows.
Decoder supports color type 0 bit depth 8 with all five standard row
filters (None/Sub/Up/Average/Paeth), no interlace.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_gray(img: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array as grayscale PNG bytes."""
    if img.ndim != 2:
        raise ValueError(f"expected 2-D grayscale array, got shape {img.shape}")
    arr = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    # filter byte 0 prepended to every row
    raw = np.empty((h, w + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def decode_gray(data: bytes) -> np.ndarray:
    """Decode grayscale PNG bytes to a 2-D uint8 array."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG stream")
    pos = 8
    width = height = None
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, _, _, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or ctype != 0 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG: depth={depth} colortype={ctype} interlace={interlace}"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != height * (width + 1):
        raise ValueError("bad IDAT payload size")
    rows = raw.reshape(height, width + 1)
    filters = rows[:, 0]
    out = np.zeros((height, width), dtype=np.uint8)
    if not filters.any():
        # fast path: all rows filter 0 (what encode_gray writes)
        out[:] = rows[:, 1:]
        return out
    for y in range(height):
        f = int(filters[y])
        cur = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(width, np.int32)
        if f == 0:
            line = cur
        elif f == 2:  # Up
            line = (cur + prev) & 0xFF
        else:
            line = np.zeros(width, np.int32)
            for x in range(width):
                a = line[x - 1] if x > 0 else 0
                b = prev[x]
                c = prev[x - 1] if x > 0 else 0
                if f == 1:  # Sub
                    pred = a
                elif f == 3:  # Average
                    pred = (a + b) // 2
                elif f == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"bad filter {f}")
                line[x] = (cur[x] + pred) & 0xFF
        out[y] = line.astype(np.uint8)
    return out
