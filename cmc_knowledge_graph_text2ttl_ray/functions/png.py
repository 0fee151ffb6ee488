"""Minimal pure-Python PNG decoder (no native codecs in this environment).

Upgrades the multimodal pipeline's codec boundary from a stand-in to a real
decode for the most common lossless web format. Implements the PNG spec's
(RFC 2083 / W3C PNG, public) core:

- 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
- all five scanline filters (None/Sub/Up/Average/Paeth),
- concatenated IDAT chunks, zlib inflate, no interlace.

``decode_png`` returns an ``(h, w, channels)`` uint8 array;
``decode_png_gray`` collapses to ``(h, w)`` luma (ITU-R 601 integer
weights) so the array plugs directly into the existing feature / resize /
phash kernels. Unsupported images raise :class:`PngError`.

Filter reconstruction is vectorized where the filter allows (Sub is a
per-lane prefix sum mod 256, Up is one vector add); Average/Paeth are
sequential by definition and fall back to a per-pixel loop.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["PngError", "decode_png", "decode_png_gray"]

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(Exception):
    pass


def _chunks(data: bytes):
    pos = len(_SIG)
    n = len(data)
    while pos + 8 <= n:
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise PngError("Truncated chunk")
        yield ctype, body
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IEND":
            return


def decode_png(data: bytes) -> np.ndarray:
    if not data.startswith(_SIG):
        raise PngError("Not a PNG (bad signature)")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            if len(body) != 13:
                raise PngError(f"IHDR must be 13 bytes, got {len(body)}")
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if width == 0 or height == 0:
                raise PngError("Zero-dimension PNG")
            if depth != 8:
                raise PngError(f"Unsupported bit depth {depth} (only 8)")
            if color not in _CHANNELS:
                raise PngError(f"Unsupported color type {color}")
            if interlace != 0:
                raise PngError("Interlaced PNGs are not supported")
            if comp != 0 or filt != 0:
                raise PngError("Non-standard compression/filter method")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise PngError("Missing IHDR")
    if not idat:
        raise PngError("Missing IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as ex:
        raise PngError(f"Bad IDAT stream: {ex}") from ex
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise PngError("IDAT size does not match dimensions")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64)   # headroom for the filter math
    out = np.zeros((height, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    bpp = channels
    for y in range(height):
        f = int(filters[y])
        row = rows[y]
        if f == 0:                                   # None
            rec = row
        elif f == 1:                                 # Sub: per-lane cumsum
            rec = np.cumsum(row.reshape(width, bpp), axis=0) % 256
            rec = rec.reshape(stride)
        elif f == 2:                                 # Up
            rec = (row + prev) % 256
        elif f == 3:                                 # Average (sequential)
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (row[x] + (left + prev[x]) // 2) % 256
        elif f == 4:                                 # Paeth (sequential)
            rec = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (row[x] + pred) % 256
        else:
            raise PngError(f"Unknown scanline filter {f}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(height, width, channels)


def decode_png_gray(data: bytes) -> np.ndarray:
    """PNG → (h, w) uint8 luma (gray/alpha images use the gray channel;
    RGB(A) uses integer ITU-R 601 weights)."""
    img = decode_png(data)
    c = img.shape[2]
    if c in (1, 2):
        return img[:, :, 0]
    r = img[:, :, 0].astype(np.int64)
    g = img[:, :, 1].astype(np.int64)
    b = img[:, :, 2].astype(np.int64)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)
