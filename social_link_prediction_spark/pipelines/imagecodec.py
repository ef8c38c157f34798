"""Minimal pure-stdlib PNG decode for the multimodal pipeline.

Implements enough of the PNG specification (RFC 2083 / W3C PNG) to
decode the common cases a crawl corpus actually contains — 8-bit
greyscale (color type 0), RGB (2) and RGBA (6), non-interlaced —
using only ``zlib``/``struct``. All five scanline filter types
(None/Sub/Up/Average/Paeth) are reconstructed. PIL replaces this path
when importable (``multimodal.extract_features``); this keeps real
byte-level decoding testable in environments without image libraries
instead of stubbing it.

Returns rows of (r, g, b) tuples; greyscale and alpha are normalized
to RGB (alpha is dropped — feature extraction pools luminance).
"""

from __future__ import annotations

import struct
import zlib

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# samples per pixel by color type (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _PNG_MAGIC


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytearray:
    """Reverse per-scanline filtering; returns packed sample bytes."""
    stride = width * bpp
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                upleft = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG: unknown filter type {ftype}")
        out.extend(line)
        prev = line
    return out


def decode_png(data: bytes) -> tuple[int, int, list[list[tuple[int, int, int]]]]:
    """Decode a PNG byte string -> (width, height, rows of (r,g,b))."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("not a PNG (bad magic)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG: missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"PNG: unsupported format (bit_depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace}); "
            "only 8-bit non-interlaced grey/RGB/RGBA are decoded"
        )
    bpp = _CHANNELS[color_type]
    samples = _unfilter(zlib.decompress(bytes(idat)), width, height, bpp)
    rows: list[list[tuple[int, int, int]]] = []
    for y in range(height):
        row = []
        base = y * width * bpp
        for x in range(width):
            px = samples[base + x * bpp : base + (x + 1) * bpp]
            if color_type == 0:
                row.append((px[0], px[0], px[0]))
            elif color_type == 4:
                row.append((px[0], px[0], px[0]))
            else:  # 2 or 6: first three samples are RGB
                row.append((px[0], px[1], px[2]))
        rows.append(row)
    return width, height, rows


def encode_png_rgb(rows: list[list[tuple[int, int, int]]]) -> bytes:
    """Tiny RGB encoder (filter 0 scanlines) — used by tests to build
    real PNGs without image libraries."""
    height = len(rows)
    width = len(rows[0]) if height else 0
    raw = bytearray()
    for row in rows:
        raw.append(0)
        for r, g, b in row:
            raw.extend((r, g, b))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
