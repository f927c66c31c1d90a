"""Minimal pure-stdlib PNG codec (zlib + struct — no imaging library).

Supports non-interlaced 8-bit grayscale (color type 0), RGB (2) and RGBA (6)
— the formats a training-data pipeline overwhelmingly sees after
normalization. Encode writes filter-0 scanlines; decode implements all five
PNG scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6), so any
conforming encoder's output of these color types round-trips.

This exists so the multimodal operators decode REAL image bytes inside the
sandbox (no Pillow/opencv present): the mapInPandas media path is exercised
with an actual compressed container format, not only the FAKEIMG1 stub.
Compressed video remains stubbed (documented in operators/multimodal.py).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# Decompression-bomb guard: a few-KB blob can declare 65535x65535 dims and
# zlib-expand ~1000x; without a cap one crafted row could OOM the Python
# worker and kill a 100 TB scan. 64 MP (~256 MB RGBA) is far above any
# training-corpus image; oversized claims become decode errors (= data).
MAX_PIXELS = 64_000_000

_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA


class PngFormatError(ValueError):
    pass


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 2) -> bytes:
    """pixels = row-major interleaved samples, 8 bits per sample."""
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise PngFormatError(f"unsupported color type {color_type}")
    if len(pixels) != width * height * ch:
        raise PngFormatError("pixel buffer does not match dims")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * ch
    raw = b"".join(
        b"\x00" + pixels[y * stride:(y + 1) * stride] for y in range(height)
    )
    return (PNG_SIGNATURE
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def png_meta(data: bytes) -> tuple[int, int, int, int]:
    """(width, height, bit_depth, color_type) from IHDR — header-only read,
    never touches IDAT (cheap metadata scans over binary columns)."""
    if data[:8] != PNG_SIGNATURE:
        raise PngFormatError("not a PNG")
    if data[12:16] != b"IHDR":
        raise PngFormatError("missing IHDR")
    w, h, depth, ctype = struct.unpack(">IIBB", data[16:26])
    return w, h, depth, ctype


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes, max_pixels: int = MAX_PIXELS
               ) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) — full unfilter of IDAT scanlines."""
    w, h, depth, ctype = png_meta(data)
    if depth != 8 or ctype not in _CHANNELS:
        raise PngFormatError(f"unsupported PNG (depth={depth}, color={ctype})")
    if w * h > max_pixels:
        raise PngFormatError(f"dims too large ({w}x{h} > {max_pixels} px)")
    ch = _CHANNELS[ctype]

    idat = bytearray()
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IDAT":
            idat += body
        elif tag == b"IHDR":
            if struct.unpack(">B", body[12:13])[0] != 0:
                raise PngFormatError("interlaced PNG not supported")
        elif tag == b"IEND":
            break
        pos += 12 + length
    stride = w * ch
    expected = h * (stride + 1)
    # Bounded inflate: ask for at most expected+1 bytes so a stream that
    # zlib-expands past the header-declared dims is rejected without ever
    # materializing the bomb.
    raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
    if len(raw) != expected:
        raise PngFormatError("IDAT size does not match dims")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 1:    # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise PngFormatError(f"unknown filter {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return w, h, ch, bytes(out)
