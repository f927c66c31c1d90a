"""Minimal pure-stdlib BMP codec (struct only — no imaging library).

Supports the uncompressed 24-bit BI_RGB Windows DIB — BITMAPFILEHEADER +
BITMAPINFOHEADER, BGR samples, rows padded to 4 bytes, bottom-up (positive
height) or top-down (negative height) row order. That is the BMP variant
virtually every producer writes; palettized/RLE/16-bit variants raise
``BmpFormatError`` (errors stay data in the operators layer).

Second REAL raster codec next to functions/png.py: where PNG exercises the
compressed (zlib + scanline-filter) path, BMP exercises the raw-DIB path —
channel deinterleave (BGR→RGB), row padding, and row-order flip are the
decode work. JPEG (DCT/huffman family), compressed audio and video remain
stubbed: they need a codec library (Pillow/ffmpeg) that is not in this
container, documented in operators/multimodal.py.
"""

from __future__ import annotations

import struct

BMP_SIGNATURE = b"BM"


class BmpFormatError(ValueError):
    pass


def encode_bmp(width: int, height: int, pixels_rgb: bytes,
               top_down: bool = False) -> bytes:
    """pixels_rgb = row-major TOP-DOWN interleaved RGB, 8 bits per sample.
    Written as a standard bottom-up 24-bit BI_RGB DIB (or top-down when
    ``top_down`` — negative biHeight — to exercise both row orders)."""
    if len(pixels_rgb) != width * height * 3:
        raise BmpFormatError("pixel buffer does not match dims")
    stride = width * 3
    pad = (-stride) % 4
    rows = [pixels_rgb[y * stride:(y + 1) * stride] for y in range(height)]
    if not top_down:
        rows = rows[::-1]
    body = b"".join(
        bytes(ch for x in range(width)
              for ch in (row[x * 3 + 2], row[x * 3 + 1], row[x * 3]))
        + b"\x00" * pad
        for row in rows
    )
    offset = 14 + 40
    header = (BMP_SIGNATURE
              + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
              + struct.pack("<IiiHHIIiiII", 40, width,
                            -height if top_down else height,
                            1, 24, 0, len(body), 2835, 2835, 0, 0))
    return header + body


def bmp_meta(data: bytes) -> tuple[int, int, int]:
    """Header-only (width, height, bpp) — never touches pixel rows."""
    if data[:2] != BMP_SIGNATURE:
        raise BmpFormatError("not a BMP")
    if len(data) < 14 + 40:
        raise BmpFormatError("truncated header")
    size, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if size < 40:
        raise BmpFormatError(f"unsupported DIB header size {size}")
    return w, abs(h), bpp


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Full decode → (width, height, channels, row-major TOP-DOWN RGB)."""
    if data[:2] != BMP_SIGNATURE:
        raise BmpFormatError("not a BMP")
    if len(data) < 14 + 40:
        raise BmpFormatError("truncated header")
    offset = struct.unpack("<I", data[10:14])[0]
    size, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if size < 40:
        raise BmpFormatError(f"unsupported DIB header size {size}")
    if comp != 0 or bpp != 24:
        raise BmpFormatError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    if w <= 0 or h == 0:
        raise BmpFormatError(f"bad dims {w}x{h}")
    top_down = h < 0
    h = abs(h)
    stride = w * 3 + ((-(w * 3)) % 4)
    if len(data) < offset + stride * h:
        raise BmpFormatError("truncated pixel data")
    out = bytearray(w * h * 3)
    for y in range(h):
        src_y = y if top_down else h - 1 - y
        row = data[offset + src_y * stride: offset + src_y * stride + w * 3]
        base = y * w * 3
        for x in range(w):
            out[base + x * 3] = row[x * 3 + 2]        # R <- B slot
            out[base + x * 3 + 1] = row[x * 3 + 1]    # G
            out[base + x * 3 + 2] = row[x * 3]        # B <- R slot
    return w, h, 3, bytes(out)
