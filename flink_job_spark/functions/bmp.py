"""Minimal pure-stdlib BMP codec (struct only — no imaging library).

Supports the uncompressed 24-bit BI_RGB Windows DIB — BITMAPFILEHEADER +
BITMAPINFOHEADER, BGR samples, rows padded to 4 bytes, bottom-up (positive
height) or top-down (negative height) row order. That is the BMP variant
virtually every producer writes; palettized/RLE/16-bit variants raise
``BmpFormatError`` (errors stay data in the operators layer).

Second REAL raster codec next to functions/png.py: where PNG exercises the
compressed (zlib + scanline-filter) path, BMP exercises the raw-DIB path —
channel deinterleave (BGR→RGB), row padding, and row-order flip are the
decode work. Compressed audio and video remain stubbed: they need a codec
library (ffmpeg) that is not in this container, documented in
operators/multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np

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
    # Vectorized interleave (matches avi._dib_to_frame): reshape to
    # (h, w, 3), flip rows for bottom-up storage, reverse channels RGB→BGR,
    # right-pad each row to the 4-byte boundary.
    arr = np.frombuffer(pixels_rgb, np.uint8).reshape(height, width, 3)
    if not top_down:
        arr = arr[::-1]
    padded = np.zeros((height, stride + pad), np.uint8)
    padded[:, :stride] = arr[..., ::-1].reshape(height, stride)
    body = padded.tobytes()
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
    # Vectorized deinterleave (hot path of q_media_bmp_stats /
    # q_media_resize_real): strip row padding, flip bottom-up rows,
    # reverse channels BGR→RGB — all numpy slicing, no per-pixel Python.
    rows = (np.frombuffer(data, np.uint8, count=stride * h, offset=offset)
              .reshape(h, stride)[:, :w * 3].reshape(h, w, 3))
    if not top_down:
        rows = rows[::-1]
    return w, h, 3, rows[..., ::-1].tobytes()
