"""Minimal pure-stdlib BMP codec (struct only — no imaging library).

Decodes the four DIB layouts a crawl actually meets: 24-bit BI_RGB (what
most producers write), 32-bit BI_RGB (BGRX — the screenshot layout; the X
byte is undefined and dropped), 8-bit palettized BI_RGB (color-table
lookup) and 8-bit BI_RLE8 (run-length, incl. absolute mode and delta
skips). BITMAPFILEHEADER + BITMAPINFOHEADER, rows padded to 4 bytes,
bottom-up (positive height) or top-down (negative height) row order.
16-bit bitfield variants raise ``BmpFormatError`` (errors stay data in the
operators layer).

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


BI_RGB, BI_RLE8 = 0, 1
MAX_BMP_PIXELS = 64_000_000  # same bomb bound as functions/png.py


def decode_bmp(data: bytes) -> tuple[int, int, int, bytes]:
    """Full decode → (width, height, channels, row-major TOP-DOWN RGB).

    Layouts: 24-bit BI_RGB (the classic), 32-bit BI_RGB (BGRX screenshots —
    the X byte is undefined under BI_RGB and is dropped), 8-bit palettized
    BI_RGB (color-table lookup) and 8-bit BI_RLE8 (run-length: runs,
    absolute mode, end-of-line/bitmap, delta skips — skipped pixels are
    black per the de-facto decoder convention)."""
    if data[:2] != BMP_SIGNATURE:
        raise BmpFormatError("not a BMP")
    if len(data) < 14 + 40:
        raise BmpFormatError("truncated header")
    offset = struct.unpack("<I", data[10:14])[0]
    size, w, h, planes, bpp, comp = struct.unpack("<IiiHHI", data[14:34])
    if size < 40:
        raise BmpFormatError(f"unsupported DIB header size {size}")
    if (bpp, comp) not in ((24, BI_RGB), (32, BI_RGB), (8, BI_RGB),
                           (8, BI_RLE8)):
        raise BmpFormatError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    if w <= 0 or h == 0:
        raise BmpFormatError(f"bad dims {w}x{h}")
    top_down = h < 0
    h = abs(h)
    if w * h > MAX_BMP_PIXELS:
        raise BmpFormatError(f"dims too large ({w}x{h} > {MAX_BMP_PIXELS} px)")

    if bpp == 8:
        # color table sits between the DIB header and the pixel offset
        n_colors = struct.unpack("<I", data[46:50])[0] or 256
        tbl_off = 14 + size
        if tbl_off + n_colors * 4 > min(offset, len(data)):
            raise BmpFormatError("truncated color table")
        tbl = np.frombuffer(data, np.uint8, count=n_colors * 4,
                            offset=tbl_off).reshape(n_colors, 4)
        palette = tbl[:, 2::-1]                     # BGRX -> RGB
        if comp == BI_RLE8:
            idx = _decode_rle8(data, offset, w, h)  # always bottom-up
            if top_down:
                raise BmpFormatError("RLE8 BMPs cannot be top-down")
        else:
            stride = w + ((-w) % 4)
            if len(data) < offset + stride * h:
                raise BmpFormatError("truncated pixel data")
            idx = (np.frombuffer(data, np.uint8, count=stride * h,
                                 offset=offset).reshape(h, stride)[:, :w])
        if int(idx.max()) >= n_colors:
            raise BmpFormatError("palette index out of range")
        rows = palette[idx]                         # (h, w, 3)
        if not top_down and comp == BI_RGB:
            rows = rows[::-1]
        if comp == BI_RLE8:
            rows = rows[::-1]                       # RLE is bottom-up
        return w, h, 3, np.ascontiguousarray(rows).tobytes()

    ch = bpp // 8                                   # 3 or 4
    stride = w * ch + ((-(w * ch)) % 4)
    if len(data) < offset + stride * h:
        raise BmpFormatError("truncated pixel data")
    # Vectorized deinterleave (hot path of q_media_bmp_stats /
    # q_media_resize_real): strip row padding, flip bottom-up rows,
    # reverse channels BGR(X)→RGB — all numpy slicing, no per-pixel Python.
    rows = (np.frombuffer(data, np.uint8, count=stride * h, offset=offset)
              .reshape(h, stride)[:, :w * ch].reshape(h, w, ch))
    if not top_down:
        rows = rows[::-1]
    return w, h, 3, np.ascontiguousarray(rows[..., 2::-1]).tobytes()


def _decode_rle8(data: bytes, offset: int, w: int, h: int) -> "np.ndarray":
    """BI_RLE8 → (h, w) index array in STORED (bottom-up) row order.
    Encoded pairs: (n>0, v) = run; (0, 0) = end of line; (0, 1) = end of
    bitmap; (0, 2, dx, dy) = delta skip; (0, n>=3, bytes..., pad) =
    absolute mode. Unwritten pixels stay 0 (index 0), the convention
    every mainstream decoder follows."""
    out = np.zeros((h, w), np.uint8)
    x = y = 0
    p = offset
    n = len(data)
    while p + 1 < n:
        c, v = data[p], data[p + 1]
        p += 2
        if c > 0:                                   # run
            if y >= h or x + c > w:
                raise BmpFormatError("RLE8 run overflows row")
            out[y, x:x + c] = v
            x += c
        elif v == 0:                                # end of line
            x, y = 0, y + 1
        elif v == 1:                                # end of bitmap
            return out
        elif v == 2:                                # delta
            if p + 2 > n:
                raise BmpFormatError("truncated RLE8 delta")
            x += data[p]
            y += data[p + 1]
            p += 2
            if x > w or y > h:
                raise BmpFormatError("RLE8 delta out of bounds")
        else:                                       # absolute mode, v pixels
            if y >= h or x + v > w or p + v > n:
                raise BmpFormatError("RLE8 absolute overflows")
            out[y, x:x + v] = np.frombuffer(data, np.uint8, count=v, offset=p)
            x += v
            p += v + (v & 1)                        # pad to word
    raise BmpFormatError("RLE8 stream missing end-of-bitmap")


def encode_bmp32(width: int, height: int, pixels_rgb: bytes,
                 top_down: bool = False) -> bytes:
    """32-bit BI_RGB (BGRX, X=0) — the screenshot layout; input is
    TOP-DOWN RGB like encode_bmp."""
    if len(pixels_rgb) != width * height * 3:
        raise BmpFormatError("pixel buffer does not match dims")
    arr = np.frombuffer(pixels_rgb, np.uint8).reshape(height, width, 3)
    if not top_down:
        arr = arr[::-1]
    bgrx = np.zeros((height, width, 4), np.uint8)
    bgrx[..., :3] = arr[..., ::-1]
    body = bgrx.tobytes()                        # stride w*4 is 4-aligned
    offset = 14 + 40
    header = (BMP_SIGNATURE
              + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
              + struct.pack("<IiiHHIIiiII", 40, width,
                            -height if top_down else height,
                            1, 32, 0, len(body), 2835, 2835, 0, 0))
    return header + body


def encode_bmp8(width: int, height: int, indices: bytes,
                palette: list[tuple[int, int, int]], rle: bool = False,
                top_down: bool = False) -> bytes:
    """8-bit palettized DIB — plain (BI_RGB) or run-length (BI_RLE8).
    ``indices`` is TOP-DOWN row-major; RLE files are always bottom-up."""
    if len(indices) != width * height:
        raise BmpFormatError("index buffer does not match dims")
    if not 1 <= len(palette) <= 256:
        raise BmpFormatError("palette size out of range")
    if any(v >= len(palette) for v in indices):
        raise BmpFormatError("index out of palette range")
    if rle and top_down:
        raise BmpFormatError("RLE8 BMPs cannot be top-down")
    table = b"".join(bytes((b_, g, r, 0)) for r, g, b_ in palette)
    rows = [indices[y * width:(y + 1) * width] for y in range(height)]
    if not top_down:
        rows = rows[::-1]
    if rle:
        body = bytearray()
        for row in rows:
            x = 0
            while x < width:
                run = 1
                while x + run < width and row[x + run] == row[x] and run < 255:
                    run += 1
                body += bytes((run, row[x]))
                x += run
            body += b"\x00\x00"                  # end of line
        body += b"\x00\x01"                      # end of bitmap
        comp = BI_RLE8
        body = bytes(body)
    else:
        pad = (-width) % 4
        body = b"".join(bytes(r) + b"\x00" * pad for r in rows)
        comp = BI_RGB
    offset = 14 + 40 + len(table)
    header = (BMP_SIGNATURE
              + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
              + struct.pack("<IiiHHIIiiII", 40, width,
                            -height if top_down else height,
                            1, 8, comp, len(body), 2835, 2835,
                            len(palette), 0))
    return header + table + body
