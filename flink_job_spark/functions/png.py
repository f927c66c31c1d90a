"""Minimal pure-stdlib PNG codec (zlib + struct — no imaging library).

Decodes every non-interlaced PNG color-type/bit-depth combination the spec
defines (RFC 2083 §6 / ISO 15948 table 11.1): grayscale (0) at depths
1/2/4/8/16, RGB (2) at 8/16, PALETTE (3) at 1/2/4/8 with PLTE lookup and
optional tRNS alpha, gray+alpha (4) and RGBA (6) at 8/16. Sub-8-bit samples
unpack MSB-first per row (rows pad to byte boundaries); sub-8 grayscale
scales to 8-bit by the spec's exact integer factor (255/(2^d-1) is integral
for d in 1/2/4); 16-bit samples keep their high byte (the spec's sample
depth rescaling truncation). Encode writes filter-0 scanlines for gray/RGB/
RGBA plus palette images at any legal depth (encode_png_palette — used by
fixtures and the roundtrip fuzz). Decode implements all five PNG scanline
filters (None/Sub/Up/Average/Paeth) with the spec's bpp offset (>= 1 byte),
so any conforming encoder's output of these layouts round-trips. Adam7
interlaced files decode through a separate seven-pass path (each pass
unfiltered independently, scattered into the sample grid, repacked into
the linear scanline layout so sample expansion is shared); the linear
fast path is untouched.

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

# The Adam7 path materializes per-VALUE Python ints (30x the bytes of the
# linear path) — a 64 MP interlaced claim would be a multi-GB allocation.
# Real interlaced files are small thumbnails/icons; cap them separately.
MAX_INTERLACED_PIXELS = 4_000_000

_CHANNELS = {0: 1, 2: 3, 6: 4}  # gray, RGB, RGBA (8-bit encode surface)

# samples per pixel and legal bit depths per color type (spec table 11.1)
_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_VALID_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                 4: (8, 16), 6: (8, 16)}


class PngFormatError(ValueError):
    pass


def _adam7_raw(width: int, height: int, values: list[int], samples: int,
               depth: int) -> bytes:
    """Filter-0 Adam7 pass stream from a full sample grid (encode side)."""
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx if width > x0 else 0
        ph = (height - y0 + dy - 1) // dy if height > y0 else 0
        if not pw or not ph:
            continue
        for j in range(ph):
            y = y0 + j * dy
            vals = []
            for i in range(pw):
                base = (y * width + x0 + i * dx) * samples
                vals.extend(values[base:base + samples])
            out += b"\x00" + _pack_row(vals, depth)
    return bytes(out)


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 2,
               interlace: bool = False) -> bytes:
    """pixels = row-major interleaved samples, 8 bits per sample."""
    ch = _CHANNELS.get(color_type)
    if ch is None:
        raise PngFormatError(f"unsupported color type {color_type}")
    if len(pixels) != width * height * ch:
        raise PngFormatError("pixel buffer does not match dims")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0,
                       1 if interlace else 0)
    if interlace:
        raw = _adam7_raw(width, height, list(pixels), ch, 8)
    else:
        stride = width * ch
        raw = b"".join(
            b"\x00" + pixels[y * stride:(y + 1) * stride]
            for y in range(height)
        )
    return (PNG_SIGNATURE
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def encode_png_palette(width: int, height: int, indices: bytes,
                       palette: list[tuple[int, int, int]], depth: int = 8,
                       trns: list[int] | None = None,
                       interlace: bool = False) -> bytes:
    """Color-type-3 PNG: one palette index per pixel, packed MSB-first at
    ``depth`` bits (1/2/4/8), rows padded to byte boundaries, filter 0.
    ``trns`` (per-entry alpha) emits a tRNS chunk; decode then yields RGBA."""
    if depth not in (1, 2, 4, 8):
        raise PngFormatError(f"bad palette depth {depth}")
    if not 1 <= len(palette) <= min(256, 1 << depth):
        raise PngFormatError("palette size out of range for depth")
    if len(indices) != width * height:
        raise PngFormatError("index buffer does not match dims")
    if any(v >= len(palette) for v in indices):
        raise PngFormatError("index out of palette range")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    if interlace:
        rows = bytearray(_adam7_raw(width, height, list(indices), 1, depth))
    else:
        stride = (width * depth + 7) // 8
        rows = bytearray()
        per_byte = 8 // depth
        for y in range(height):
            line = bytearray(stride)
            for x in range(width):
                v = indices[y * width + x]
                line[x // per_byte] |= v << (8 - depth * (x % per_byte + 1))
            rows += b"\x00" + line
    ihdr = struct.pack(">IIBBBBB", width, height, depth, 3, 0, 0,
                       1 if interlace else 0)
    plte = b"".join(bytes(c) for c in palette)
    out = PNG_SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
    if trns is not None:
        out += chunk(b"tRNS", bytes(trns))
    return out + chunk(b"IDAT", zlib.compress(bytes(rows))) + chunk(b"IEND", b"")


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


def _unfilter(raw: bytes, h: int, stride: int, bpp: int) -> bytearray:
    """All five PNG scanline filters over h rows of (1 filter byte +
    stride data bytes); returns the h*stride unfiltered buffer."""
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 1:    # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise PngFormatError(f"unknown filter {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return out


# Adam7: (x0, y0, dx, dy) per pass (spec §8.2)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _row_samples(row: bytes, n: int, depth: int) -> list[int]:
    """n sample values from one packed row (MSB-first for sub-8; 16-bit
    keeps the full value so repacking is lossless)."""
    if depth == 8:
        return list(row[:n])
    if depth == 16:
        return [(row[2 * k] << 8) | row[2 * k + 1] for k in range(n)]
    per_byte = 8 // depth
    mask = (1 << depth) - 1
    return [(row[k // per_byte] >> (8 - depth * (k % per_byte + 1))) & mask
            for k in range(n)]


def _pack_row(vals: list[int], depth: int) -> bytes:
    """Inverse of _row_samples: pack sample values into one padded row."""
    if depth == 8:
        return bytes(vals)
    if depth == 16:
        out = bytearray()
        for v in vals:
            out += bytes(((v >> 8) & 0xFF, v & 0xFF))
        return bytes(out)
    per_byte = 8 // depth
    row = bytearray((len(vals) + per_byte - 1) // per_byte)
    for k, v in enumerate(vals):
        row[k // per_byte] |= v << (8 - depth * (k % per_byte + 1))
    return bytes(row)


def _deinterlace(idat: bytes, w: int, h: int, samples: int, depth: int,
                 bpp: int, stride: int) -> bytearray:
    """Adam7: seven sub-images, each filtered independently, scattered
    into the full sample grid, then repacked into the non-interlaced
    scanline layout so the shared sample-expansion path runs unchanged.
    Per-value Python (interlaced files are rare in corpora); the
    bounded-inflate bomb discipline is identical to the linear path."""
    pass_dims = []
    expected = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        ps = (pw * samples * depth + 7) // 8
        pass_dims.append((pw, ph, ps))
        if pw and ph:
            expected += ph * (ps + 1)
    raw = zlib.decompressobj().decompress(idat, expected + 1)
    if len(raw) != expected:
        raise PngFormatError("IDAT size does not match dims")

    grid = [0] * (w * h * samples)
    pos = 0
    for (x0, y0, dx, dy), (pw, ph, ps) in zip(_ADAM7, pass_dims):
        if not pw or not ph:
            continue
        sub = _unfilter(raw[pos:pos + ph * (ps + 1)], ph, ps, bpp)
        pos += ph * (ps + 1)
        for j in range(ph):
            vals = _row_samples(sub[j * ps:(j + 1) * ps], pw * samples, depth)
            y = y0 + j * dy
            for i in range(pw):
                x = x0 + i * dx
                base = (y * w + x) * samples
                for s in range(samples):
                    grid[base + s] = vals[i * samples + s]

    out = bytearray(h * stride)
    for y in range(h):
        out[y * stride:(y + 1) * stride] = \
            _pack_row(grid[y * w * samples:(y + 1) * w * samples], depth)
    return out


def decode_png(data: bytes, max_pixels: int = MAX_PIXELS
               ) -> tuple[int, int, int, bytes]:
    """(width, height, channels, pixels) — full unfilter of IDAT scanlines,
    then sample expansion to 8-bit: sub-8 grayscale scales by the exact
    255/(2^d-1) factor, palette indices map through PLTE (RGBA when tRNS is
    present), 16-bit samples keep their high byte."""
    w, h, depth, ctype = png_meta(data)
    samples = _SAMPLES.get(ctype)
    if samples is None or depth not in _VALID_DEPTHS.get(ctype, ()):
        raise PngFormatError(f"unsupported PNG (depth={depth}, color={ctype})")
    if w * h > max_pixels:
        raise PngFormatError(f"dims too large ({w}x{h} > {max_pixels} px)")

    idat = bytearray()
    plte: bytes | None = None
    trns: bytes | None = None
    interlace = 0
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if tag == b"IDAT":
            idat += body
        elif tag == b"IHDR":
            interlace = struct.unpack(">B", body[12:13])[0]
            if interlace not in (0, 1):
                raise PngFormatError(f"bad interlace method {interlace}")
        elif tag == b"PLTE":
            if length % 3 != 0 or length == 0:
                raise PngFormatError("bad PLTE length")
            plte = bytes(body)
        elif tag == b"tRNS" and ctype == 3:
            trns = bytes(body)
        elif tag == b"IEND":
            break
        pos += 12 + length

    # filter offset: bytes per complete pixel, rounded up to one (spec §6.2)
    bpp = max(1, (samples * depth) // 8)
    stride = (w * samples * depth + 7) // 8
    if interlace:
        if w * h > MAX_INTERLACED_PIXELS:
            raise PngFormatError(
                f"interlaced dims too large ({w}x{h} > "
                f"{MAX_INTERLACED_PIXELS} px)")
        out = _deinterlace(bytes(idat), w, h, samples, depth, bpp, stride)
    else:
        expected = h * (stride + 1)
        # Bounded inflate: ask for at most expected+1 bytes so a stream
        # that zlib-expands past the header-declared dims is rejected
        # without ever materializing the bomb.
        raw = zlib.decompressobj().decompress(bytes(idat), expected + 1)
        if len(raw) != expected:
            raise PngFormatError("IDAT size does not match dims")
        out = _unfilter(raw, h, stride, bpp)

    # --- sample expansion to 8-bit ------------------------------------------------
    if depth == 16:
        vals = bytes(out[0::2])                    # high byte per sample
        return w, h, samples, vals
    if depth == 8 and ctype != 3:
        return w, h, samples, bytes(out)

    # sub-8-bit (and 8-bit palette): per-row unpack, MSB-first, pad ignored
    if depth == 8:
        idxs = bytes(out)
    else:
        per_byte = 8 // depth
        mask = (1 << depth) - 1
        vals8 = bytearray(w * h)          # samples == 1 for ctypes 0 and 3
        p = 0
        for y in range(h):
            row = out[y * stride:(y + 1) * stride]
            for x in range(w):
                b = row[x // per_byte]
                shift = 8 - depth * (x % per_byte + 1)
                vals8[p] = (b >> shift) & mask
                p += 1
        idxs = bytes(vals8)

    if ctype == 0:
        scale = 255 // ((1 << depth) - 1)          # exact for d in 1/2/4
        return w, h, 1, bytes(v * scale for v in idxs)

    # ctype 3: palette lookup
    if plte is None:
        raise PngFormatError("palette PNG missing PLTE")
    n_pal = len(plte) // 3
    ch = 4 if trns is not None else 3
    px = bytearray(w * h * ch)
    for i, v in enumerate(idxs):
        if v >= n_pal:
            raise PngFormatError(f"palette index {v} out of range ({n_pal})")
        o = i * ch
        px[o:o + 3] = plte[v * 3:v * 3 + 3]
        if ch == 4:
            px[o + 3] = trns[v] if v < len(trns) else 255
    return w, h, ch, bytes(px)
