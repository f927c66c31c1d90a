"""Baseline TIFF 6.0 codec (pure Python): encode + decode for the layouts
a crawl actually meets in .tif payloads — 8-bit grayscale and RGB,
stripped, both byte orders, Compression 1 (none) and 32773 (PackBits).

Why not reuse functions/exif.py's IFD walk: that walker is a *metadata*
reader embedded in JPEG APP1 (JpegFormatError contract, scalar tags only).
Decoding pixel data needs array-valued tags (StripOffsets / StripByteCounts
/ BitsPerSample per sample) and its own errors-as-data exception type, so
the ~40 shared lines are re-derived here against the TIFF 6.0 spec rather
than contorting the EXIF path. Same defensive posture as the other codecs
(png.py bomb caps, mp4.py box guards): entry-count caps, bounds-checked
offsets, a pixel-count ceiling, and every malformed input raises
TiffFormatError — never a bare struct/ValueError (the r4 DQT lesson).

Reference parity note: the reference engine (FirebirdToIcebergJob) has no
media path at all — this extends the LLM-pipeline north star
(BASELINE.json), mirroring how mis:530-586 degrades unknown inputs
gracefully instead of failing the job.
"""

from __future__ import annotations

import struct

_MAX_IFD_ENTRIES = 4096
_MAX_PIXELS = 64 * 1024 * 1024          # decompression-bomb cap (64 MPx)
_MAX_STRIPS = 65536

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}

T_WIDTH = 256
T_HEIGHT = 257
T_BITS = 258
T_COMPRESSION = 259
T_PHOTOMETRIC = 262
T_STRIP_OFFSETS = 273
T_SAMPLES = 277
T_ROWS_PER_STRIP = 278
T_STRIP_COUNTS = 279

C_NONE = 1
C_PACKBITS = 32773

PH_GRAY = 1          # BlackIsZero
PH_RGB = 2


class TiffFormatError(ValueError):
    """Malformed TIFF — becomes a decode_error row."""


# --- PackBits (TIFF 6.0 section 9) ----------------------------------------------

def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: replicate runs of >=2, literals otherwise, both
    capped at 128 per the control-byte range."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(data[i])
            i += run
            continue
        lit_start = i
        i += 1
        while (i < n and i - lit_start < 128
               and not (i + 1 < n and data[i + 1] == data[i])):
            i += 1
        out.append(i - lit_start - 1)
        out += data[lit_start:i]
    return bytes(out)


def packbits_decode(data: bytes, expected: int) -> bytes:
    """Decode exactly ``expected`` output bytes; anything else raises."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c == 128:                      # noop per spec
            continue
        if c < 128:                       # literal of c+1 bytes
            if i + c + 1 > n:
                raise TiffFormatError("PackBits literal overruns strip")
            out += data[i:i + c + 1]
            i += c + 1
        else:                             # replicate next byte 257-c times
            if i >= n:
                raise TiffFormatError("PackBits run missing byte")
            out += bytes([data[i]]) * (257 - c)
            i += 1
    if len(out) != expected:
        raise TiffFormatError(
            f"PackBits output {len(out)} != expected {expected}")
    return bytes(out)


# --- encoder ---------------------------------------------------------------------

def encode_tiff(width: int, height: int, pixels: bytes, *,
                byte_order: str = "II", photometric: int = PH_RGB,
                rows_per_strip: int = 0,
                compression: int = C_NONE) -> bytes:
    """Write a baseline TIFF: header, pixel strips, then one IFD.

    ``pixels`` is row-major gray (1 B/px, photometric 1) or RGB
    (3 B/px, photometric 2). ``rows_per_strip`` 0 → single strip.
    """
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be II or MM")
    e = "<" if byte_order == "II" else ">"
    spp = 1 if photometric == PH_GRAY else 3
    if len(pixels) != width * height * spp:
        raise ValueError("pixel buffer size mismatch")
    rps = rows_per_strip or height
    row_bytes = width * spp

    strips = []
    for y0 in range(0, height, rps):
        rows = min(rps, height - y0)
        raw = pixels[y0 * row_bytes:(y0 + rows) * row_bytes]
        strips.append(packbits_encode(raw) if compression == C_PACKBITS
                      else raw)

    header = struct.pack(e + "2sHI", byte_order.encode(), 42, 8)
    data = bytearray(header)
    offsets, counts = [], []
    for s in strips:
        offsets.append(len(data))
        counts.append(len(s))
        data += s
    if len(data) % 2:
        data += b"\x00"                   # IFD must be word-aligned

    n_strips = len(strips)

    def arr(values: list[int], typ: int) -> tuple[bytes, int]:
        fmt = {3: "H", 4: "I"}[typ]
        return struct.pack(e + fmt * len(values), *values), typ

    # entries: tag -> (type, count, packed value bytes)
    entries: list[tuple[int, int, int, bytes]] = []

    def add(tag: int, typ: int, values: list[int]) -> None:
        packed, _ = arr(values, typ)
        entries.append((tag, typ, len(values), packed))

    add(T_WIDTH, 4, [width])
    add(T_HEIGHT, 4, [height])
    add(T_BITS, 3, [8] * spp)
    add(T_COMPRESSION, 3, [compression])
    add(T_PHOTOMETRIC, 3, [photometric])
    add(T_STRIP_OFFSETS, 4, offsets)
    add(T_SAMPLES, 3, [spp])
    add(T_ROWS_PER_STRIP, 4, [rps])
    add(T_STRIP_COUNTS, 4, counts)
    entries.sort(key=lambda x: x[0])      # spec: ascending tag order

    ifd_off = len(data)
    overflow = bytearray()
    overflow_base = ifd_off + 2 + 12 * len(entries) + 4
    ifd = bytearray(struct.pack(e + "H", len(entries)))
    for tag, typ, count, packed in entries:
        ifd += struct.pack(e + "HHI", tag, typ, count)
        if len(packed) <= 4:
            ifd += packed + b"\x00" * (4 - len(packed))
        else:
            ifd += struct.pack(e + "I", overflow_base + len(overflow))
            overflow += packed
            if len(overflow) % 2:
                overflow += b"\x00"
    ifd += struct.pack(e + "I", 0)        # next-IFD pointer: none

    # header points at the IFD, not 8 — rewrite offset 4
    out = bytearray(data) + ifd + overflow
    out[4:8] = struct.pack(e + "I", ifd_off)
    return bytes(out)


# --- decoder ---------------------------------------------------------------------

def _read(t: bytes, e: str, fmt: str, off: int, size: int) -> int:
    if off < 0 or off + size > len(t):
        raise TiffFormatError("read out of range")
    return struct.unpack_from(e + fmt, t, off)[0]


def _entry_values(t: bytes, e: str, typ: int, count: int,
                  field_off: int) -> list[int]:
    if typ not in _TYPE_SIZE:
        raise TiffFormatError(f"unsupported IFD type {typ}")
    size = _TYPE_SIZE[typ] * count
    off = field_off if size <= 4 else _read(t, e, "I", field_off, 4)
    if off < 0 or off + size > len(t):
        raise TiffFormatError("IFD value out of range")
    if typ == 3:
        return list(struct.unpack_from(e + "H" * count, t, off))
    if typ == 4:
        return list(struct.unpack_from(e + "I" * count, t, off))
    if typ == 1:
        return list(t[off:off + count])
    raise TiffFormatError(f"integer tag has type {typ}")


def decode_tiff(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode the first IFD of a baseline TIFF.

    Returns ``(width, height, channels, pixels)`` — pixels row-major,
    gray (1 B/px) or RGB (3 B/px). Raises TiffFormatError on anything
    outside the supported envelope (8-bit, photometric 1/2, compression
    none/PackBits) — errors-as-data at the operator layer.
    """
    if len(data) < 8:
        raise TiffFormatError("truncated TIFF header")
    bo = data[:2]
    if bo == b"II":
        e = "<"
    elif bo == b"MM":
        e = ">"
    else:
        raise TiffFormatError(f"bad byte order {bo!r}")
    if _read(data, e, "H", 2, 2) != 42:
        raise TiffFormatError("bad TIFF magic")
    ifd_off = _read(data, e, "I", 4, 4)
    n = _read(data, e, "H", ifd_off, 2)
    if n == 0 or n > _MAX_IFD_ENTRIES:
        raise TiffFormatError(f"IFD entry count {n} out of range")
    if ifd_off + 2 + 12 * n + 4 > len(data):
        raise TiffFormatError("truncated IFD")

    tags: dict[int, list[int]] = {}
    for i in range(n):
        p = ifd_off + 2 + 12 * i
        tag = _read(data, e, "H", p, 2)
        typ = _read(data, e, "H", p + 2, 2)
        count = _read(data, e, "I", p + 4, 4)
        if count > len(data):
            raise TiffFormatError("absurd IFD count")
        if tag in (T_WIDTH, T_HEIGHT, T_BITS, T_COMPRESSION, T_PHOTOMETRIC,
                   T_STRIP_OFFSETS, T_SAMPLES, T_ROWS_PER_STRIP,
                   T_STRIP_COUNTS):
            tags[tag] = _entry_values(data, e, typ, count, p + 8)

    def one(tag: int, default: int | None = None) -> int:
        v = tags.get(tag)
        if not v:
            if default is None:
                raise TiffFormatError(f"missing required tag {tag}")
            return default
        return v[0]

    width, height = one(T_WIDTH), one(T_HEIGHT)
    photometric = one(T_PHOTOMETRIC)
    compression = one(T_COMPRESSION, C_NONE)
    spp = one(T_SAMPLES, 1)
    if photometric not in (PH_GRAY, PH_RGB):
        raise TiffFormatError(f"unsupported photometric {photometric}")
    if (photometric == PH_GRAY) != (spp == 1) or spp not in (1, 3):
        raise TiffFormatError(f"photometric {photometric} / samples {spp}")
    bits = tags.get(T_BITS, [8])
    if any(b != 8 for b in bits):
        raise TiffFormatError(f"unsupported BitsPerSample {bits}")
    if compression not in (C_NONE, C_PACKBITS):
        raise TiffFormatError(f"unsupported compression {compression}")
    if width <= 0 or height <= 0 or width * height > _MAX_PIXELS:
        raise TiffFormatError(f"bad dimensions {width}x{height}")

    offsets = tags.get(T_STRIP_OFFSETS)
    counts = tags.get(T_STRIP_COUNTS)
    if not offsets or not counts or len(offsets) != len(counts):
        raise TiffFormatError("strip tables missing or mismatched")
    if len(offsets) > _MAX_STRIPS:
        raise TiffFormatError("strip count exceeds cap")
    rps = one(T_ROWS_PER_STRIP, height)
    if rps <= 0:
        raise TiffFormatError("bad RowsPerStrip")
    row_bytes = width * spp

    out = bytearray()
    remaining_rows = height
    for off, cnt in zip(offsets, counts):
        if off < 0 or cnt < 0 or off + cnt > len(data):
            raise TiffFormatError("strip out of range")
        rows = min(rps, remaining_rows)
        if rows <= 0:
            raise TiffFormatError("more strips than rows")
        expected = rows * row_bytes
        raw = data[off:off + cnt]
        if compression == C_PACKBITS:
            out += packbits_decode(raw, expected)
        else:
            if cnt != expected:
                raise TiffFormatError(
                    f"strip byte count {cnt} != expected {expected}")
            out += raw
        remaining_rows -= rows
    if remaining_rows != 0:
        raise TiffFormatError("strips do not cover the image")
    return width, height, spp, bytes(out)
