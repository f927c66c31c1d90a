"""Baseline TIFF 6.0 codec (pure Python): encode + decode for the layouts
a crawl actually meets in .tif payloads — 8-bit grayscale and RGB,
stripped, both byte orders, Compression 1 (none), 5 (LZW, the TIFF
MSB-first early-change variant — NOT gif.py's LSB-first late-change one),
8/32946 (Deflate) and 32773 (PackBits), with Predictor 2 (horizontal
differencing) composing with LZW/Deflate the way real writers pair them.

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
C_LZW = 5
C_DEFLATE = 8        # "Adobe" deflate; 32946 is the older private code
C_DEFLATE_OLD = 32946
C_PACKBITS = 32773

T_PREDICTOR = 317
PRED_NONE = 1
PRED_HDIFF = 2       # horizontal differencing (TIFF 6.0 section 14)

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


# --- LZW (TIFF 6.0 section 13: MSB-first codes, EARLY code-width change) ----------
#
# This is the TIFF variant, not GIF's (functions/gif.py): codes pack
# MSB-first, the initial width is 9 with ClearCode=256 / EOI=257, and the
# width bumps ONE CODE EARLY (when the next free slot reaches 2^w - 1,
# libtiff's documented off-by-one vs the GIF rule). Encoder resets the
# table at slot 4094 as real writers do.

_LZW_CLEAR, _LZW_EOI, _LZW_FIRST = 256, 257, 258


def lzw_encode(raw: bytes) -> bytes:
    out = bytearray()
    bitbuf = bitlen = 0

    def put(code: int, width: int) -> None:
        nonlocal bitbuf, bitlen
        bitbuf = (bitbuf << width) | code
        bitlen += width
        while bitlen >= 8:
            bitlen -= 8
            out.append((bitbuf >> bitlen) & 0xFF)

    table: dict[bytes, int] = {}
    width = 9
    next_code = _LZW_FIRST

    def reset() -> None:
        nonlocal table, width, next_code
        table = {bytes([b]): b for b in range(256)}
        width = 9
        next_code = _LZW_FIRST

    reset()
    put(_LZW_CLEAR, width)
    s = b""
    for b in raw:
        t = s + bytes([b])
        if t in table:
            s = t
            continue
        put(table[s], width)
        table[t] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:  # early change
            width += 1
        if next_code >= 4094:
            put(_LZW_CLEAR, width)
            reset()
        s = bytes([b])
    if s:
        put(table[s], width)
    put(_LZW_EOI, width)
    if bitlen:
        out.append((bitbuf << (8 - bitlen)) & 0xFF)
    return bytes(out)


def lzw_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    pos = bitbuf = bitlen = 0

    def get(width: int) -> int:
        nonlocal pos, bitbuf, bitlen
        while bitlen < width:
            if pos >= len(data):
                raise TiffFormatError("LZW stream truncated")
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitlen += 8
        bitlen -= width
        return (bitbuf >> bitlen) & ((1 << width) - 1)

    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([b]) for b in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while len(out) < expected:
        code = get(width)
        if code == _LZW_EOI:
            break
        if code == _LZW_CLEAR:
            reset()
            continue
        if prev is None:
            if code >= 256:
                raise TiffFormatError("LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):                 # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise TiffFormatError("LZW code out of range")
        if len(table) + 1 == (1 << width) - 1 and width < 12:  # early change
            width += 1
        out += entry
        if len(out) > expected:
            raise TiffFormatError("LZW output overruns strip")
        prev = entry
    if len(out) != expected:
        raise TiffFormatError(
            f"LZW output {len(out)} != expected {expected}")
    return bytes(out)


# --- horizontal-differencing predictor (TIFF 6.0 section 14) ----------------------

def _hdiff_encode(raw: bytes, width: int, spp: int) -> bytes:
    out = bytearray(raw)
    row_bytes = width * spp
    for r0 in range(0, len(out), row_bytes):
        for i in range(row_bytes - 1, spp - 1, -1):
            out[r0 + i] = (out[r0 + i] - out[r0 + i - spp]) & 0xFF
    return bytes(out)


def _hdiff_decode(raw: bytes, width: int, spp: int) -> bytes:
    out = bytearray(raw)
    row_bytes = width * spp
    for r0 in range(0, len(out), row_bytes):
        for i in range(spp, row_bytes):
            out[r0 + i] = (out[r0 + i] + out[r0 + i - spp]) & 0xFF
    return bytes(out)


# --- encoder ---------------------------------------------------------------------

def encode_tiff(width: int, height: int, pixels: bytes, *,
                byte_order: str = "II", photometric: int = PH_RGB,
                rows_per_strip: int = 0,
                compression: int = C_NONE,
                predictor: int = PRED_NONE) -> bytes:
    """Write a baseline TIFF: header, pixel strips, then one IFD.

    ``pixels`` is row-major gray (1 B/px, photometric 1) or RGB
    (3 B/px, photometric 2). ``rows_per_strip`` 0 → single strip.
    Compression: none / PackBits / LZW / Deflate; predictor 2
    (horizontal differencing) composes with LZW and Deflate the way
    real writers pair them.
    """
    import zlib

    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be II or MM")
    if predictor not in (PRED_NONE, PRED_HDIFF):
        raise ValueError(f"unsupported predictor {predictor}")
    if predictor == PRED_HDIFF and compression in (C_NONE, C_PACKBITS):
        raise ValueError("predictor 2 pairs with LZW/Deflate")
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
        if predictor == PRED_HDIFF:
            raw = _hdiff_encode(raw, width, spp)
        if compression == C_PACKBITS:
            strips.append(packbits_encode(raw))
        elif compression == C_LZW:
            strips.append(lzw_encode(raw))
        elif compression in (C_DEFLATE, C_DEFLATE_OLD):
            strips.append(zlib.compress(raw))
        else:
            strips.append(raw)

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
    if predictor != PRED_NONE:
        add(T_PREDICTOR, 3, [predictor])
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
                   T_STRIP_COUNTS, T_PREDICTOR):
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
    if compression not in (C_NONE, C_PACKBITS, C_LZW, C_DEFLATE,
                           C_DEFLATE_OLD):
        raise TiffFormatError(f"unsupported compression {compression}")
    predictor = one(T_PREDICTOR, PRED_NONE)
    if predictor not in (PRED_NONE, PRED_HDIFF):
        raise TiffFormatError(f"unsupported predictor {predictor}")
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
            strip = packbits_decode(raw, expected)
        elif compression == C_LZW:
            strip = lzw_decode(raw, expected)
        elif compression in (C_DEFLATE, C_DEFLATE_OLD):
            import zlib

            try:
                # bounded inflate, the png.py bomb discipline
                strip = zlib.decompressobj().decompress(raw, expected + 1)
            except zlib.error as ex:
                raise TiffFormatError(f"deflate strip: {ex}") from ex
            if len(strip) != expected:
                raise TiffFormatError(
                    f"deflate output {len(strip)} != expected {expected}")
        else:
            if cnt != expected:
                raise TiffFormatError(
                    f"strip byte count {cnt} != expected {expected}")
            strip = raw
        if predictor == PRED_HDIFF:
            strip = _hdiff_decode(strip, width, spp)
        out += strip
        remaining_rows -= rows
    if remaining_rows != 0:
        raise TiffFormatError("strips do not cover the image")
    return width, height, spp, bytes(out)
