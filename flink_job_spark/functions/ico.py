"""Windows ICO container (favicon.ico) — pure stdlib.

The single most crawled image URL on the web is /favicon.ico; this walks
the ICONDIR, picks the LARGEST entry (the convention browsers and Pillow
follow) and decodes it: modern icons embed a whole PNG (routed through
functions/png.py), legacy ones a headerless DIB whose biHeight covers BOTH
the XOR pixel block and the trailing 1-bit AND transparency mask. DIB
layouts: 32-bit BGRA (alpha channel authoritative, the de-facto rule),
24-bit BGR and 1/4/8-bit palettized (alpha from the AND mask). Output is
RGBA for DIB entries, whatever png.py returns for PNG entries.

Same defensive posture as the other codecs: entry-count and pixel caps,
every offset bounds-checked, malformed files raise IcoFormatError
(errors-as-data at the operator layer).
"""

from __future__ import annotations

import struct

from flink_job_spark.functions.png import (MAX_PIXELS, PNG_SIGNATURE,
                                           decode_png)

_MAX_ENTRIES = 1024


class IcoFormatError(ValueError):
    pass


def ico_meta(data: bytes) -> list[tuple[int, int]]:
    """[(w, h)] per directory entry — header-only, never touches pixels."""
    if len(data) < 6:
        raise IcoFormatError("truncated ICONDIR")
    res, typ, count = struct.unpack("<HHH", data[:6])
    if res != 0 or typ not in (1, 2) or count == 0:
        raise IcoFormatError("not an ICO/CUR file")
    if count > _MAX_ENTRIES:
        raise IcoFormatError(f"entry count {count} exceeds cap")
    dims = []
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(data):
            raise IcoFormatError("truncated directory entry")
        bw, bh = data[off], data[off + 1]
        dims.append((bw or 256, bh or 256))
    return dims


def decode_ico(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode the largest entry -> (w, h, channels, pixels)."""
    dims = ico_meta(data)
    best = None
    for i, (w, h) in enumerate(dims):
        off = 6 + 16 * i
        size, ioff = struct.unpack("<II", data[off + 8:off + 16])
        if ioff + size > len(data) or size < 8:
            raise IcoFormatError("entry image out of range")
        if best is None or w * h > best[0] * best[1]:
            best = (w, h, ioff, size)
    w, h, ioff, size = best
    blob = data[ioff:ioff + size]
    if blob[:8] == PNG_SIGNATURE:
        import zlib

        from flink_job_spark.functions.png import PngFormatError
        try:
            return decode_png(blob)
        except (PngFormatError, zlib.error, struct.error) as e:
            raise IcoFormatError(f"png entry: {e}") from e
    return _decode_dib_entry(blob, w, h)


def _decode_dib_entry(blob: bytes, w: int, h: int) -> tuple[int, int, int, bytes]:
    if len(blob) < 40:
        raise IcoFormatError("truncated DIB header")
    (bi_size, bi_w, bi_h, planes, bpp, comp, _sz, _xp, _yp, clr_used,
     _imp) = struct.unpack("<IiiHHIIiiII", blob[:40])
    if bi_size < 40 or comp != 0:
        raise IcoFormatError(f"unsupported ICO DIB (size={bi_size}, "
                             f"compression={comp})")
    if bi_w != w or abs(bi_h) not in (h, 2 * h):
        raise IcoFormatError("DIB dims disagree with directory entry")
    if w * h > MAX_PIXELS:
        raise IcoFormatError(f"dims too large ({w}x{h})")
    has_mask = abs(bi_h) == 2 * h
    if bpp not in (1, 4, 8, 24, 32):
        raise IcoFormatError(f"unsupported ICO bpp {bpp}")

    pos = bi_size
    palette = None
    if bpp <= 8:
        n_pal = clr_used or (1 << bpp)
        if pos + n_pal * 4 > len(blob):
            raise IcoFormatError("truncated ICO color table")
        palette = [blob[pos + 4 * c:pos + 4 * c + 3][::-1]  # BGRX -> RGB
                   for c in range(n_pal)]
        pos += n_pal * 4

    xor_stride = (w * bpp + 31) // 32 * 4
    if pos + xor_stride * h > len(blob):
        raise IcoFormatError("truncated XOR block")
    rows: list[list[tuple[int, int, int, int]]] = []
    for j in range(h):
        r0 = pos + j * xor_stride
        row: list[tuple[int, int, int, int]] = []
        if bpp == 32:
            for x in range(w):
                b, g, r, a = blob[r0 + 4 * x:r0 + 4 * x + 4]
                row.append((r, g, b, a))
        elif bpp == 24:
            for x in range(w):
                b, g, r = blob[r0 + 3 * x:r0 + 3 * x + 3]
                row.append((r, g, b, 255))
        else:
            per_byte = 8 // bpp
            mask = (1 << bpp) - 1
            for x in range(w):
                v = (blob[r0 + x // per_byte]
                     >> (8 - bpp * (x % per_byte + 1))) & mask
                if v >= len(palette):
                    raise IcoFormatError("palette index out of range")
                r, g, b = palette[v]
                row.append((r, g, b, 255))
        rows.append(row)
    pos += xor_stride * h

    # AND mask: 1 bit/pixel rows padded to 32 bits, same bottom-up order.
    # For 32-bit entries the alpha channel wins when it carries any
    # information (the rule Pillow/Windows follow).
    use_alpha = bpp == 32 and any(px[3] != 0 for r in rows for px in r)
    if has_mask and not use_alpha:
        and_stride = (w + 31) // 32 * 4
        if pos + and_stride * h > len(blob):
            raise IcoFormatError("truncated AND mask")
        for j in range(h):
            r0 = pos + j * and_stride
            for x in range(w):
                bit = (blob[r0 + x // 8] >> (7 - x % 8)) & 1
                if bit:
                    r, g, b, _ = rows[j][x]
                    rows[j][x] = (r, g, b, 0)
                elif bpp == 32:
                    r, g, b, _ = rows[j][x]
                    rows[j][x] = (r, g, b, 255)

    if bi_h > 0:                                   # bottom-up
        rows = rows[::-1]
    out = bytearray()
    for row in rows:
        for px in row:
            out += bytes(px)
    return w, h, 4, bytes(out)


def encode_ico(entries: list[bytes]) -> bytes:
    """Wrap pre-encoded entry blobs (PNG files or headerless DIBs built by
    encode_ico_dib) in an ICONDIR — fixture builder."""
    if not 1 <= len(entries) <= _MAX_ENTRIES:
        raise IcoFormatError("entry count out of range")
    header = struct.pack("<HHH", 0, 1, len(entries))
    dir_bytes = bytearray()
    body = bytearray()
    base = 6 + 16 * len(entries)
    for blob, (w, h) in zip(entries, (_entry_dims(b) for b in entries)):
        dir_bytes += struct.pack("<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32,
                                 len(blob), base + len(body))
        body += blob
    return header + bytes(dir_bytes) + bytes(body)


def _entry_dims(blob: bytes) -> tuple[int, int]:
    if blob[:8] == PNG_SIGNATURE:
        w, hh = struct.unpack(">II", blob[16:24])
        return w, hh
    bi_w, bi_h = struct.unpack("<ii", blob[4:12])
    return bi_w, abs(bi_h) // 2


def encode_ico_dib(width: int, height: int, rgba: bytes) -> bytes:
    """Headerless 32-bit BGRA DIB entry with an all-opaque AND mask and
    biHeight = 2*height, the classic icon layout."""
    if len(rgba) != width * height * 4:
        raise IcoFormatError("pixel buffer does not match dims")
    hdr = struct.pack("<IiiHHIIiiII", 40, width, height * 2, 1, 32, 0,
                      0, 0, 0, 0, 0)
    body = bytearray()
    for j in range(height - 1, -1, -1):            # bottom-up
        for x in range(width):
            r, g, b, a = rgba[(j * width + x) * 4:(j * width + x) * 4 + 4]
            body += bytes((b, g, r, a))
    and_stride = (width + 31) // 32 * 4
    body += b"\x00" * (and_stride * height)
    return hdr + bytes(body)
