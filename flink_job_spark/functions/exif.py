"""EXIF (APP1/TIFF) + JFIF (APP0) metadata: build, splice, parse, orient.

Real-world JPEGs carry their provenance and display geometry in an APP1
"Exif" segment (a little TIFF file: byte-order mark, IFD0, an Exif
sub-IFD) — and the single most consequential field for a training-data
pipeline is Orientation (tag 0x0112): cameras store sensor-native pixels
and expect consumers to rotate/flip at display time, so a pipeline that
ignores it trains on sideways images. This module gives the engine the
full loop:

- ``build_exif_app1`` — construct a spec-shaped APP1 segment (II or MM
  byte order, IFD0 Make/Model/Orientation/DateTime, Exif sub-IFD
  PixelX/YDimension, >4-byte values in a trailing data area) so fixtures
  and tests exercise REAL TIFF structure, not a mock.
- ``splice_app1`` — insert the segment after SOI (the canonical spot).
- ``parse_jpeg_metadata`` — a bounded metadata-only marker walk (stops at
  SOS: T.81 puts tables/misc before the scan) that reads JFIF density and
  the Exif fields. Independent of the pixel decoder on purpose: metadata
  extraction over a 100 TB crawl must not pay a decode.
- ``apply_orientation`` — the 8 EXIF orientations as numpy view ops
  (flips/transposes — zero-copy until the final ascontiguousarray).

Scale notes: all of this runs inside the same Arrow-batched mapInPandas
contract as the codecs (operators/multimodal.py) — payload bytes never
leave the executor, malformed structures raise JpegFormatError and
surface as ``decode_error`` rows (errors-as-data), and the parser is
bomb-guarded (entry-count cap, every offset bounds-checked against the
64 KB segment) so a crafted blob cannot allocate or loop unboundedly.

Reference parity: the reference ingests every source type it meets and
degrades per-row, never per-job (mis_initial_job FirebirdToIcebergJob
mis:530-586 — per-table skip-never-crash); this extends that contract to
the image-metadata surface. Format: TIFF 6.0 §2 + EXIF 2.3 §4.6.
"""

from __future__ import annotations

import struct

import numpy as np

from flink_job_spark.functions.jpeg import JPEG_SOI, JpegFormatError

# TIFF field types we read/write; everything else is skipped (type size
# unknown => treat as opaque and step over the 12-byte entry).
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}

_TAG_MAKE = 0x010F
_TAG_MODEL = 0x0110
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_EXIF_IFD = 0x8769
_TAG_PIXEL_X = 0xA002
_TAG_PIXEL_Y = 0xA003

_MAX_IFD_ENTRIES = 4096          # bomb guard: a real IFD has dozens

#: EXIF orientation -> the orientation that undoes it (6 and 8 are the
#: two rotations and invert each other; everything else is an involution).
INVERSE_ORIENTATION = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}


# --------------------------------------------------------------------------
# build + splice (fixture/encoder side)
# --------------------------------------------------------------------------

def build_exif_app1(byte_order: str = "II", orientation: int | None = None,
                    make: str | None = None, model: str | None = None,
                    datetime: str | None = None, pixel_x: int | None = None,
                    pixel_y: int | None = None) -> bytes:
    """Build a complete APP1 Exif segment (marker + length + payload).

    Values longer than 4 bytes (ASCII strings) land in the data area after
    the IFDs with word-aligned offsets, exactly as TIFF 6.0 lays them out;
    SHORT/LONG scalars are left-justified inline in the 4-byte field.
    """
    if byte_order not in ("II", "MM"):
        raise JpegFormatError(f"bad byte order {byte_order!r}")
    e = "<" if byte_order == "II" else ">"

    ifd0: list[tuple[int, int, object]] = []
    if make is not None:
        ifd0.append((_TAG_MAKE, 2, make.encode("ascii") + b"\x00"))
    if model is not None:
        ifd0.append((_TAG_MODEL, 2, model.encode("ascii") + b"\x00"))
    if orientation is not None:
        if not 1 <= int(orientation) <= 8:
            raise JpegFormatError(f"bad orientation {orientation}")
        ifd0.append((_TAG_ORIENTATION, 3, int(orientation)))
    if datetime is not None:
        ifd0.append((_TAG_DATETIME, 2, datetime.encode("ascii") + b"\x00"))

    sub: list[tuple[int, int, object]] = []
    if pixel_x is not None:
        sub.append((_TAG_PIXEL_X, 4, int(pixel_x)))
    if pixel_y is not None:
        sub.append((_TAG_PIXEL_Y, 4, int(pixel_y)))

    n0 = len(ifd0) + (1 if sub else 0)
    ifd0_block = 2 + 12 * n0 + 4
    sub_block = (2 + 12 * len(sub) + 4) if sub else 0
    exif_off = 8 + ifd0_block
    data_base = exif_off + sub_block
    if sub:
        ifd0.append((_TAG_EXIF_IFD, 4, exif_off))
    ifd0.sort(key=lambda t: t[0])        # TIFF requires ascending tag order

    data_area = bytearray()

    def pack_entries(entries: list[tuple[int, int, object]]) -> bytes:
        out = bytearray(struct.pack(e + "H", len(entries)))
        for tag, typ, val in entries:
            if typ == 2:
                raw = val                                  # bytes, NUL-term
                count = len(raw)
                if count <= 4:
                    field = raw.ljust(4, b"\x00")
                else:
                    field = struct.pack(e + "I", data_base + len(data_area))
                    data_area.extend(raw)
                    if len(data_area) % 2:                 # word alignment
                        data_area.append(0)
            elif typ == 3:
                count = 1
                field = struct.pack(e + "H", val) + b"\x00\x00"
            else:                                          # LONG
                count = 1
                field = struct.pack(e + "I", val)
            out += struct.pack(e + "HH", tag, typ)
            out += struct.pack(e + "I", count)
            out += field
        out += struct.pack(e + "I", 0)                     # next-IFD = none
        return bytes(out)

    ifd0_bytes = pack_entries(ifd0)
    sub_bytes = pack_entries(sub) if sub else b""
    tiff = (byte_order.encode("ascii") + struct.pack(e + "H", 42)
            + struct.pack(e + "I", 8) + ifd0_bytes + sub_bytes + data_area)
    body = b"Exif\x00\x00" + tiff
    if len(body) + 2 > 0xFFFF:
        raise JpegFormatError("EXIF payload exceeds the APP1 segment limit")
    return b"\xFF\xE1" + struct.pack(">H", len(body) + 2) + body


def splice_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Insert an APP1 segment immediately after SOI (the canonical spot —
    real files may also put it after APP0; the parser handles both)."""
    if jpeg[:2] != JPEG_SOI:
        raise JpegFormatError("not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


# --------------------------------------------------------------------------
# parse (crawl side)
# --------------------------------------------------------------------------

def _read_u(t: bytes, e: str, fmt: str, off: int, size: int) -> int:
    if off + size > len(t):
        raise JpegFormatError("EXIF read out of range")
    return struct.unpack_from(e + fmt, t, off)[0]


def _entry_value(t: bytes, e: str, typ: int, count: int, field_off: int):
    """Value of one IFD entry: inline when <=4 bytes, else via offset."""
    size = _TYPE_SIZE[typ] * count
    if size <= 4:
        off = field_off
    else:
        off = _read_u(t, e, "I", field_off, 4)
    if off + size > len(t):
        raise JpegFormatError("EXIF value offset out of range")
    raw = t[off:off + size]
    if typ == 2:
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    if typ == 3:
        return struct.unpack(e + "H", raw[:2])[0]
    if typ == 4:
        return struct.unpack(e + "I", raw[:4])[0]
    return raw


def _parse_ifd(t: bytes, e: str, off: int) -> dict[int, object]:
    n = _read_u(t, e, "H", off, 2)
    if n > _MAX_IFD_ENTRIES:
        raise JpegFormatError(f"IFD entry count {n} exceeds cap")
    if off + 2 + 12 * n + 4 > len(t):
        raise JpegFormatError("truncated IFD")
    tags: dict[int, object] = {}
    for i in range(n):
        p = off + 2 + 12 * i
        tag = _read_u(t, e, "H", p, 2)
        typ = _read_u(t, e, "H", p + 2, 2)
        count = _read_u(t, e, "I", p + 4, 4)
        if typ not in _TYPE_SIZE or count > len(t):
            continue                     # unknown/absurd: step over, don't die
        tags[tag] = _entry_value(t, e, typ, count, p + 8)
    return tags


def _parse_tiff(t: bytes, out: dict) -> None:
    if len(t) < 8:
        raise JpegFormatError("truncated TIFF header")
    bo = t[:2]
    if bo == b"II":
        e = "<"
    elif bo == b"MM":
        e = ">"
    else:
        raise JpegFormatError(f"bad TIFF byte order {bo!r}")
    if _read_u(t, e, "H", 2, 2) != 42:
        raise JpegFormatError("bad TIFF magic")
    out["byte_order"] = bo.decode("ascii")
    ifd0 = _parse_ifd(t, e, _read_u(t, e, "I", 4, 4))
    # field-level type guards: a corrupted type byte turns a value into the
    # wrong Python shape — treat the field as absent rather than letting a
    # ValueError escape the errors-as-data contract
    if isinstance(ifd0.get(_TAG_ORIENTATION), int):
        out["orientation"] = ifd0[_TAG_ORIENTATION]
    for tag, key in ((_TAG_MAKE, "make"), (_TAG_MODEL, "model"),
                     (_TAG_DATETIME, "datetime")):
        if isinstance(ifd0.get(tag), str):
            out[key] = ifd0[tag]
    ptr = ifd0.get(_TAG_EXIF_IFD)
    if isinstance(ptr, int):
        sub = _parse_ifd(t, e, ptr)
        if isinstance(sub.get(_TAG_PIXEL_X), int):
            out["exif_pixel_x"] = sub[_TAG_PIXEL_X]
        if isinstance(sub.get(_TAG_PIXEL_Y), int):
            out["exif_pixel_y"] = sub[_TAG_PIXEL_Y]


def parse_jpeg_metadata(data: bytes) -> dict:
    """Metadata-only marker walk: JFIF density + Exif fields, no decode.

    Stops at SOS (T.81 B.2: all tables/misc segments precede the first
    scan). Missing segments/fields stay None. Malformed structure raises
    JpegFormatError so the mapInPandas wrappers turn it into a
    ``decode_error`` row; nothing else can escape.
    """
    out: dict = dict.fromkeys((
        "jfif_units", "jfif_xdensity", "jfif_ydensity", "byte_order",
        "orientation", "make", "model", "datetime",
        "exif_pixel_x", "exif_pixel_y"))
    if data[:2] != JPEG_SOI:
        raise JpegFormatError("not a JPEG")
    pos = 2
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegFormatError(f"bad marker sync at {pos}")
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker in (0xD9, 0xDA):       # EOI / SOS: metadata is over
            return out
        if pos + 4 > len(data):
            raise JpegFormatError("truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if seglen < 2 or len(body) != seglen - 2:
            raise JpegFormatError("truncated segment")
        if marker == 0xE0 and body[:5] == b"JFIF\x00" and len(body) >= 12:
            units, xd, yd = struct.unpack(">BHH", body[7:12])
            out["jfif_units"] = units
            out["jfif_xdensity"] = xd
            out["jfif_ydensity"] = yd
        elif marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            try:
                _parse_tiff(body[6:], out)
            except struct.error as exc:           # normalize to the contract
                raise JpegFormatError(f"bad EXIF structure: {exc}") from exc
        pos += 2 + seglen
    return out


# --------------------------------------------------------------------------
# orientation normalization
# --------------------------------------------------------------------------

def apply_orientation(arr: np.ndarray, orientation: int) -> np.ndarray:
    """Re-orient a (H, W) or (H, W, C) pixel array per EXIF orientation.

    Coordinate model (verified exhaustively in tests/test_exif.py):
      1 identity                 2 out[y,x] = src[y, W-1-x]
      3 out[y,x] = src[H-1-y, W-1-x]   4 out[y,x] = src[H-1-y, x]
      5 out[y,x] = src[x, y]           6 out[y,x] = src[H-1-x, y]
      7 out[y,x] = src[H-1-x, W-1-y]   8 out[y,x] = src[x, W-1-y]
    5-8 swap the output dims. Views until the final copy."""
    o = int(orientation)
    if o == 1:
        return np.ascontiguousarray(arr)
    if o == 2:
        v = arr[:, ::-1]
    elif o == 3:
        v = arr[::-1, ::-1]
    elif o == 4:
        v = arr[::-1]
    elif o == 5:
        v = np.swapaxes(arr, 0, 1)
    elif o == 6:
        v = np.swapaxes(arr, 0, 1)[:, ::-1]
    elif o == 7:
        v = np.swapaxes(arr, 0, 1)[::-1, ::-1]
    elif o == 8:
        v = np.swapaxes(arr, 0, 1)[::-1, :]
    else:
        raise JpegFormatError(f"bad orientation {orientation}")
    return np.ascontiguousarray(v)
