"""EXIF/APP1 + orientation tests (functions/exif.py, r5 wave 3).

Coverage model (mirrors the codec suites): spec-shaped roundtrip in BOTH
byte orders, an exhaustive coordinate-model twin for all 8 orientations,
inverse-orientation involution, defaults on EXIF-less files, splice-
position tolerance, decoder indifference to the unknown APP1, and the
errors-as-data contract under byte-flip + truncation corruption — the
same fuzz that caught the DQT scatter escape in round 4 (ADVICE r4 #1).
"""

from __future__ import annotations

import numpy as np
import pytest

from flink_job_spark.functions.exif import (INVERSE_ORIENTATION,
                                            apply_orientation,
                                            build_exif_app1,
                                            parse_jpeg_metadata, splice_app1)
from flink_job_spark.functions.jpeg import (JpegFormatError, decode_jpeg,
                                            encode_jpeg)

BASE = encode_jpeg(8, 8, bytes([128] * 64), 1, quality=50)


@pytest.mark.parametrize("bo", ["II", "MM"])
def test_build_parse_roundtrip(bo):
    """Every written field reads back identically in both byte orders —
    including ASCII values long enough to live in the offset data area."""
    app1 = build_exif_app1(
        bo, orientation=6, make="longcameravendor", model="m1",
        datetime="2026:08:15 12:00:07", pixel_x=1003, pixel_y=2005)
    m = parse_jpeg_metadata(splice_app1(BASE, app1))
    assert m["byte_order"] == bo
    assert m["orientation"] == 6
    assert m["make"] == "longcameravendor"
    assert m["model"] == "m1"
    assert m["datetime"] == "2026:08:15 12:00:07"
    assert (m["exif_pixel_x"], m["exif_pixel_y"]) == (1003, 2005)
    # JFIF APP0 from the encoder is read too
    assert (m["jfif_units"], m["jfif_xdensity"], m["jfif_ydensity"]) \
        == (0, 1, 1)


def test_partial_fields_and_defaults():
    """Absent segments/fields stay None; a tags-only IFD0 (no sub-IFD)
    and an EXIF-less file both parse cleanly."""
    m = parse_jpeg_metadata(BASE)
    assert m["byte_order"] is None and m["orientation"] is None
    assert m["exif_pixel_x"] is None
    only_orient = build_exif_app1("II", orientation=2)
    m = parse_jpeg_metadata(splice_app1(BASE, only_orient))
    assert m["orientation"] == 2 and m["make"] is None
    assert m["exif_pixel_x"] is None


def test_splice_positions():
    """Real files put APP1 after SOI or after APP0 — both are found (the
    walk reads every APPn before SOS)."""
    app1 = build_exif_app1("MM", orientation=5)
    after_soi = BASE[:2] + app1 + BASE[2:]
    assert parse_jpeg_metadata(after_soi)["orientation"] == 5
    # after APP0: SOI(2) + APP0 segment, then APP1
    app0_len = 2 + int.from_bytes(BASE[4:6], "big")
    cut = 2 + app0_len
    after_app0 = BASE[:cut] + app1 + BASE[cut:]
    assert parse_jpeg_metadata(after_app0)["orientation"] == 5
    # and a non-Exif APP1 (XMP) is skipped, not misparsed
    xmp = b"\xFF\xE1" + (len(b"http://ns.adobe.com/xap/1.0/\x00") + 2
                         ).to_bytes(2, "big") + b"http://ns.adobe.com/xap/1.0/\x00"
    assert parse_jpeg_metadata(BASE[:2] + xmp + BASE[2:])["orientation"] is None


def test_decoder_ignores_app1():
    """Pixel decode is byte-identical with and without the EXIF segment."""
    px = np.arange(64, dtype=np.uint8) * 2
    j = encode_jpeg(8, 8, px.tobytes(), 1, quality=50)
    spliced = splice_app1(j, build_exif_app1("II", orientation=3,
                                             make="m" * 40))
    assert decode_jpeg(j) == decode_jpeg(spliced)


def test_orientation_coordinate_model():
    """Twin proof: apply_orientation equals the explicit per-pixel
    coordinate map for all 8 orientations on an asymmetric color array."""
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    H, W = 5, 7
    maps = {1: lambda y, x: (y, x), 2: lambda y, x: (y, W - 1 - x),
            3: lambda y, x: (H - 1 - y, W - 1 - x),
            4: lambda y, x: (H - 1 - y, x), 5: lambda y, x: (x, y),
            6: lambda y, x: (H - 1 - x, y),
            7: lambda y, x: (H - 1 - x, W - 1 - y),
            8: lambda y, x: (x, W - 1 - y)}
    for o, f in maps.items():
        got = apply_orientation(a, o)
        eh, ew = (W, H) if o >= 5 else (H, W)
        assert got.shape == (eh, ew, 3), (o, got.shape)
        for y in range(eh):
            for x in range(ew):
                assert (got[y, x] == a[f(y, x)]).all(), (o, y, x)
        # involution: applying the inverse restores the original
        assert (apply_orientation(got, INVERSE_ORIENTATION[o]) == a).all()
    with pytest.raises(JpegFormatError):
        apply_orientation(a, 9)


def test_orientation_grayscale_2d():
    """2-D (no channel axis) arrays re-orient identically."""
    a = np.arange(12, dtype=np.uint8).reshape(3, 4)
    got = apply_orientation(a, 6)
    assert got.shape == (4, 3)
    assert got[0, 0] == a[2, 0] and got[-1, -1] == a[0, 3]


def test_corruption_stays_errors_as_data():
    """Byte-flip every APP1 byte (3 masks) and truncate at every length:
    parse either succeeds or raises JpegFormatError — nothing else may
    escape into the mapInPandas errors-as-data handlers."""
    app1 = build_exif_app1("MM", orientation=3, make="x" * 9, pixel_x=5)
    j = splice_app1(BASE, app1)
    for pos in range(2, 2 + len(app1)):
        for delta in (0x01, 0x80, 0xFF):
            jb = bytearray(j)
            jb[pos] ^= delta
            try:
                parse_jpeg_metadata(bytes(jb))
            except JpegFormatError:
                pass
    for cut in range(2, len(j)):
        try:
            parse_jpeg_metadata(j[:cut])
        except JpegFormatError:
            pass


def test_bomb_guards():
    """Absurd IFD entry counts and out-of-range value offsets raise
    JpegFormatError (bounded work, no allocation proportional to the
    claimed count)."""
    import struct

    # entry count 0xFFFF with no entry bytes behind it
    tiff = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8) \
        + struct.pack("<H", 0xFFFF)
    body = b"Exif\x00\x00" + tiff
    seg = b"\xFF\xE1" + struct.pack(">H", len(body) + 2) + body
    with pytest.raises(JpegFormatError):
        parse_jpeg_metadata(BASE[:2] + seg + BASE[2:])
    # ASCII value whose offset points past the segment end (count small
    # enough to pass the absurd-count skip, large enough to force the
    # offset path)
    ent = struct.pack("<HHI", 0x010F, 2, 8) + struct.pack("<I", 10_000)
    tiff = b"II" + struct.pack("<H", 42) + struct.pack("<I", 8) \
        + struct.pack("<H", 1) + ent + struct.pack("<I", 0)
    body = b"Exif\x00\x00" + tiff
    seg = b"\xFF\xE1" + struct.pack(">H", len(body) + 2) + body
    with pytest.raises(JpegFormatError):
        parse_jpeg_metadata(BASE[:2] + seg + BASE[2:])
