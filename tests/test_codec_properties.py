"""Property-based fuzz of the real media codecs (no Spark session needed).

Every codec must satisfy, for ARBITRARY pixel/frame content and dims:
decode(encode(x)) == x exactly. The GIF case additionally crosses the
interesting LZW boundaries (code-width growth at 512/1024/..., the 4096
table overflow + CLEAR) whenever hypothesis generates enough pixels; the
AVI case crosses idx1 seek vs full-walk agreement and negative indexing.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_DIMS = st.tuples(st.integers(1, 40), st.integers(1, 24))


@settings(max_examples=40, deadline=None)
@given(_DIMS, st.integers(0, 2 ** 32 - 1), st.booleans())
def test_gif_roundtrip_fuzz(dims, seed, interlace):
    from flink_job_spark.functions.gif import decode_gif, encode_gif, gif_meta

    w, h = dims
    idx = bytes((seed + i * 2654435761) % 256 for i in range(w * h))
    g = encode_gif(w, h, idx, interlace=interlace)
    assert gif_meta(g) == (w, h)
    W, H, C, rgb = decode_gif(g)
    assert (W, H, C) == (w, h, 3)
    assert rgb == bytes(b for v in idx for b in (v, v, v))


@settings(max_examples=40, deadline=None)
@given(_DIMS, st.integers(0, 2 ** 32 - 1), st.booleans())
def test_bmp_roundtrip_fuzz(dims, seed, top_down):
    from flink_job_spark.functions.bmp import bmp_meta, decode_bmp, encode_bmp

    w, h = dims
    px = bytes((seed + i * 40503) % 256 for i in range(w * h * 3))
    b = encode_bmp(w, h, px, top_down=top_down)
    assert bmp_meta(b)[:2] == (w, h)
    assert decode_bmp(b) == (w, h, 3, px)


@settings(max_examples=25, deadline=None)
@given(_DIMS, st.integers(0, 2 ** 32 - 1), st.sampled_from([0, 2, 6]))
def test_png_roundtrip_fuzz(dims, seed, ctype):
    from flink_job_spark.functions.png import decode_png, encode_png, png_meta

    w, h = dims
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    px = bytes((seed + i * 69069) % 256 for i in range(w * h * ch))
    p = encode_png(w, h, px, ctype)
    assert png_meta(p)[:2] == (w, h)
    assert decode_png(p) == (w, h, ch, px)


@settings(max_examples=25, deadline=None)
@given(_DIMS, st.integers(1, 6), st.sampled_from([5, 10, 20, 25]),
       st.integers(0, 2 ** 32 - 1))
def test_avi_roundtrip_and_seek_fuzz(dims, n_frames, fps, seed):
    from flink_job_spark.functions.avi import (avi_meta, decode_avi,
                                               decode_avi_frame, encode_avi)

    w, h = dims
    frames = [bytes((seed + f * 131 + i * 2654435761) % 256
                    for i in range(w * h * 3)) for f in range(n_frames)]
    g = encode_avi(w, h, fps, frames)
    assert avi_meta(g) == (w, h, n_frames, 1_000_000 // fps)
    W, H, N, U, out = decode_avi(g)
    assert (W, H, N, U) == (w, h, n_frames, 1_000_000 // fps)
    assert out == frames
    # idx1 seek agrees with the full decode at both index conventions
    assert decode_avi_frame(g, n_frames - 1) == frames[-1]
    assert decode_avi_frame(g, -n_frames) == frames[0]


def test_gif_lzw_table_overflow_roundtrip():
    """Deterministic large-image case guaranteeing width growth to 12 bits
    and the 4096-entry CLEAR/reset path (random fuzz dims stay small)."""
    import random

    from flink_job_spark.functions.gif import decode_gif, encode_gif

    rng = random.Random(99)
    w, h = 256, 200
    idx = bytes(rng.randrange(256) for _ in range(w * h))
    W, H, C, rgb = decode_gif(encode_gif(w, h, idx))
    assert (W, H, C) == (w, h, 3)
    assert rgb == bytes(b for v in idx for b in (v, v, v))


# ---- decompression-bomb guards (ADVICE r3: a few-MB crafted blob must not
# drive multi-GB allocations inside a 100 TB scan; oversized claims stay
# errors-as-data) ----

def test_png_bomb_huge_dims_rejected():
    import struct
    import zlib

    from flink_job_spark.functions.png import (PNG_SIGNATURE, PngFormatError,
                                               decode_png)
    import pytest

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", 65535, 65535, 8, 2, 0, 0, 0)
    bomb = (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 4096))
            + chunk(b"IEND", b""))
    with pytest.raises(PngFormatError, match="dims too large"):
        decode_png(bomb)


def test_png_zlib_overexpansion_bounded():
    """IDAT that inflates PAST the declared dims is rejected after at most
    expected+1 bytes — the bomb never materializes."""
    import struct
    import zlib

    from flink_job_spark.functions.png import (PNG_SIGNATURE, PngFormatError,
                                               decode_png)
    import pytest

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    # declares 2x2 RGB (expected 2*(6+1)=14 bytes) but inflates to 10 MB
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bad = (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", zlib.compress(b"\x00" * 10_000_000))
           + chunk(b"IEND", b""))
    with pytest.raises(PngFormatError, match="IDAT size"):
        decode_png(bad)


def test_gif_bomb_huge_dims_rejected():
    import struct

    from flink_job_spark.functions.gif import GifFormatError, decode_gif
    import pytest

    pal = bytes(range(6))  # 2-entry global color table
    header = (b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0x80, 0, 0)
              + pal)
    desc = b"\x2C" + struct.pack("<HHHHB", 0, 0, 65535, 65535, 0)
    bomb = header + desc + b"\x02\x01\x44\x00\x3B"
    with pytest.raises(GifFormatError, match="dims too large"):
        decode_gif(bomb)


def test_decode_caps_are_data_in_operators(spark):
    """An oversized-dims blob flowing through the mapInPandas media path
    lands in decode_error, never an executor exception."""
    import struct
    import zlib

    from flink_job_spark.operators.multimodal import decode_pixel_stats

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    from flink_job_spark.functions.png import PNG_SIGNATURE
    ihdr = struct.pack(">IIBBBBB", 65535, 65535, 8, 2, 0, 0, 0)
    bomb = (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(b"\x00" * 64))
            + chunk(b"IEND", b""))
    df = spark.createDataFrame([(1, bytearray(bomb))], "media_id long, payload binary")
    row = decode_pixel_stats(df).collect()[0]
    assert row["decode_error"] is not None
    assert "dims too large" in row["decode_error"]
