"""Multimodal plumbing tests: binary payload columns through mapInPandas."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_job_spark.operators.multimodal import (
    EMBED_DIM,
    FAKE_AUD_MAGIC,
    decode_image_meta,
    encode_fake_image,
    extract_features,
    frame_sample_plan,
    resize_plan,
    MEDIA_SCHEMA,
)


def _media_df(spark):
    rows = [
        (1, "image", "image/fake", encode_fake_image(1, 640, 480)),
        (2, "image", "image/fake", encode_fake_image(2, 100, 2000)),
        (3, "audio", "audio/fake", FAKE_AUD_MAGIC + b"\x00" * 8),
        (4, "image", "image/jpeg", b"\xff\xd8\xff\xe0 real jpeg header"),
        (5, "image", "image/fake", None),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_image_meta(spark):
    out = decode_image_meta(_media_df(spark)).collect()
    by_id = {r["media_id"]: r for r in out}
    assert (by_id[1]["width"], by_id[1]["height"]) == (640, 480)
    assert (by_id[2]["width"], by_id[2]["height"]) == (100, 2000)
    assert by_id[3]["decode_error"] == "not an image"
    # JPEG decodes for real now: a bogus header surfaces as a format error
    assert by_id[4]["decode_error"].startswith("bad jpeg")
    assert by_id[5]["decode_error"] == "null payload"


def test_resize_plan(spark):
    meta = decode_image_meta(_media_df(spark))
    out = {r["media_id"]: r for r in resize_plan(meta, max_side=512).collect()}
    assert (out[1]["target_width"], out[1]["target_height"]) == (512, 384)
    assert (out[2]["target_width"], out[2]["target_height"]) == (26, 512)
    assert out[3]["target_width"] is None  # non-images pass through as null


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 3500), (2, 0)], "media_id long, duration_ms long")
    out = {r["media_id"]: r["frame_ts_ms"] for r in frame_sample_plan(df, fps=1.0).collect()}
    assert out[1] == [0, 1000, 2000, 3000]
    assert out[2] == [0]


def test_extract_features_deterministic(spark):
    feats = extract_features(_media_df(spark))
    rows = {r["media_id"]: r["feature"] for r in feats.collect()}
    assert len(rows[1]) == EMBED_DIM
    assert all(0.0 <= v <= 1.0 for v in rows[1])
    assert rows[5] is None
    # deterministic: same payload → same vector
    again = {r["media_id"]: r["feature"] for r in extract_features(_media_df(spark)).collect()}
    assert rows[1] == again[1]


# --- real PNG codec path -----------------------------------------------------------

def _make_png(w, h, ctype, seed=7):
    from flink_job_spark.functions.png import encode_png

    ch = {0: 1, 2: 3, 6: 4}[ctype]
    px = bytes(((seed + i * 31) % 256) for i in range(w * h * ch))
    return encode_png(w, h, px, ctype), px


def test_png_roundtrip_all_color_types():
    from flink_job_spark.functions.png import decode_png, png_meta

    for ctype in (0, 2, 6):
        data, px = _make_png(13, 9, ctype)
        assert png_meta(data)[:2] == (13, 9)
        w, h, ch, got = decode_png(data)
        assert (w, h) == (13, 9) and got == px


def test_png_all_filters_unfilter():
    """Hand-build IDAT scanlines using every PNG filter type and check the
    decoder reconstructs the same pixels a filter-0 encode yields."""
    import struct as st
    import zlib

    from flink_job_spark.functions.png import PNG_SIGNATURE, decode_png

    w, h, ch = 5, 5, 3
    px = bytes(((11 + i * 17) % 256) for i in range(w * h * ch))
    stride = w * ch

    def row(y):
        return px[y * stride:(y + 1) * stride]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    raw = bytearray()
    prev = bytes(stride)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        line = row(y)
        enc = bytearray()
        for i in range(stride):
            a = line[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if f == 0:
                v = line[i]
            elif f == 1:
                v = (line[i] - a) & 0xFF
            elif f == 2:
                v = (line[i] - b) & 0xFF
            elif f == 3:
                v = (line[i] - ((a + b) >> 1)) & 0xFF
            else:
                v = (line[i] - paeth(a, b, c)) & 0xFF
            enc.append(v)
        raw += bytes([f]) + bytes(enc)
        prev = line

    def chunk(tag, body):
        return (st.pack(">I", len(body)) + tag + body
                + st.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = st.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))
    got = decode_png(data)
    assert got == (w, h, ch, px)


def test_decode_image_meta_handles_real_png(spark):
    """The distributed metadata scan decodes real PNG headers (no
    decode_error), and decode_pixel_stats inflates + unfilters the pixels."""
    from flink_job_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_meta,
        decode_pixel_stats,
    )

    payloads = []
    expected = {}
    for mid, (w, h, ctype) in enumerate([(12, 8, 2), (7, 7, 0), (5, 9, 6)]):
        data, px = _make_png(w, h, ctype, seed=mid)
        payloads.append((mid, "image", "image/png", bytearray(data)))
        expected[mid] = (w, h, round(sum(px) / len(px), 6))
    media = spark.createDataFrame(payloads, MEDIA_SCHEMA)

    meta = {r["media_id"]: r for r in decode_image_meta(media).collect()}
    for mid, (w, h, _) in expected.items():
        assert meta[mid]["decode_error"] is None
        assert (meta[mid]["width"], meta[mid]["height"]) == (w, h)

    stats = {r["media_id"]: r for r in decode_pixel_stats(media).collect()}
    for mid, (w, h, luma) in expected.items():
        r = stats[mid]
        assert r["decode_error"] is None
        assert (r["width"], r["height"]) == (w, h)
        assert abs(r["mean_luma"] - luma) < 1e-9


def test_decode_audio_meta_real_wav(spark):
    """Distributed WAV decode: stdlib-generated PCM payloads come back with
    exact rate/frames/duration and the analytically known RMS of a square
    wave; a junk payload degrades to decode_error, not an exception."""
    import io
    import math
    import wave as wavmod

    from flink_job_spark.operators.multimodal import MEDIA_SCHEMA, decode_audio_meta

    def make_wav(sr, n, amp):
        buf = io.BytesIO()
        with wavmod.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(sr)
            # square wave at amp: RMS == amp exactly
            wf.writeframes(b"".join(
                int(amp if i % 2 == 0 else -amp).to_bytes(2, "little", signed=True)
                for i in range(n)))
        return buf.getvalue()

    rows = [
        (0, "audio", "audio/wav", bytearray(make_wav(16000, 1600, 1000))),
        (1, "audio", "audio/wav", bytearray(make_wav(8000, 800, 12345))),
        (2, "audio", "audio/junk", bytearray(b"RIFFgarbage")),
        (3, "audio", "audio/mp3", bytearray(b"ID3\x04trash")),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in decode_audio_meta(media).collect()}

    assert got[0]["decode_error"] is None
    assert (got[0]["sample_rate"], got[0]["channels"], got[0]["n_frames"]) == (16000, 1, 1600)
    assert math.isclose(got[0]["duration_ms"], 100.0)
    assert math.isclose(got[0]["rms"], 1000.0)
    assert math.isclose(got[1]["rms"], 12345.0)
    assert got[2]["decode_error"] and "bad wav" in got[2]["decode_error"]
    # r5 wave 4: MP3-shaped payloads route through the native frame walk
    # (functions/mp3.py) — truncated ID3 junk now gets the specific mp3
    # error, not the generic library-boundary row
    assert got[3]["decode_error"] and got[3]["decode_error"].startswith(
        "bad mp3:")


def test_wav_rms_key_odd_frame_count_still_exact(spark):
    """The q_media_wav_rms closed form must hold for ODD frame counts too:
    RMS of an alternating ±amp square wave is amp regardless of parity
    (every sample contributes amp² exactly)."""
    import io
    import wave as wavmod

    from flink_job_spark.operators.multimodal import MEDIA_SCHEMA, decode_audio_meta

    def make(n, amp, sr):
        buf = io.BytesIO()
        with wavmod.open(buf, "wb") as wf:
            wf.setnchannels(1); wf.setsampwidth(2); wf.setframerate(sr)
            wf.writeframes(b"".join(
                (amp if j % 2 == 0 else -amp).to_bytes(2, "little", signed=True)
                for j in range(n)))
        return buf.getvalue()

    rows = [(0, "audio", "audio/wav", bytearray(make(401, 19999, 32000))),
            (1, "audio", "audio/wav", bytearray(make(403, 201, 4000)))]
    got = {r["media_id"]: r for r in decode_audio_meta(
        spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()}
    assert got[0]["rms"] == 19999.0 and got[1]["rms"] == 201.0
    # power-of-two rates: duration is binary-exact, no rounding occurred
    assert got[0]["duration_ms"] == 401 * 1000 / 32000
    assert got[1]["duration_ms"] == 403 * 1000 / 4000


def test_corrupt_payloads_stay_data_not_exceptions(spark):
    """The errors-as-data contract under REAL corruption: truncated FAKEIMG
    headers, valid-signature PNGs with garbage IDAT, short PNG prefixes, and
    header-only WAVs must all come back as decode_error rows — any escaping
    zlib/struct/ZeroDivision error would kill a 100 TB scan."""
    import io
    import wave as wavmod
    import zlib

    from flink_job_spark.functions.png import PNG_SIGNATURE
    from flink_job_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_audio_meta,
        decode_image_meta,
        decode_pixel_stats,
    )

    # PNG with valid signature + IHDR but corrupt IDAT bytes
    import struct as st

    def chunk(tag, body):
        c = st.pack(">I", len(body)) + tag + body
        return c + st.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)

    ihdr = chunk(b"IHDR", st.pack(">IIBB", 4, 4, 8, 2) + b"\x00\x00\x00")
    bad_idat = chunk(b"IDAT", b"this is not zlib data")
    corrupt_png = PNG_SIGNATURE + ihdr + bad_idat + chunk(b"IEND", b"")

    # WAV whose header declares frames but whose data chunk is empty
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as wf:
        wf.setnchannels(1); wf.setsampwidth(2); wf.setframerate(8000)
        wf.writeframes(b"\x01\x00" * 4)
    truncated_wav = buf.getvalue()
    truncated_wav = truncated_wav[: truncated_wav.rindex(b"data") + 8]

    rows = [
        (0, "image", "image/fake", bytearray(b"FAKEIMG1")),          # 8-byte header
        (1, "image", "image/png", bytearray(corrupt_png)),
        (2, "image", "image/png", bytearray(PNG_SIGNATURE + b"\x00\x01")),
        (3, "audio", "audio/wav", bytearray(truncated_wav)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    meta = {r["media_id"]: r for r in decode_image_meta(media).collect()}
    assert meta[0]["decode_error"] and "bad fakeimg" in meta[0]["decode_error"]
    assert meta[2]["decode_error"] and "bad png" in meta[2]["decode_error"]

    stats = {r["media_id"]: r for r in decode_pixel_stats(media).collect()}
    assert stats[1]["decode_error"] and "bad png" in stats[1]["decode_error"]
    assert stats[2]["decode_error"] and "bad png" in stats[2]["decode_error"]

    audio = {r["media_id"]: r for r in decode_audio_meta(media).collect()}
    a = audio[3]
    assert a["rms"] is None
    assert a["decode_error"] is None or "bad wav" in a["decode_error"]


# --- BMP codec --------------------------------------------------------------


def test_bmp_roundtrip_both_row_orders():
    """decode(encode(px)) == px for every width mod-4 padding class, both
    bottom-up and top-down row order."""
    from flink_job_spark.functions.bmp import bmp_meta, decode_bmp, encode_bmp

    for w in (1, 2, 3, 4, 5, 7, 8):        # strides 3,6,9,12,15,21,24 — all pads
        for h in (1, 2, 5):
            for top_down in (False, True):
                px = bytes(((w * 131 + h * 17 + i * 7) % 256)
                           for i in range(w * h * 3))
                data = encode_bmp(w, h, px, top_down=top_down)
                assert bmp_meta(data) == (w, h, 24)
                assert decode_bmp(data) == (w, h, 3, px), (w, h, top_down)


def test_bmp_rejects_malformed():
    import pytest as _pytest

    from flink_job_spark.functions.bmp import BmpFormatError, decode_bmp, encode_bmp

    good = encode_bmp(4, 2, bytes(range(24)))
    with _pytest.raises(BmpFormatError):
        decode_bmp(b"XX" + good[2:])             # bad signature
    with _pytest.raises(BmpFormatError):
        decode_bmp(good[:20])                    # truncated header
    with _pytest.raises(BmpFormatError):
        decode_bmp(good[:-4])                    # truncated pixel rows
    bad_bpp = bytearray(good)
    bad_bpp[28] = 8                              # bpp=8 (palettized)
    with _pytest.raises(BmpFormatError):
        decode_bmp(bytes(bad_bpp))
    with _pytest.raises(BmpFormatError):
        encode_bmp(2, 2, b"\x00" * 5)            # pixel buffer mismatch


def test_decode_pixel_stats_handles_bmp_and_corrupt_bmp(spark):
    """BMP payloads flow through the same stats operator as PNG; corrupt
    DIBs become decode_error rows, never exceptions."""
    from flink_job_spark.functions.bmp import encode_bmp
    from flink_job_spark.operators.multimodal import decode_pixel_stats

    px = bytes((i * 11) % 256 for i in range(3 * 2 * 3))
    good = encode_bmp(3, 2, px)
    rows = {
        r["media_id"]: r
        for r in decode_pixel_stats(
            spark.createDataFrame(
                [(1, "image", "image/bmp", bytearray(good)),
                 (2, "image", "image/bmp", bytearray(good[:30]))],
                "media_id long, kind string, mime string, payload binary")
        ).collect()
    }
    ok = rows[1]
    assert (ok["width"], ok["height"], ok["channels"]) == (3, 2, 3)
    assert ok["mean_luma"] == round(sum(px) / len(px), 6)
    assert ok["decode_error"] is None
    assert rows[2]["decode_error"].startswith("bad bmp")
    assert rows[2]["mean_luma"] is None


def test_decode_image_meta_reads_bmp_header_only(spark):
    from flink_job_spark.functions.bmp import encode_bmp
    from flink_job_spark.operators.multimodal import decode_image_meta

    data = encode_bmp(6, 4, bytes(6 * 4 * 3))
    r = decode_image_meta(
        spark.createDataFrame(
            [(9, "image", "image/bmp", bytearray(data))],
            "media_id long, kind string, mime string, payload binary")
    ).collect()[0]
    assert (r["width"], r["height"], r["decode_error"]) == (6, 4, None)


# --- audio features ---------------------------------------------------------


def _wav_bytes(samples, sr=8000, channels=1, width=2):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(width)
        wf.setframerate(sr)
        if width == 2:
            wf.writeframes(b"".join(
                int(s).to_bytes(2, "little", signed=True) for s in samples))
        else:
            wf.writeframes(bytes(samples))
    return buf.getvalue()


def test_audio_features_sine_dominant_bin(spark):
    """Independent spectral check: a 5-cycle sine in 64 samples must have
    dominant_bin 5 — validates the rfft path against first principles, not
    the square-wave closed form the oracle uses."""
    import math

    from flink_job_spark.operators.multimodal import audio_features

    n, f, amp = 64, 5, 10000
    samples = [round(amp * math.sin(2 * math.pi * f * j / n)) for j in range(n)]
    r = audio_features(
        spark.createDataFrame(
            [(1, "audio", "audio/wav", bytearray(_wav_bytes(samples)))],
            "media_id long, kind string, mime string, payload binary")
    ).collect()[0]
    assert r["dominant_bin"] == f
    assert r["decode_error"] is None
    assert r["n_frames"] == n
    assert r["peak"] == float(amp)
    assert abs(r["dominant_freq_hz"] - f * 8000 / n) < 1e-9


def test_audio_features_zcr_zero_carry_convention(spark):
    """Zero samples carry the previous sign: [+5, 0, -5, 0, +5] has exactly
    2 strict sign flips -> zcr = 2/4; leading zeros have no sign and cannot
    flip: [0, 0, +5, -5] -> 1/3."""
    from flink_job_spark.operators.multimodal import audio_features

    rows = {
        r["media_id"]: r
        for r in audio_features(
            spark.createDataFrame(
                [(1, "audio", "audio/wav",
                  bytearray(_wav_bytes([5, 0, -5, 0, 5]))),
                 (2, "audio", "audio/wav",
                  bytearray(_wav_bytes([0, 0, 5, -5])))],
                "media_id long, kind string, mime string, payload binary")
        ).collect()
    }
    assert rows[1]["zcr"] == 2 / 4
    assert rows[2]["zcr"] == 1 / 3


def test_audio_features_errors_stay_data(spark):
    from flink_job_spark.operators.multimodal import audio_features

    stereo = _wav_bytes([1, 2, 3, 4], channels=2)
    rows = {
        r["media_id"]: r
        for r in audio_features(
            spark.createDataFrame(
                [(1, "audio", "audio/wav", bytearray(stereo)),
                 (2, "audio", "audio/mp3", bytearray(b"ID3\x03rubbish")),
                 (3, "audio", "audio/wav", None),
                 (4, "audio", "audio/wav", bytearray(b"RIFFxxxx"))],
                "media_id long, kind string, mime string, payload binary")
        ).collect()
    }
    assert rows[1]["decode_error"] == "features need 16-bit mono PCM"
    assert rows[2]["decode_error"] == "not a decodable audio payload"
    assert rows[3]["decode_error"] == "null payload"
    assert rows[4]["decode_error"].startswith("bad wav")
    assert all(rows[i]["zcr"] is None for i in (1, 2, 3, 4))


# --- GIF codec --------------------------------------------------------------


def test_gif_roundtrip_interlace_and_sequential():
    import random

    from flink_job_spark.functions.gif import decode_gif, encode_gif, gif_meta

    rnd = random.Random(7)
    for (w, h) in [(1, 1), (2, 3), (8, 8), (13, 7), (16, 12), (31, 9)]:
        for inter in (False, True):
            idx = bytes(rnd.randrange(256) for _ in range(w * h))
            g = encode_gif(w, h, idx, interlace=inter)
            assert gif_meta(g) == (w, h)
            got = decode_gif(g)
            expect = bytes(b for i in idx for b in (i, i, i))
            assert got == (w, h, 3, expect), (w, h, inter)


def test_gif_decoder_handles_real_lzw_compression():
    """The repo encoder emits degenerate clear-prefixed LZW; this test
    compresses with an INDEPENDENT real LZW compressor (growing dictionary,
    growing code width, cScSc-producing patterns) and our decoder must
    reproduce the pixels — the path real-world GIFs exercise."""
    import struct

    from flink_job_spark.functions.gif import decode_gif

    def real_lzw(mcs, seq):
        clear, end = 1 << mcs, (1 << mcs) + 1
        table = {bytes([i]): i for i in range(clear)}
        next_code = end + 1
        width = mcs + 1
        out, acc, nbits = bytearray(), 0, 0

        def emit(code, w):
            nonlocal acc, nbits
            acc |= code << nbits
            nbits += w
            while nbits >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nbits -= 8

        emit(clear, width)
        cur = b""
        for b in seq:
            nxt = cur + bytes([b])
            if nxt in table:
                cur = nxt
                continue
            emit(table[cur], width)
            if next_code < 4096:
                table[nxt] = next_code
                if next_code == (1 << width) and width < 12:
                    width += 1
                next_code += 1
            cur = bytes([b])
        if cur:
            emit(table[cur], width)
        emit(end, width)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)

    w, h, mcs = 16, 10, 8
    # repetitive pattern -> long dictionary chains incl. cScSc shapes
    idx = bytes((j // 3) % 7 for j in range(w * h))
    payload = real_lzw(mcs, idx)
    palette = bytes(b for i in range(256) for b in (i, i, i))
    blocks = b"".join(
        bytes([min(255, len(payload) - i)]) + payload[i:i + 255]
        for i in range(0, len(payload), 255))
    gif = (b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0) + palette
           + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
           + bytes([mcs]) + blocks + b"\x00\x3B")
    got = decode_gif(gif)
    assert got == (w, h, 3, bytes(b for i in idx for b in (i, i, i)))


def test_gif_rejects_malformed():
    import pytest as _pytest

    from flink_job_spark.functions.gif import GifFormatError, decode_gif, encode_gif

    good = encode_gif(4, 3, bytes(12))
    # image descriptor sits right after header(13) + 768-byte palette
    bad_marker = bytearray(good)
    assert bad_marker[13 + 768] == 0x2C
    bad_marker[13 + 768] = 0x7C
    for bad in (b"NOTGIF azx", good[:10], good[:40], good[:-6],
                bytes(bad_marker)):
        with _pytest.raises(GifFormatError):
            decode_gif(bad)
    with _pytest.raises(GifFormatError):
        encode_gif(2, 2, b"\x00" * 3)


def test_decode_pixel_stats_handles_gif_and_corrupt_gif(spark):
    from flink_job_spark.functions.gif import encode_gif
    from flink_job_spark.operators.multimodal import decode_pixel_stats

    idx = bytes((i * 13) % 256 for i in range(5 * 4))
    good = encode_gif(5, 4, idx, interlace=True)
    rows = {
        r["media_id"]: r
        for r in decode_pixel_stats(
            spark.createDataFrame(
                [(1, "image", "image/gif", bytearray(good)),
                 (2, "image", "image/gif", bytearray(good[:25]))],
                "media_id long, kind string, mime string, payload binary")
        ).collect()
    }
    ok = rows[1]
    assert (ok["width"], ok["height"], ok["channels"]) == (5, 4, 3)
    assert ok["mean_luma"] == round(sum(idx) / len(idx), 6)
    assert ok["decode_error"] is None
    assert rows[2]["decode_error"].startswith("bad gif")


def test_avi_roundtrip_and_meta():
    import random

    from flink_job_spark.functions.avi import (avi_meta, decode_avi,
                                               decode_avi_frame, encode_avi)

    rng = random.Random(11)
    for w, h, n, fps in [(1, 1, 1, 5), (7, 3, 4, 25), (16, 9, 7, 10),
                         (33, 17, 2, 20)]:
        frames = [bytes(rng.randrange(256) for _ in range(w * h * 3))
                  for _ in range(n)]
        g = encode_avi(w, h, fps, frames)
        assert avi_meta(g) == (w, h, n, 1_000_000 // fps)
        W, H, N, U, out = decode_avi(g)
        assert (W, H, N, U) == (w, h, n, 1_000_000 // fps)
        assert out == frames
        # idx1-seeked single-frame decode agrees with the full decode
        for i in (0, n // 2, n - 1, -1):
            assert decode_avi_frame(g, i) == frames[i]


def test_avi_seek_uses_index_not_full_scan():
    """Frame seek must come from idx1: corrupting every OTHER frame's bytes
    (but not the index) still decodes the intact frames correctly."""
    from flink_job_spark.functions.avi import decode_avi_frame, encode_avi

    w, h, n = 4, 2, 5
    frames = [bytes([f * 40 + j for j in range(w * h * 3)]) for f in range(n)]
    g = bytearray(encode_avi(w, h, 25, frames))
    # stomp frame 1's chunk body in place, leaving the idx1 table intact
    from flink_job_spark.functions.avi import _frame_offsets, _parse
    info = _parse(bytes(g))
    offs = _frame_offsets(bytes(g), info)
    pos, size = offs[1]
    g[pos:pos + size] = b"\xEE" * size
    assert decode_avi_frame(bytes(g), 0) == frames[0]
    assert decode_avi_frame(bytes(g), 2) == frames[2]
    assert decode_avi_frame(bytes(g), 1) != frames[1]  # really did stomp


def test_avi_rejects_malformed():
    import pytest as _pytest

    from flink_job_spark.functions.avi import (AviFormatError, decode_avi,
                                               encode_avi)

    good = encode_avi(4, 3, 10, [bytes(36)])
    for bad in (b"RIFF\x10\x00\x00\x00WAVEfmt ", b"JUNK" * 4, good[:20]):
        with _pytest.raises(AviFormatError):
            decode_avi(bad)
    with _pytest.raises(AviFormatError):
        encode_avi(4, 3, 7, [bytes(36)])       # fps must divide 1e6
    with _pytest.raises(AviFormatError):
        encode_avi(4, 3, 10, [])               # no frames
    with _pytest.raises(AviFormatError):
        encode_avi(4, 3, 10, [bytes(35)])      # wrong buffer size


def test_video_frame_stats_samples_and_errors(spark):
    from flink_job_spark.functions.avi import encode_avi
    from flink_job_spark.operators.multimodal import video_frame_stats

    w, h, n, fps = 6, 4, 5, 10
    frames = [bytes(((f * 13 + j * 7) % 256) for j in range(w * h)
                    for _ in range(3)) for f in range(n)]
    good = encode_avi(w, h, fps, frames)
    rows = {
        r["media_id"]: r
        for r in video_frame_stats(
            spark.createDataFrame(
                [(1, "video", "video/x-msvideo", bytearray(good)),
                 (2, "video", "video/x-msvideo", bytearray(good[:30])),
                 (3, "video", "video/x-msvideo", None)],
                "media_id long, kind string, mime string, payload binary"),
            sample=(0, 500, 999),
        ).collect()
    }
    ok = rows[1]
    assert (ok["width"], ok["height"], ok["n_frames"]) == (w, h, n)
    assert ok["duration_ms"] == n * 1000 // fps
    sampled = {0, n // 2, n - 1}
    vals = [(f * 13 + j * 7) % 256 for f in sampled for j in range(w * h)]
    assert ok["mean_luma"] == round(sum(vals) / len(vals), 6)
    assert ok["decode_error"] is None
    assert rows[2]["decode_error"].startswith("bad video")
    assert rows[3]["decode_error"] == "null payload"


def test_avi_lying_frame_count_is_data_not_crash(spark):
    """An avih header claiming more frames than the file holds must surface
    as a decode_error row (AviFormatError), never an IndexError that kills
    the mapInPandas task."""
    import struct as structmod

    from flink_job_spark.functions.avi import encode_avi
    from flink_job_spark.operators.multimodal import video_frame_stats

    w, h = 4, 3
    good = bytearray(encode_avi(w, h, 10, [bytes(36), bytes(36)]))
    # avih body starts at 32 (RIFF12 + LIST8 + 'hdrl'4 + chunkhdr8);
    # dwTotalFrames is its 5th DWORD
    assert structmod.unpack_from("<I", good, 32 + 16)[0] == 2
    structmod.pack_into("<I", good, 32 + 16, 99)
    rows = video_frame_stats(
        spark.createDataFrame(
            [(1, "video", "video/x-msvideo", bytes(good))],
            "media_id long, kind string, mime string, payload binary"),
        sample=(0, 999),
    ).collect()
    assert rows[0]["decode_error"].startswith("bad video")
    assert "out of range" in rows[0]["decode_error"]


def test_avi_absolute_offset_idx1_autodetected():
    """idx1 offsets may legally be absolute file offsets; the decoder's
    first-entry ckid probe must detect that convention and still decode
    the right frames."""
    import struct as structmod

    from flink_job_spark.functions.avi import _parse, decode_avi_frame, encode_avi

    w, h, n = 5, 4, 3
    frames = [bytes([(f * 37 + j) % 256 for j in range(w * h * 3)])
              for f in range(n)]
    g = bytearray(encode_avi(w, h, 25, frames))
    info = _parse(bytes(g))
    base = info["movi_base"]
    pos, size = info["idx1"]
    for off in range(pos, pos + size - 15, 16):
        (ckoff,) = structmod.unpack_from("<I", g, off + 8)
        structmod.pack_into("<I", g, off + 8, ckoff + base)  # make absolute
    for i in range(n):
        assert decode_avi_frame(bytes(g), i) == frames[i]


def test_resize_pixel_stats_gathers_and_errors(spark):
    """Nearest-neighbor resample over a real BMP: the resized mean equals a
    hand-computed gather; corrupt and alien payloads stay data."""
    from flink_job_spark.functions.bmp import encode_bmp
    from flink_job_spark.operators.multimodal import resize_pixel_stats

    w, h, tw, th = 10, 7, 4, 3
    px = bytes(((j * 11) % 256) for j in range(w * h * 3))
    rows = {
        r["media_id"]: r
        for r in resize_pixel_stats(
            spark.createDataFrame(
                [(1, "image", "image/bmp", bytearray(encode_bmp(w, h, px))),
                 (2, "image", "image/bmp", bytearray(b"BMgarbage")),
                 (3, "image", "image/jpeg", bytearray(b"\xff\xd8\xff junk"))],
                "media_id long, kind string, mime string, payload binary"),
            target_width=tw, target_height=th,
        ).collect()
    }
    ok = rows[1]
    assert (ok["width"], ok["height"]) == (w, h)
    assert (ok["target_width"], ok["target_height"]) == (tw, th)
    vals = [px[((r2 * h // th) * w + (c2 * w // tw)) * 3 + ch]
            for r2 in range(th) for c2 in range(tw) for ch in range(3)]
    assert ok["mean_resized"] == round(sum(vals) / len(vals), 6)
    assert ok["decode_error"] is None
    assert rows[2]["decode_error"].startswith("bad bmp")
    assert rows[3]["decode_error"].startswith("bad jpeg")


def test_decode_pixel_stats_handles_420_jpeg_end_to_end(spark):
    """A 4:2:0 chroma-subsampled JPEG (the dominant real-world layout,
    r5) flows through the mapInPandas media path: decoded dims/channels
    and a mean_luma equal to the pure-Python decode of the same blob —
    and a corrupt variant of the same file stays errors-as-data."""
    import numpy as np

    from flink_job_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from flink_job_spark.operators.multimodal import decode_pixel_stats

    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, (24, 33, 3)).astype(np.uint8)
    blob = encode_jpeg(33, 24, rgb.tobytes(), 3, quality=75,
                       subsampling="420")
    _, _, _, px = decode_jpeg(blob)
    want_luma = round(sum(px) / len(px), 6)
    corrupt = blob[:len(blob) // 2]

    media = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(corrupt))],
        "media_id long, payload binary")
    stats = {r["media_id"]: r for r in decode_pixel_stats(media).collect()}
    ok = stats[1]
    assert (ok["width"], ok["height"], ok["channels"]) == (33, 24, 3)
    assert ok["decode_error"] is None
    assert abs(ok["mean_luma"] - want_luma) < 1e-9
    assert stats[2]["decode_error"] is not None


def test_decode_pixel_stats_handles_progressive_jpeg_end_to_end(spark):
    """A progressive (SOF2) 4:2:0 JPEG — the other dominant real-world
    layout (r5) — flows through the mapInPandas media path and yields the
    SAME stats row as the sequential encoding of the same pixels, because
    both carry identical quantized coefficients; a truncated progressive
    blob stays errors-as-data."""
    import numpy as np

    from flink_job_spark.functions.jpeg import encode_jpeg
    from flink_job_spark.operators.multimodal import decode_pixel_stats

    rng = np.random.default_rng(22)
    rgb = rng.integers(0, 256, (24, 33, 3)).astype(np.uint8)
    seq = encode_jpeg(33, 24, rgb.tobytes(), 3, quality=75,
                      subsampling="420")
    prog = encode_jpeg(33, 24, rgb.tobytes(), 3, quality=75,
                       subsampling="420", progressive=True)
    corrupt = prog[:len(prog) // 3]

    media = spark.createDataFrame(
        [(1, bytearray(seq)), (2, bytearray(prog)), (3, bytearray(corrupt))],
        "media_id long, payload binary")
    stats = {r["media_id"]: r for r in decode_pixel_stats(media).collect()}
    assert stats[2]["decode_error"] is None
    assert (stats[2]["width"], stats[2]["height"],
            stats[2]["channels"]) == (33, 24, 3)
    want = stats[1].asDict()
    got = stats[2].asDict()
    for k in want:
        if k != "media_id":
            assert got[k] == want[k], k
    assert stats[3]["decode_error"] is not None


def test_decode_pixel_stats_handles_cmyk_jpeg_end_to_end(spark):
    """An Adobe 4-component press JPEG (r5) flows through the mapInPandas
    media path: both APP14 layouts (CMYK transform 0 and YCCK transform
    2) of the SAME stored samples decode to identical RGB stats rows,
    reported as channels=3; a truncated variant stays errors-as-data."""
    import numpy as np

    from flink_job_spark.functions.jpeg import encode_jpeg
    from flink_job_spark.operators.multimodal import decode_pixel_stats

    vals = (2 * ((np.arange(6).reshape(2, 3) * 37 + 11) % 128)).astype(
        np.uint8)
    cmy = np.kron(vals, np.ones((8, 8), np.uint8))
    cmyk = np.stack([cmy, cmy, cmy, np.full_like(cmy, 254)], -1)
    direct = encode_jpeg(24, 16, cmyk.tobytes(), 4, quality=50)
    ycck = encode_jpeg(24, 16, cmyk.tobytes(), 4, quality=50, ycck=True)
    want = round(float(np.round(cmy.astype(np.float64) * 254 / 255).mean()),
                 6)

    media = spark.createDataFrame(
        [(1, bytearray(direct)), (2, bytearray(ycck)),
         (3, bytearray(direct[:40]))],
        "media_id long, payload binary")
    stats = {r["media_id"]: r for r in decode_pixel_stats(media).collect()}
    for mid in (1, 2):
        row = stats[mid]
        assert (row["width"], row["height"], row["channels"]) == (24, 16, 3)
        assert row["decode_error"] is None
        assert row["mean_luma"] == want
    assert stats[3]["decode_error"] is not None


def test_pillow_adapter_decodes_webp_when_available(spark):
    """Capability-gated (r5): on hosts with Pillow, a WebP payload —
    undecodable by the pure-Python codecs — flows through the adapter to
    real pixel stats; the pure-Python formats still take their own path.
    Skipped where Pillow is absent (this build sandbox), exercised on
    hosts that have it."""
    import pytest

    from flink_job_spark.functions.codec_adapters import pillow_available

    if not pillow_available():
        pytest.skip("Pillow not installed — adapter coverage n/a here")
    import io

    import numpy as np
    import PIL.Image

    from flink_job_spark.operators.multimodal import decode_pixel_stats

    rgb = np.zeros((10, 12, 3), np.uint8)
    rgb[..., 1] = 200
    buf = io.BytesIO()
    PIL.Image.fromarray(rgb).save(buf, format="WEBP", lossless=True)
    media = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                                  "media_id long, payload binary")
    row = decode_pixel_stats(media).collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (12, 10, 3)
    assert row["decode_error"] is None
    assert abs(row["mean_luma"] - 200 / 3) < 0.5


def test_adapter_absence_keeps_documented_boundary():
    """Where neither Pillow nor ffmpeg exists, the adapters must change
    NOTHING: unknown image magic still raises ImageDecodeError (wrapped to
    decode_error by the operators) and the capability probes are honest.
    Gated to hosts without the libs — the mirror of the test above."""
    import pytest

    from flink_job_spark.functions.codec_adapters import (ffmpeg_available,
                                                          pillow_available)

    if pillow_available() or ffmpeg_available():
        pytest.skip("codec libs present — boundary test n/a")
    from flink_job_spark.operators.multimodal import (ImageDecodeError,
                                                      _decode_any_image)

    # only ANIMATED WebP remains on the adapter since r8 (VP8L native
    # in r7, lossy VP8 and still VP8X+ALPH native in r8 — malformed
    # VP8/VP8X chunks are format errors, not capability boundaries;
    # an ANIM-flagged file without Pillow is the boundary)
    from flink_job_spark.functions.webp_ext import build_webp_extended
    anim = build_webp_extended(16, 16, bytes(16 * 16 * 4),
                               animated=True)
    with pytest.raises(ImageDecodeError, match="animated"):
        _decode_any_image(anim)
    with pytest.raises(ImageDecodeError, match="webp"):
        _decode_any_image(b"RIFFxxxxWEBPVP8X....")
    with pytest.raises(ImageDecodeError, match="webp"):
        _decode_any_image(b"RIFFxxxxWEBPVP8 ....")
    with pytest.raises(ImageDecodeError, match="not a decodable image"):
        _decode_any_image(b"\x89XYZ not an image")


def test_video_adapter_stream_math_pure():
    """The video adapter's streamed frame math, tested without ffmpeg:
    read_gray_frame_sums chunks a raw gray8 stream into per-frame sums
    with O(1) state, drops a partial trailing frame, and raises past the
    work-bomb cap; sampled_frame_indices matches the engine-wide rule
    video_frame_stats uses for the native codecs (collapse duplicates,
    clamp to the last frame)."""
    import io

    import pytest

    from flink_job_spark.functions.codec_adapters import (
        read_gray_frame_sums, sampled_frame_indices)

    fb = 4 * 3                        # a 4x3 gray frame
    f0 = bytes(range(fb))             # sum = 66
    f1 = bytes([10] * fb)             # sum = 120
    f2 = bytes([255] * fb)            # sum = 3060
    stream = io.BytesIO(f0 + f1 + f2 + b"\x01\x02")   # + partial frame
    assert read_gray_frame_sums(stream, fb) == [66, 120, 3060]
    # the trailing partial frame is dropped, not an off-by-one sum
    assert read_gray_frame_sums(io.BytesIO(b""), fb) == []
    with pytest.raises(ValueError, match="cap"):
        read_gray_frame_sums(io.BytesIO(bytes(fb * 3)), fb, max_frames=2)

    # identical to the inline rule in video_frame_stats
    assert sampled_frame_indices(5, (0, 500, 999)) == [0, 2, 4]
    assert sampled_frame_indices(1, (0, 500, 999)) == [0]   # collapses
    assert sampled_frame_indices(0, (0, 500, 999)) == []
    for nf in (1, 2, 3, 7, 100):
        for p in (0, 250, 500, 750, 999):
            assert sampled_frame_indices(nf, (p,)) == [min(p * nf // 1000,
                                                           nf - 1)]


def test_video_adapter_absent_keeps_error_rows(spark):
    """Adapter-absent hosts (this sandbox): an MP4/MKV payload through
    video_frame_stats is a decode_error ROW naming the adapter boundary,
    never an executor exception; native AVI/GIF/APNG rows next to it are
    untouched. Gated to hosts without ffmpeg."""
    import pytest

    from flink_job_spark.functions.avi import encode_avi
    from flink_job_spark.functions.codec_adapters import ffmpeg_available
    from flink_job_spark.operators.multimodal import video_frame_stats

    if ffmpeg_available():
        pytest.skip("host has ffmpeg; adapter will really decode")
    avi = encode_avi(4, 4, 10, [bytes([100] * 48), bytes([200] * 48)])
    mp4ish = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 64
    mkvish = b"\x1a\x45\xdf\xa3" + b"\x00" * 64
    media = spark.createDataFrame(
        [(1, "video", "video/x-msvideo", bytearray(avi)),
         (2, "video", "video/mp4", bytearray(mp4ish)),
         (3, "video", "video/webm", bytearray(mkvish))],
        "media_id long, kind string, mime string, payload binary")
    rows = {r["media_id"]: r for r in video_frame_stats(media).collect()}
    assert rows[1]["decode_error"] is None and rows[1]["n_frames"] == 2
    assert "ffmpeg adapter" in rows[2]["decode_error"]
    assert "ffmpeg adapter" in rows[3]["decode_error"]


def test_video_adapter_decodes_h264_when_available(spark):
    """CAPABILITY-GATED (skips in this sandbox): on a host with ffmpeg,
    an H.264 MP4 routes through decode_video_ffmpeg — geometry from
    ffprobe, n_frames from the streamed gray decode, mean_luma over the
    engine's sampled index set."""
    import subprocess

    import pytest

    from flink_job_spark.functions.codec_adapters import ffmpeg_available
    from flink_job_spark.operators.multimodal import video_frame_stats

    if not ffmpeg_available():
        pytest.skip("no ffmpeg on this host")
    # 6 gray frames, 16x16, constant luma 60 — libx264 lossless
    enc = subprocess.run(
        ["ffmpeg", "-v", "error", "-f", "lavfi",
         "-i", "color=c=0x3c3c3c:s=16x16:d=0.6:r=10",
         "-c:v", "libx264", "-qp", "0", "-pix_fmt", "yuv420p",
         "-movflags", "frag_keyframe+empty_moov", "-f", "mp4", "pipe:1"],
        capture_output=True, check=True)
    media = spark.createDataFrame(
        [(1, "video", "video/mp4", bytearray(enc.stdout))],
        "media_id long, kind string, mime string, payload binary")
    row = video_frame_stats(media, sample=(0, 500, 999)).collect()[0]
    assert row["decode_error"] is None
    assert (row["width"], row["height"]) == (16, 16)
    assert row["n_frames"] == 6
    # 0x3c=60 in RGB; BT.601 luma of gray (60,60,60) is 60 ± codec rounding
    assert abs(row["mean_luma"] - 60) < 2.0


def test_video_adapter_plumbing_with_fake_ffmpeg(tmp_path, monkeypatch):
    """Drives decode_video_ffmpeg's REAL subprocess plumbing (feeder
    thread, streamed frame reader, probe parse, duration fallbacks,
    nonzero-exit refusal) without ffmpeg: stub `ffprobe`/`ffmpeg`
    executables on PATH emit a deterministic gray stream. This is the
    sandbox-runnable e2e for the adapter — the capability-gated H.264
    test covers real codecs on hosts that have them."""
    import os
    import stat

    import pytest

    import flink_job_spark.functions.codec_adapters as ca

    w, h, nf = 8, 6, 5
    # frame f is constant value (10*f + 3) -> per-frame means are known
    # (octal escapes: POSIX sh printf has no \xHH, dash prints it literally)
    frames = "".join(f"\\{10 * f + 3:03o}" * (w * h) for f in range(nf))

    def script(path, body):
        path.write_text("#!/bin/sh\n" + body)
        path.chmod(path.stat().st_mode | stat.S_IEXEC)

    script(tmp_path / "ffprobe",
           f'cat > /dev/null\nprintf "{w},{h},10/1,N/A\\n"\n')
    script(tmp_path / "ffmpeg",
           f'cat > /dev/null\nprintf "{frames}"\n')

    monkeypatch.setenv("PATH", f"{tmp_path}:{os.environ['PATH']}")
    ca.ffmpeg_available.cache_clear()
    ca.ffprobe_available.cache_clear()
    try:
        assert ca.ffmpeg_available() and ca.ffprobe_available()
        gw, gh, gnf, dur, luma = ca.decode_video_ffmpeg(
            b"\x00\x00\x00\x18ftypisom payload", sample=(0, 500, 999))
        assert (gw, gh, gnf) == (w, h, nf)
        # duration: container N/A -> nf/fps fallback = 5 frames / 10 fps
        assert dur == 500
        # sampled indices {0, 2, 4} -> mean of constants 3, 23, 43
        assert luma == round((3 + 23 + 43) / 3, 6)

        # nonzero exit after partial frames must be an error, never
        # silently truncated stats
        script(tmp_path / "ffmpeg",
               f'cat > /dev/null\nprintf "{frames}"\nexit 3\n')
        with pytest.raises(ValueError, match="exit 3"):
            ca.decode_video_ffmpeg(b"\x00\x00\x00\x18ftypisom x")

        # garbage probe output must raise, not index-error
        script(tmp_path / "ffprobe", 'cat > /dev/null\nprintf "nope\\n"\n')
        with pytest.raises(Exception):
            ca.decode_video_ffmpeg(b"\x00\x00\x00\x18ftypisom x")
    finally:
        ca.ffmpeg_available.cache_clear()
        ca.ffprobe_available.cache_clear()
