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
    assert "imaging library" in by_id[4]["decode_error"]  # stub surfaces as data
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
    assert got[3]["decode_error"] == "not a decodable audio payload"


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
