"""FLAC / Ogg / WARC container tests (functions/flac_ogg.py, warc.py —
r5 wave 5). Builder→parser roundtrips across the lattice, real-world
degradations, bomb guards, and the byte-flip + truncation corruption
fuzz that holds the errors-as-data contract."""

from __future__ import annotations

import struct
import zlib

import pytest

from flink_job_spark.functions.flac_ogg import (AudioFormatError,
                                                build_flac, build_ogg,
                                                flac_meta, ogg_meta)
from flink_job_spark.functions.warc import (WarcFormatError, build_record,
                                            build_warc, warc_records,
                                            warc_stats)


# --------------------------------------------------------------------------
# FLAC
# --------------------------------------------------------------------------

@pytest.mark.parametrize("sr,ch,n,bps", [
    (44100, 2, 441000, 16), (48000, 1, 96000, 24), (96000, 8, 1, 32),
    (8000, 3, (1 << 36) - 1, 4),
])
def test_flac_roundtrip(sr, ch, n, bps):
    m = flac_meta(build_flac(sr, ch, n, bps))
    assert (m["sample_rate"], m["channels"], m["total_samples"],
            m["bits_per_sample"]) == (sr, ch, n, bps)
    assert m["duration_ms"] == n * 1000 // sr


def test_flac_streaminfo_after_other_blocks():
    """STREAMINFO found even when another metadata block precedes it
    (spec says it must be first; tolerate real-world reordering)."""
    si = build_flac(44100, 2, 1000)[4:]
    padding = bytes([0x01]) + struct.pack(">I", 3)[1:] + bytes(3)
    assert flac_meta(b"fLaC" + padding + si)["total_samples"] == 1000


def test_flac_errors():
    with pytest.raises(AudioFormatError):
        flac_meta(b"fLaC")                      # no blocks
    with pytest.raises(AudioFormatError):
        flac_meta(b"OggS" + bytes(40))          # wrong magic
    # last-flagged non-STREAMINFO block → "no STREAMINFO"
    blk = bytes([0x81]) + struct.pack(">I", 3)[1:] + bytes(3)
    with pytest.raises(AudioFormatError):
        flac_meta(b"fLaC" + blk)
    with pytest.raises(AudioFormatError):
        build_flac(0, 2, 100)                   # rate 0 out of range


# --------------------------------------------------------------------------
# Ogg
# --------------------------------------------------------------------------

def test_ogg_vorbis_roundtrip():
    m = ogg_meta(build_ogg("vorbis", 44100, 2, 88200))
    assert m == {"codec": "vorbis", "sample_rate": 44100, "channels": 2,
                 "duration_ms": 2000}


def test_ogg_opus_granule_clock():
    """Opus granules run at 48 kHz regardless of the input rate."""
    m = ogg_meta(build_ogg("opus", 16000, 1, 48000))
    assert m["codec"] == "opus" and m["sample_rate"] == 48000
    assert m["duration_ms"] == 1000


def test_ogg_second_stream_ignored():
    """Duration tracks the FIRST stream's serial; an interleaved second
    stream's granules don't leak in."""
    a = build_ogg("vorbis", 44100, 2, 44100, serial=1)
    b = build_ogg("vorbis", 44100, 2, 44100 * 60, serial=2)
    m = ogg_meta(a + b)
    assert m["duration_ms"] == 1000


def test_ogg_truncated_tail_degrades():
    data = build_ogg("vorbis", 44100, 2, 88200)
    # cut into the final page's body: the walk keeps the pages it saw,
    # so duration falls back to granule 0
    m = ogg_meta(data[:-8])
    assert m["codec"] == "vorbis" and m["duration_ms"] == 0


def test_ogg_errors():
    with pytest.raises(AudioFormatError):
        ogg_meta(b"RIFF" + bytes(40))
    with pytest.raises(AudioFormatError):
        ogg_meta(build_ogg("vorbis", 44100, 2, 1)[:20])   # no id header
    with pytest.raises(AudioFormatError):
        build_ogg("mp3", 44100, 2, 1)


# --------------------------------------------------------------------------
# WARC
# --------------------------------------------------------------------------

RECS = [("warcinfo", b"software: test", None),
        ("request", b"GET / HTTP/1.1", "http://ex.com/"),
        ("response", b"HTTP/1.1 200 OK\r\n\r\nhello", "http://ex.com/"),
        ("response", b"x" * 40, "http://ex.com/2")]


@pytest.mark.parametrize("gz", [False, True])
def test_warc_roundtrip(gz):
    s = warc_stats(build_warc(RECS, gzip_per_record=gz))
    assert s["n_records"] == 4 and s["n_response"] == 2
    assert s["n_request"] == 1 and s["n_warcinfo"] == 1
    assert s["uri"] == "http://ex.com/"
    assert s["payload_bytes"] == 14 + 14 + 24 + 40


def test_warc_records_headers_and_payloads():
    recs = list(warc_records(build_warc(RECS)))
    assert [h["warc-type"] for h, _ in recs] == ["warcinfo", "request",
                                                 "response", "response"]
    assert recs[2][1].endswith(b"hello")
    assert recs[1][0]["warc-target-uri"] == "http://ex.com/"
    assert recs[0][0]["__version__"] == "WARC/1.0"


def test_warc_binary_payload_with_crlf():
    """A payload containing CRLFCRLF must not split the record — only
    Content-Length delimits."""
    tricky = b"a\r\n\r\nb" * 3
    s = warc_stats(build_warc([("response", tricky, "http://t/")]))
    assert s["n_records"] == 1 and s["payload_bytes"] == len(tricky)


def test_warc_errors_and_bombs():
    with pytest.raises(WarcFormatError):
        warc_stats(b"")
    with pytest.raises(WarcFormatError):
        warc_stats(b"HTTP/1.1 200\r\n\r\n")            # not WARC
    # Content-Length overruns the file
    bad = build_record("response", b"abc", "http://t/").replace(
        b"Content-Length: 3", b"Content-Length: 9999")
    with pytest.raises(WarcFormatError):
        warc_stats(bad)
    with pytest.raises(WarcFormatError):
        warc_stats(b"\x1f\x8b\x00bad")                  # broken gzip
    # decompression bomb: a member that inflates past the 64 MiB cap
    co = zlib.compressobj(wbits=31)
    bomb = co.compress(b"\x00" * (1 << 27)) + co.flush()
    with pytest.raises(WarcFormatError):
        warc_stats(bomb)


@pytest.mark.parametrize("gz", [False, True])
def test_warc_corruption_stays_errors_as_data(gz):
    base = build_warc(RECS, gzip_per_record=gz)
    for pos in range(len(base)):
        b = bytearray(base)
        b[pos] ^= 0xFF
        try:
            warc_stats(bytes(b))
        except WarcFormatError:
            pass
    for cut in range(len(base)):
        try:
            warc_stats(base[:cut])
        except WarcFormatError:
            pass


def test_flac_ogg_corruption_stays_errors_as_data():
    for base in (build_flac(44100, 2, 441000),
                 build_ogg("vorbis", 44100, 2, 88200),
                 build_ogg("opus", 16000, 1, 48000)):
        for pos in range(len(base)):
            for delta in (0x01, 0x80, 0xFF):
                b = bytearray(base)
                b[pos] ^= delta
                for fn in (flac_meta, ogg_meta):
                    try:
                        fn(bytes(b))
                    except AudioFormatError:
                        pass
        for cut in range(len(base)):
            for fn in (flac_meta, ogg_meta):
                try:
                    fn(base[:cut])
                except AudioFormatError:
                    pass


# --------------------------------------------------------------------------
# ZIP / TAR (functions/archive.py)
# --------------------------------------------------------------------------

def test_zip_roundtrip_and_stdlib_cross():
    """Our ZIPs are REAL zips (stdlib zipfile reads them, byte-for-byte
    payload equality) and our walk reads stdlib-built zips."""
    import io
    import zipfile

    from flink_job_spark.functions.archive import build_zip, zip_stats

    members = [("a.txt", b"hello"), ("sub/b.bin", bytes(range(256))),
               ("c", b"")]
    for deflate in (False, True):
        z = build_zip(members, deflate=deflate)
        zf = zipfile.ZipFile(io.BytesIO(z))
        assert [i.filename for i in zf.infolist()] == [m[0] for m in members]
        for nm, pl in members:
            assert zf.read(nm) == pl
        s = zip_stats(z)
        assert s["n_entries"] == 3 and s["uncomp_bytes"] == 261
        assert (s["n_deflated"] if deflate else s["n_stored"]) == 3
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for nm, pl in members:
            zf.writestr(nm, pl)
    s = zip_stats(buf.getvalue())
    assert s["n_entries"] == 3 and s["uncomp_bytes"] == 261


def test_tar_roundtrip_and_stdlib_cross():
    import io
    import tarfile

    from flink_job_spark.functions.archive import build_tar, tar_stats

    members = [("a.txt", b"hello"), ("sub/b.bin", bytes(range(256))),
               ("c", b"")]
    t = build_tar(members)
    tf = tarfile.open(fileobj=io.BytesIO(t))
    assert [m.name for m in tf.getmembers()] == [m[0] for m in members]
    for nm, pl in members:
        f = tf.extractfile(nm)
        assert (f.read() if f else b"") == pl
    s = tar_stats(t)
    assert (s["n_members"], s["first_name"], s["member_bytes"]) \
        == (3, "a.txt", 261)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        for nm, pl in members:
            ti = tarfile.TarInfo(nm)
            ti.size = len(pl)
            tf.addfile(ti, io.BytesIO(pl))
    assert tar_stats(buf.getvalue())["member_bytes"] == 261


def test_zip_tar_corruption_stays_errors_as_data():
    from flink_job_spark.functions.archive import (ArchiveFormatError,
                                                   build_tar, build_zip,
                                                   tar_stats, zip_stats)

    members = [("a.txt", b"hello"), ("b.bin", bytes(64))]
    for base in (build_zip(members), build_zip(members, True),
                 build_tar(members)):
        for pos in range(len(base)):
            for delta in (0x01, 0xFF):
                b = bytearray(base)
                b[pos] ^= delta
                for fn in (zip_stats, tar_stats):
                    try:
                        fn(bytes(b))
                    except ArchiveFormatError:
                        pass
        for cut in range(len(base)):
            for fn in (zip_stats, tar_stats):
                try:
                    fn(base[:cut])
                except ArchiveFormatError:
                    pass


def test_zip_tar_guards():
    import struct

    from flink_job_spark.functions.archive import (ArchiveFormatError,
                                                   tar_stats, zip_stats)

    with pytest.raises(ArchiveFormatError):
        zip_stats(b"not a zip at all")
    # EOCD claiming a CD beyond the file
    eocd = b"PK\x05\x06" + bytes(4) + struct.pack("<HHIIH", 1, 1, 100,
                                                  9999, 0)
    with pytest.raises(ArchiveFormatError):
        zip_stats(eocd)
    with pytest.raises(ArchiveFormatError):
        tar_stats(bytes(1024))                 # zero blocks only
    with pytest.raises(ArchiveFormatError):
        tar_stats(b"x" * 512)                  # no ustar magic


# ---- G.711 companded WAV (round-5 wave-11) ----

def test_g711_tables_match_itu_reference_points():
    """Spot-check the expansion tables against published G.711 anchor
    values plus structural properties: full 16-bit-ish range, odd symmetry
    between sign halves, monotone magnitude within a segment."""
    from flink_job_spark.functions.g711 import ALAW2LIN, ULAW2LIN

    assert len(ULAW2LIN) == len(ALAW2LIN) == 256
    assert max(ULAW2LIN) == 32124 and min(ULAW2LIN) == -32124
    assert max(ALAW2LIN) == 32256 and min(ALAW2LIN) == -32256
    # mu-law: 0xFF encodes +0 magnitude -> 0; 0x7F encodes -0 -> 0
    assert ULAW2LIN[0xFF] == 0 and ULAW2LIN[0x7F] == 0
    # sign symmetry: clearing the sign bit negates (mu-law stores ~value)
    for b in range(128):
        assert ULAW2LIN[b] == -ULAW2LIN[b | 0x80]
        assert ALAW2LIN[b] == -ALAW2LIN[b | 0x80]


def test_g711_wav_roundtrip_and_stdlib_wave_rejects_it():
    """Our encoder's file decodes through decode_g711 to the exact table
    values, and stdlib wave really does refuse it (the gap this closes)."""
    import io
    import wave

    import pytest

    from flink_job_spark.functions.g711 import (ALAW2LIN, ULAW2LIN,
                                                decode_g711, encode_g711_wav)

    body = bytes(range(256))
    for mulaw, table in [(True, ULAW2LIN), (False, ALAW2LIN)]:
        blob = encode_g711_wav(8000, 1, body, mulaw=mulaw)
        sr, ch, nf, samples = decode_g711(blob)
        assert (sr, ch, nf) == (8000, 1, 256)
        assert samples == [table[b] for b in body]
        with pytest.raises(wave.Error):
            wave.open(io.BytesIO(blob))


def test_g711_malformed_stays_format_error():
    """Truncations and non-G.711 tags raise G711FormatError only — the
    operator's errors-as-data contract."""
    import pytest

    from flink_job_spark.functions.g711 import (G711FormatError, decode_g711,
                                                encode_g711_wav)

    good = encode_g711_wav(8000, 1, bytes(64), mulaw=True)
    for cut in (0, 4, 11, 13, 20, 30, len(good) - 1):
        try:
            decode_g711(good[:cut])
        except G711FormatError:
            pass  # expected shape
    with pytest.raises(G711FormatError, match="not a G.711"):
        # PCM fmt tag (1) must NOT route through the companded tables
        import struct
        pcm = good.replace(struct.pack("<HH", 7, 1), struct.pack("<HH", 1, 1), 1)
        decode_g711(pcm)


def test_g711_through_audio_operator(spark):
    """A mu-law WAV through decode_audio_meta yields rate/frames/RMS —
    no decode_error — and a corrupted one stays errors-as-data."""
    from flink_job_spark.functions.g711 import encode_g711_wav
    from flink_job_spark.operators.multimodal import decode_audio_meta

    blob = encode_g711_wav(8000, 1, bytes((j * 11) % 256 for j in range(320)))
    df = spark.createDataFrame(
        [(1, bytearray(blob)), (2, bytearray(blob[:30]))],
        "media_id long, payload binary")
    rows = {r["media_id"]: r for r in decode_audio_meta(
        df.selectExpr("media_id", "'audio' kind", "'audio/wav' mime",
                      "payload")).collect()}
    ok = rows[1]
    assert ok["decode_error"] is None
    assert (ok["sample_rate"], ok["channels"], ok["n_frames"]) == (8000, 1, 320)
    assert ok["rms"] is not None and ok["rms"] > 0
    assert rows[2]["decode_error"] is not None


def test_http_response_meta_parses_status_ctype_charset():
    """r8: RFC 9112 response grammar — case-folded media type, quoted
    charset, first-wins repeated headers, Location passthrough."""
    import pytest

    from flink_job_spark.functions.warc import (WarcFormatError,
                                                build_http_response,
                                                http_response_meta)

    m = http_response_meta(build_http_response(
        200, "OK", [("Content-Type", 'Text/HTML; Charset="UTF-8"'),
                    ("Content-Length", "5"),
                    ("content-length", "999")], b"hello"))
    assert m["status"] == 200 and m["reason"] == "OK"
    assert m["media_type"] == "text/html" and m["charset"] == "utf-8"
    assert m["content_length"] == 5 and m["body"] == b"hello"

    m = http_response_meta(build_http_response(
        302, "Found", [("Location", "http://x/y")], b""))
    assert m["location"] == "http://x/y" and m["media_type"] is None
    assert m["content_length"] is None

    for bad in (b"not http at all", b"HTTP/1.1 abc OK\r\n\r\n",
                b"HTTP/1.1 999 ?\r\n\r\n",
                b"HTTP/1.1 200 OK\r\nbadline\r\n\r\n",
                b"HTTP/1.1 200 OK\r\nContent-Length: x\r\n\r\n",
                b"HTTP/1.1 200 OK\r\nContent-Length: -1\r\n\r\n",
                b"HTTP/1.1 200 OK\r\nnever-terminated: 1"):
        with pytest.raises(WarcFormatError):
            http_response_meta(bad)


def test_warc_http_chain_follows_redirects():
    """Chain walk: leading 3xx+Location responses count as hops, the
    first non-redirect is final, request/warcinfo records are ignored,
    trailing re-crawl responses too."""
    import pytest

    from flink_job_spark.functions.warc import (WarcFormatError,
                                                build_http_response,
                                                build_warc, warc_http_chain)

    recs = [
        ("warcinfo", b"software: t", None),
        ("request", b"GET / HTTP/1.1\r\n\r\n", "http://a/"),
        ("response", build_http_response(
            301, "Moved", [("Location", "http://a/1")], b""), "http://a/"),
        ("response", build_http_response(
            302, "Found", [("Location", "http://a/2")], b""), "http://a/1"),
        ("response", build_http_response(
            404, "NF", [("Content-Type", "text/plain; charset=us-ascii"),
                        ("Content-Length", "3")], b"nope"), "http://a/2"),
        ("response", build_http_response(200, "OK", [], b""), "http://a/"),
    ]
    for gz in (False, True):
        m = warc_http_chain(build_warc(recs, gzip_per_record=gz))
        assert m["n_hops"] == 2 and m["first_status"] == 301
        assert m["redirect_to"] == "http://a/1"
        assert m["final_status"] == 404
        assert m["media_type"] == "text/plain"
        assert m["charset"] == "us-ascii" and m["content_length"] == 3

    # no-redirect file: 0 hops, first == final
    m = warc_http_chain(build_warc([("response", build_http_response(
        200, "OK", [("Content-Type", "application/pdf")], b"%"), "u")]))
    assert (m["n_hops"], m["first_status"], m["final_status"],
            m["redirect_to"]) == (0, 200, 200, None)

    # a 3xx WITHOUT Location is a final response, not a hop
    m = warc_http_chain(build_warc([("response", build_http_response(
        304, "NM", [], b""), "u")]))
    assert (m["n_hops"], m["final_status"]) == (0, 304)

    with pytest.raises(WarcFormatError, match="no response"):
        warc_http_chain(build_warc([("request", b"GET /", "u")]))
    with pytest.raises(WarcFormatError, match="without a final"):
        warc_http_chain(build_warc([("response", build_http_response(
            301, "M", [("Location", "http://a/1")], b""), "u")]))


def test_warc_http_chain_corruption_stays_errors_as_data():
    """Byte-flip/truncation totality over a chain fixture — every
    failure is WarcFormatError, never a bare ValueError escape."""
    import random

    from flink_job_spark.functions.warc import (WarcFormatError,
                                                build_http_response,
                                                build_warc, warc_http_chain)

    blob = build_warc([
        ("response", build_http_response(
            301, "M", [("Location", "http://a/1")], b""), "u"),
        ("response", build_http_response(
            200, "OK", [("Content-Type", "text/html; charset=utf-8"),
                        ("Content-Length", "4")], b"body"), "u"),
    ], gzip_per_record=True)
    rnd = random.Random(11)
    for cut in range(1, len(blob), 7):
        try:
            warc_http_chain(blob[:cut])
        except WarcFormatError:
            pass
    for i in range(0, len(blob), 5):
        bad = blob[:i] + bytes([blob[i] ^ rnd.randrange(1, 256)]) \
            + blob[i + 1:]
        try:
            warc_http_chain(bad)
        except WarcFormatError:
            pass
