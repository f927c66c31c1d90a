"""MP3 frame-walk + MP4 box-walk tests (functions/mp3.py, mp4.py — r5
wave 4).

Same coverage model as the codec suites: builder→parser roundtrip across
the parameter lattice, real-world degradations (truncated tail, leading
junk, VBR, ID3v1-vs-v2 precedence), bomb guards, and the byte-flip +
truncation corruption fuzz that holds the errors-as-data contract.
"""

from __future__ import annotations

import struct

import pytest

from flink_job_spark.functions.mp3 import (Mp3FormatError, build_frame,
                                           build_id3v2, mp3_meta,
                                           parse_id3v1, parse_id3v2)
from flink_job_spark.functions.mp4 import (Mp4FormatError, build_mp4,
                                           mp4_meta)


# --------------------------------------------------------------------------
# MP3
# --------------------------------------------------------------------------

@pytest.mark.parametrize("sr", [44100, 48000, 32000])
@pytest.mark.parametrize("kbps", [128, 320])
@pytest.mark.parametrize("ch", [1, 2])
def test_mp3_roundtrip_lattice(sr, kbps, ch):
    data = build_id3v2(title="t", artist="a") + build_frame(kbps, sr, ch) * 7
    m = mp3_meta(data)
    assert (m["sample_rate"], m["bitrate_kbps"], m["channels"],
            m["n_frames"]) == (sr, kbps, ch, 7)
    assert m["duration_ms"] == 7 * 1152 * 1_000_000 // sr // 1000
    assert m["title"] == "t" and m["artist"] == "a" and not m["vbr"]


def test_mp3_mpeg2_layer3_halves_samples():
    m = mp3_meta(build_frame(64, 22050, version=2) * 3)
    assert m["sample_rate"] == 22050
    assert m["duration_ms"] == 3 * 576 * 1_000_000 // 22050 // 1000


def test_mp3_vbr_detection_reads_every_header():
    data = (build_frame(128, 44100) + build_frame(192, 44100)
            + build_frame(128, 44100))
    m = mp3_meta(data)
    assert m["vbr"] is True and m["n_frames"] == 3
    assert m["bitrate_kbps"] == 128          # first frame's


def test_mp3_id3v1_trailer_and_precedence():
    v1 = (b"TAG" + b"old title".ljust(30, b"\x00")
          + b"old artist".ljust(30, b"\x00") + b"alb".ljust(30, b"\x00")
          + b"2026" + bytes(31))
    # v1 only
    m = mp3_meta(build_frame(128, 44100) * 2 + v1)
    assert m["title"] == "old title" and m["n_frames"] == 2
    assert parse_id3v1(build_frame(128, 44100)) == {}
    # v2 wins over v1
    m = mp3_meta(build_id3v2(title="new") + build_frame(128, 44100) + v1)
    assert m["title"] == "new" and m["artist"] == "old artist"


def test_mp3_real_world_degradations():
    # leading junk before the first sync: bounded resync
    m = mp3_meta(b"\x00junkjunk" + build_frame(128, 44100) * 2)
    assert m["n_frames"] == 2
    # truncated final frame: the frames seen, no error
    f = build_frame(128, 44100)
    m = mp3_meta(f * 3 + f[: len(f) // 2])
    assert m["n_frames"] == 3
    # nothing decodable
    with pytest.raises(Mp3FormatError):
        mp3_meta(b"\x00" * 64)
    # a samplerate CHANGE mid-stream ends the walk (two concatenated
    # streams are not one file)
    m = mp3_meta(build_frame(128, 44100) * 2 + build_frame(128, 48000))
    assert m["n_frames"] == 2


def test_mp3_id3v2_utf16_and_v4_syncsafe():
    # utf-16 text frame (encoding byte 1, BOM)
    body = b"\x01" + "titré".encode("utf-16")
    frames = b"TIT2" + struct.pack(">I", len(body)) + b"\x00\x00" + body
    ss = bytes(((len(frames) >> s) & 0x7F) for s in (21, 14, 7, 0))
    tag = b"ID3\x03\x00\x00" + ss + frames
    assert parse_id3v2(tag)[0]["title"] == "titré"
    # v2.4: frame size is syncsafe
    body = b"\x03" + "utf8✓".encode("utf-8")
    fsz = bytes(((len(body) >> s) & 0x7F) for s in (21, 14, 7, 0))
    frames = b"TIT2" + fsz + b"\x00\x00" + body
    ss = bytes(((len(frames) >> s) & 0x7F) for s in (21, 14, 7, 0))
    tag = b"ID3\x04\x00\x00" + ss + frames
    assert parse_id3v2(tag)[0]["title"] == "utf8✓"


def test_mp3_corruption_stays_errors_as_data():
    base = build_id3v2(title="x") + build_frame(128, 44100) * 3
    for pos in range(len(base)):
        for delta in (0x01, 0x80, 0xFF):
            b = bytearray(base)
            b[pos] ^= delta
            try:
                mp3_meta(bytes(b))
            except Mp3FormatError:
                pass
    for cut in range(len(base)):
        try:
            mp3_meta(base[:cut])
        except Mp3FormatError:
            pass


# --------------------------------------------------------------------------
# MP4
# --------------------------------------------------------------------------

@pytest.mark.parametrize("mvhd_v1", [False, True])
def test_mp4_roundtrip_both_mvhd_versions(mvhd_v1):
    d = build_mp4("mp42", timescale=3000, duration_units=4567,
                  video_dims=(640, 360), audio=True, mvhd_v1=mvhd_v1)
    m = mp4_meta(d)
    assert m["brand"] == "mp42"
    assert m["duration_ms"] == 4567 * 1000 // 3000
    assert (m["vid_w"], m["vid_h"]) == (640, 360)
    assert m["has_audio"] and m["has_video"] and m["n_tracks"] == 2


def test_mp4_audio_only_and_trackless():
    m = mp4_meta(build_mp4(audio=True, timescale=1000, duration_units=10))
    assert m["vid_w"] is None and m["has_audio"] and not m["has_video"]
    assert m["n_tracks"] == 1
    m = mp4_meta(build_mp4(timescale=1000, duration_units=10))
    assert m["n_tracks"] == 0 and m["duration_ms"] == 10


def test_mp4_largesize_and_size0_boxes():
    """size==1 → u64 largesize; size==0 → to end of container."""
    d = build_mp4("isom", 1000, 250, (32, 16))
    # wrap the whole file behind a largesize free box
    free = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16)
    m = mp4_meta(free + d)
    assert m["duration_ms"] == 250
    # final box with size 0
    m = mp4_meta(d + struct.pack(">I", 0) + b"free" + bytes(4))
    assert m["duration_ms"] == 250


def test_mp4_guards():
    with pytest.raises(Mp4FormatError):
        mp4_meta(b"\x00\x00\x00\x08free")        # no mvhd
    with pytest.raises(Mp4FormatError):
        mp4_meta(b"\x00\x00")                    # too short
    # depth bomb: 40 nested moov boxes
    inner = struct.pack(">I", 8) + b"free"
    for _ in range(40):
        inner = struct.pack(">I", 8 + len(inner)) + b"moov" + inner
    with pytest.raises(Mp4FormatError):
        mp4_meta(inner)
    # timescale 0
    bad = build_mp4(timescale=1, duration_units=1).replace(
        struct.pack(">II", 1, 1), struct.pack(">II", 0, 1))
    with pytest.raises(Mp4FormatError):
        mp4_meta(bad)


def test_mp4_corruption_stays_errors_as_data():
    base = build_mp4("mp42", 3000, 4567, (640, 360), audio=True)
    for pos in range(len(base)):
        for delta in (0x01, 0x80, 0xFF):
            b = bytearray(base)
            b[pos] ^= delta
            try:
                mp4_meta(bytes(b))
            except Mp4FormatError:
                pass
    for cut in range(len(base)):
        try:
            mp4_meta(base[:cut])
        except Mp4FormatError:
            pass


# --------------------------------------------------------------------------
# operator integration: decode_audio_meta routes MP3 natively
# --------------------------------------------------------------------------

def test_decode_audio_meta_mp3_branch(spark):
    import pandas as pd

    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      decode_audio_meta)

    good = build_id3v2(title="t") + build_frame(128, 44100, 2) * 5
    bad = b"ID3" + bytes(40)                     # truncated ID3, no frames
    pdf = pd.DataFrame({"media_id": [1, 2], "kind": ["audio"] * 2,
                        "mime": ["audio/mpeg"] * 2,
                        "payload": [good, bad]})
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    rows = {r["media_id"]: r for r in decode_audio_meta(media).collect()}
    assert rows[1]["sample_rate"] == 44100 and rows[1]["channels"] == 2
    assert rows[1]["n_frames"] == 5
    assert rows[1]["duration_ms"] == float(5 * 1152 * 1_000_000
                                           // 44100 // 1000)
    assert rows[1]["decode_error"] is None
    assert rows[2]["sample_rate"] is None
    assert rows[2]["decode_error"].startswith("bad mp3:")


def test_mp4_mvhd_v1_truncation_guard():
    """Review-caught (r5): the v1 guard checked body+28 but the unpack
    reads [body+20, body+32) — a 28-byte v1 mvhd body at end-of-file let
    struct.error escape the errors-as-data contract."""
    bad = struct.pack(">I", 44) + b"moov" \
        + struct.pack(">I", 36) + b"mvhd" + b"\x01" + bytes(27)
    with pytest.raises(Mp4FormatError):
        mp4_meta(bad)


def test_mp3_sniff_rejects_adts_aac():
    """Review-caught (r5): a bare 0xFF-0xEx sniff also matched ADTS AAC
    (0xFF 0xF1 — layer bits 00); the sniffer requires a fully valid MPEG
    frame header so AAC keeps routing to the generic adapter."""
    from flink_job_spark.functions.mp3 import sniff_mp3

    assert not sniff_mp3(b"\xff\xf1\x50\x80")      # ADTS AAC
    assert not sniff_mp3(b"\xff\xe0\x00\x00")      # reserved version/layer
    assert sniff_mp3(build_frame(128, 44100)[:4])  # real MPEG header
    assert sniff_mp3(b"ID3\x03\x00")


def test_decode_audio_meta_adts_not_misrouted(spark):
    """An ADTS-AAC-shaped payload must reach the adapter branch (here:
    the library-boundary row), not a bogus 'bad mp3' verdict."""
    import pandas as pd

    from flink_job_spark.functions.codec_adapters import ffmpeg_available
    from flink_job_spark.operators.multimodal import (MEDIA_SCHEMA,
                                                      decode_audio_meta)

    if ffmpeg_available():
        pytest.skip("host has ffmpeg; adapter will really decode")
    adts = b"\xff\xf1\x50\x80" + bytes(64)
    pdf = pd.DataFrame({"media_id": [1], "kind": ["audio"],
                        "mime": ["audio/aac"], "payload": [adts]})
    media = spark.createDataFrame(pdf, schema=MEDIA_SCHEMA)
    row = decode_audio_meta(media).collect()[0]
    assert row["decode_error"] == "not a decodable audio payload"


# ---- SVG triage (round-5 wave-11) ----

def test_svg_meta_dimensions_and_census():
    """px/pt/viewBox dimension resolution (pt at the exact 4/3 CSS ratio),
    namespaced and bare markup, censuses, and the active-content flag."""
    from flink_job_spark.functions.svg import svg_meta

    m = svg_meta(b'<svg width="120px" height="90pt" viewBox="0 0 5 6">'
                 b'<path d="M0 0"/><rect/><text>x</text></svg>')
    assert (m["width_px"], m["height_px"]) == (120, 120)
    assert (m["n_paths"], m["n_shapes"], m["n_text"]) == (1, 1, 1)
    assert m["has_script"] is False
    # viewBox fallback when width/height absent or percentages
    m = svg_meta(b'<svg xmlns="http://www.w3.org/2000/svg" width="100%" '
                 b'viewBox="0 0 640 480"><script>x</script></svg>')
    assert (m["width_px"], m["height_px"]) == (640, 480)
    assert m["has_script"] is True
    # nested shapes inside groups still count (root.iter is recursive)
    m = svg_meta(b'<svg viewBox="0,0,10,20"><g><g><circle r="1"/>'
                 b'<polyline points="0,0 1,1"/></g></g></svg>')
    assert m["n_shapes"] == 2 and (m["width_px"], m["height_px"]) == (10, 20)


def test_svg_meta_rejects_bombs_and_soup():
    import pytest

    from flink_job_spark.functions.svg import SvgFormatError, svg_meta

    with pytest.raises(SvgFormatError, match="DTD"):
        svg_meta(b'<!DOCTYPE svg [<!ENTITY a "bbbb">]><svg>&a;</svg>')
    with pytest.raises(SvgFormatError, match="bad XML"):
        svg_meta(b'<svg><unclosed></svg>')
    with pytest.raises(SvgFormatError, match="root element"):
        svg_meta(b'<html></html>')
    with pytest.raises(SvgFormatError, match="exceeds"):
        svg_meta(b'<svg>' + b' ' * (9 * 1024 * 1024) + b'</svg>')


# ---- SRT / WebVTT subtitles (round-5 wave-11) ----

def test_subtitle_parsers_grammar_corners():
    """Hostile-but-real inputs: SRT renumbering and BOM, VTT header
    metadata / NOTE blocks / cue identifiers / cue settings / the hourless
    MM:SS.mmm short form; malformed timing stays SubtitleFormatError."""
    import pytest

    from flink_job_spark.functions.subtitles import (SubtitleFormatError,
                                                     parse_srt, parse_vtt)

    srt = ("﻿1\n00:00:01,000 --> 00:00:03,500\nHello there\nsecond\n\n"
           "1\n00:00:04,000 --> 00:00:05,000\nBye\n").encode()
    assert parse_srt(srt) == [(1000, 3500, "Hello there second"),
                              (4000, 5000, "Bye")]

    vtt = (b"WEBVTT\nKind: captions\n\nNOTE a comment\nmore comment\n\n"
           b"intro\n00:00:01.000 --> 00:00:03.500 align:start\n"
           b"Hello <b>there</b>\n\n00:10.250 --> 00:12.000\nShort form\n")
    assert parse_vtt(vtt) == [(1000, 3500, "Hello <b>there</b>"),
                              (10250, 12000, "Short form")]

    with pytest.raises(SubtitleFormatError, match="WEBVTT"):
        parse_vtt(b"1\n00:00:01.000 --> 00:00:02.000\nx\n")
    with pytest.raises(SubtitleFormatError, match="timestamp"):
        parse_srt(b"1\n00:99:00,000 --> 00:00:01,000\nx\n")
    with pytest.raises(SubtitleFormatError, match="ends before"):
        parse_srt(b"1\n00:00:05,000 --> 00:00:01,000\nx\n")
    with pytest.raises(SubtitleFormatError, match="timing"):
        parse_srt(b"1\nnot a timing line\ntext\n")

    # WebVTT's grammar allows 2-OR-MORE hour digits: a >99-hour recording
    # (live-stream archives hit this) must parse, not become an error row
    long_vtt = (b"WEBVTT\n\n100:00:00.000 --> 100:00:01.500\nstill going\n")
    assert parse_vtt(long_vtt) == [(360000000, 360001500, "still going")]
    long_srt = b"1\n123:00:00,000 --> 123:00:02,000\nmarathon\n"
    assert parse_srt(long_srt) == [(442800000, 442802000, "marathon")]


def test_xml_dtd_guard_not_bypassable_by_leading_comments():
    """The review-caught r5 bypass: a DOCTYPE after 4 KB of comments used
    to slip past the head-limited scan and expat WOULD expand its
    entities; both XML triage parsers now scan the whole payload."""
    import pytest

    from flink_job_spark.functions.sitemap import (SitemapFormatError,
                                                   parse_sitemap)
    from flink_job_spark.functions.svg import SvgFormatError, svg_meta

    pad = ("<!-- " + "x" * 5000 + " -->").encode()
    bomb = pad + b'<!DOCTYPE svg [<!ENTITY a "bbbb">]><svg>&a;</svg>'
    with pytest.raises(SvgFormatError, match="DTD"):
        svg_meta(bomb)
    smap = pad + (b'<!DOCTYPE urlset [<!ENTITY a "bbbb">]>'
                  b'<urlset><url><loc>http://x/&a;</loc></url></urlset>')
    with pytest.raises(SitemapFormatError, match="DTD"):
        parse_sitemap(smap)


# --- MKV / WebM EBML walk (functions/mkv.py — r7) ----------------------------


def test_mkv_roundtrip_full_inventory():
    from flink_job_spark.functions.mkv import build_mkv, mkv_meta

    b = build_mkv("webm", 1_000_000, 5000.0,
                  video=(1920, 1080, "V_VP9"), audio=(48000, 2, "A_OPUS"),
                  cluster_bytes=500)
    m = mkv_meta(b)
    assert m["doc_type"] == "webm"
    assert m["duration_ms"] == 5000
    assert m["n_tracks"] == 2
    assert (m["vid_w"], m["vid_h"], m["video_codec"]) == (1920, 1080,
                                                          "V_VP9")
    assert (m["audio_hz"], m["audio_channels"]) == (48000.0, 2)
    assert m["has_audio"] and m["has_video"]


def test_mkv_unknown_segment_size_and_float32():
    """Live-muxed layout: Segment size is the all-ones VINT (extends to
    EOF); 4-byte float durations parse; non-default TimestampScale
    scales the integer duration exactly."""
    from flink_job_spark.functions.mkv import build_mkv, mkv_meta

    b = build_mkv("matroska", 2_000_000, 1234.0,
                  video=(640, 360, "V_AV1"), float32_duration=True,
                  unknown_segment_size=True, cluster_bytes=64)
    m = mkv_meta(b)
    assert m["duration_ms"] == 2468
    assert m["video_codec"] == "V_AV1"
    assert m["n_tracks"] == 1 and not m["has_audio"]


def test_mkv_minimal_and_rejections():
    import pytest

    from flink_job_spark.functions.mkv import (MkvFormatError, build_mkv,
                                               mkv_meta)

    m = mkv_meta(build_mkv("matroska"))
    assert m["duration_ms"] is None and m["n_tracks"] == 0

    with pytest.raises(MkvFormatError, match="EBML"):
        mkv_meta(b"not an ebml file")
    # unknown size on a non-Segment element is a structure error
    b = bytearray(build_mkv("webm", duration_units=10.0))
    i = b.find(bytes.fromhex("1549A966"))         # Info element
    b[i + 4] = 0xFF                               # its size -> unknown
    with pytest.raises(MkvFormatError, match="unknown size"):
        mkv_meta(bytes(b))


def test_mkv_depth_bomb_guard():
    """Deep nesting of recursive elements trips the depth cap before
    any quadratic walk."""
    import pytest

    from flink_job_spark.functions.mkv import (MkvFormatError, _el,
                                               mkv_meta)

    inner = b""
    for _ in range(40):                           # Video inside Video...
        inner = _el(0xE0, inner)
    blob = (_el(0x1A45DFA3, _el(0x4282, b"matroska"))
            + _el(0x18538067, _el(0x1654AE6B, _el(0xAE, inner))))
    with pytest.raises(MkvFormatError, match="depth"):
        mkv_meta(blob)


def test_mkv_fuzz_stays_format_error():
    """Truncation/byte-flip totality over EBML: MkvFormatError or a
    parse, never a foreign exception."""
    import random

    from flink_job_spark.functions.mkv import (MkvFormatError, build_mkv,
                                               mkv_meta)

    rnd = random.Random(11)
    blob = build_mkv("webm", 3_000_000, 777.0, video=(320, 240, "V_VP8"),
                     audio=(44100, 1, "A_VORBIS"), cluster_bytes=33)
    for cut in range(1, len(blob)):
        try:
            mkv_meta(blob[:cut])
        except MkvFormatError:
            pass
    for i in range(len(blob)):
        bad = blob[:i] + bytes([blob[i] ^ rnd.randrange(1, 256)]) + blob[i + 1:]
        try:
            mkv_meta(bad)
        except MkvFormatError:
            pass


def test_mkv_unknown_cluster_size_resyncs_to_siblings():
    """r8 (ADVICE r7): a live-muxed unknown-size Cluster ends at the
    next valid sibling id (RFC 8794 §6.2), so Tracks placed AFTER it
    still parse instead of being swallowed to end-of-scope."""
    from flink_job_spark.functions.mkv import build_mkv, mkv_meta

    b = build_mkv("matroska", 1_000_000, 2500.0,
                  video=(320, 240, "V_VP9"), audio=(48000, 2, "A_OPUS"),
                  cluster_bytes=64, unknown_cluster_size=True,
                  cluster_before_tracks=True, unknown_segment_size=True)
    m = mkv_meta(b)
    assert m["n_tracks"] == 2
    assert (m["vid_w"], m["vid_h"], m["video_codec"]) == (320, 240, "V_VP9")
    assert (m["audio_hz"], m["audio_channels"]) == (48000.0, 2)
    assert m["duration_ms"] == 2500

    # sized clusters and trailing unknown-size clusters keep working
    m2 = mkv_meta(build_mkv("webm", duration_units=10.0,
                            video=(64, 48, "V_VP8"), cluster_bytes=32,
                            unknown_cluster_size=True))
    assert m2["n_tracks"] == 1 and m2["vid_w"] == 64


def test_mkv_cluster_resync_rejects_decoy_id_pattern():
    """ADVICE r9: the unknown-size Cluster resync scans raw bytes for
    top-level element ids; a Block payload that happens to contain the
    Cluster id bytes must NOT truncate the Cluster — a candidate is
    accepted only when a well-formed VINT size follows it and the
    implied element fits the scope."""
    from flink_job_spark.functions.mkv import (_CLUSTER, _EBML_HEADER,
                                               _DOCTYPE, _el, _el_uint,
                                               _id_bytes, mkv_meta)

    header = _el(_EBML_HEADER,
                 _el_uint(0x4286, 1) + _el_uint(0x42F7, 1)
                 + _el(_DOCTYPE, b"matroska") + _el_uint(0x4287, 4))
    # decoy: the Cluster id byte pattern inside the (opaque) cluster
    # body, followed by 0x00 — not a valid VINT size lead byte, so the
    # resync must skip it and use the REAL Tracks sibling instead
    decoy = _id_bytes(_CLUSTER) + b"\x00" + bytes(8)
    cbody = _el_uint(0xE7, 0) + decoy + bytes(16)
    cluster = _id_bytes(_CLUSTER) + b"\xff" + cbody   # unknown size
    video = _el(0xAE, _el_uint(0x83, 1) + _el(0x86, b"V_VP9")
                + _el(0xE0, _el_uint(0xB0, 320) + _el_uint(0xBA, 240)))
    tracks = _el(0x1654AE6B, video)
    info = _el(0x1549A966, _el_uint(0x2AD7B1, 1_000_000))
    seg = _el(0x18538067, info + cluster + tracks)
    m = mkv_meta(header + seg)
    # before the fix the decoy truncated the Cluster and the walker
    # choked on (or swallowed) the trailing Tracks; now the video track
    # after the live-muxed Cluster is inventoried
    assert m["has_video"] is True
    assert (m["vid_w"], m["vid_h"]) == (320, 240)
    assert m["video_codec"] == "V_VP9"
