"""MP3 (MPEG-1/2/2.5 audio) frame-header walk + ID3v1/ID3v2 tags.

What a 100 TB audio-crawl triage pass actually needs from an .mp3 is NOT
the PCM — it's the container metadata: duration, sample rate, channel
layout, bitrate/VBR-ness, and the ID3 title/artist strings that feed
text-side dedup and filtering. All of that lives in fixed struct layouts
(ISO 11172-3 frame headers + id3.org tag specs) and needs no Huffman or
IMDCT, so this module parses it natively with struct/int math only; the
PCM decode itself remains the documented ffmpeg-adapter boundary
(functions/codec_adapters.py), exactly as real pipelines split the work.

Layout facts encoded here (ISO/IEC 11172-3 §2.4.1 + the MPEG-2/2.5
extensions): 11-bit frame sync, version/layer/bitrate/samplerate index
tables, padding; Layer III frame length floor(144000*kbps/sr)+pad
(MPEG-1) / floor(72000*kbps/sr)+pad (MPEG-2/2.5), 1152/576 samples per
frame. ID3v2.3/2.4 header with syncsafe sizes and TIT2/TPE1/TALB text
frames; ID3v1 as the trailing 128-byte "TAG" block.

Contract: same errors-as-data shape as the image codecs — malformed
structure raises Mp3FormatError (callers in operators/multimodal.py turn
it into a ``decode_error`` row), the frame walk is bomb-guarded (frame
count cap, leading-junk resync bounded), and a truncated tail after at
least one good frame degrades to the frames seen, like every real reader.

Reference parity: extends the reference's per-row skip-never-crash
ingestion contract (mis_initial_job FirebirdToIcebergJob mis:530-586) to
the compressed-audio metadata surface.
"""

from __future__ import annotations

import struct


class Mp3FormatError(ValueError):
    """Malformed MPEG-audio/ID3 structure — callers turn this into a
    decode_error row, never a task failure."""


# bitrate (kbps) tables, index 1..14; 0 = "free" (unsupported), 15 = bad.
# keyed by (version_group, layer): version_group "1" = MPEG-1,
# "2" = MPEG-2/2.5 (identical tables for the two low versions).
_BITRATES = {
    ("1", 1): (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384,
               416, 448),
    ("1", 2): (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
               320, 384),
    ("1", 3): (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
               256, 320),
    ("2", 1): (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192,
               224, 256),
    ("2", 2): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    ("2", 3): (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
}
# samplerate (Hz) by version bits (00=MPEG2.5, 10=MPEG2, 11=MPEG1), idx 0..2
_SAMPLERATES = {3: (44100, 48000, 32000),        # MPEG-1
                2: (22050, 24000, 16000),        # MPEG-2
                0: (11025, 12000, 8000)}         # MPEG-2.5

_MAX_FRAMES = 1 << 22          # ~4M frames ≈ 29h at 26 ms/frame: bomb guard
_MAX_LEADING_JUNK = 1 << 16    # resync scan bound before the first frame

_ID3_TEXT_FRAMES = {b"TIT2": "title", b"TPE1": "artist", b"TALB": "album"}


def _syncsafe(b: bytes) -> int:
    if any(x & 0x80 for x in b):
        raise Mp3FormatError("bad syncsafe integer")
    return (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]


def _decode_text(raw: bytes) -> str:
    """ID3v2 text frame: leading encoding byte, then the string."""
    if not raw:
        return ""
    enc, body = raw[0], raw[1:]
    try:
        if enc == 0:
            s = body.decode("latin-1")
        elif enc == 1:
            s = body.decode("utf-16")          # BOM-led
        elif enc == 2:
            s = body.decode("utf-16-be")
        elif enc == 3:
            s = body.decode("utf-8")
        else:
            raise Mp3FormatError(f"bad ID3 text encoding {enc}")
    except UnicodeDecodeError as exc:
        raise Mp3FormatError(f"bad ID3 text payload: {exc}") from exc
    return s.split("\x00")[0]


def parse_id3v2(data: bytes) -> tuple[dict, int]:
    """Parse a leading ID3v2.3/2.4 tag → (fields, total_tag_bytes).
    Returns ({}, 0) when no tag is present."""
    if data[:3] != b"ID3" or len(data) < 10:
        return {}, 0
    ver_major, flags = data[3], data[5]
    if ver_major not in (3, 4):
        raise Mp3FormatError(f"unsupported ID3v2.{ver_major}")
    size = _syncsafe(data[6:10])
    total = 10 + size + (10 if flags & 0x10 else 0)       # footer flag
    if total > len(data):
        raise Mp3FormatError("truncated ID3v2 tag")
    out: dict = {}
    pos, end = 10, 10 + size
    while pos + 10 <= end:
        fid = data[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":                    # padding
            break
        fsize = (_syncsafe(data[pos + 4:pos + 8]) if ver_major == 4
                 else struct.unpack(">I", data[pos + 4:pos + 8])[0])
        if pos + 10 + fsize > end:
            raise Mp3FormatError("ID3v2 frame overruns tag")
        if fid in _ID3_TEXT_FRAMES:
            out[_ID3_TEXT_FRAMES[fid]] = _decode_text(
                data[pos + 10:pos + 10 + fsize])
        pos += 10 + fsize
    return out, total


def parse_id3v1(data: bytes) -> dict:
    """Trailing 128-byte ID3v1 block → fields ({} when absent)."""
    if len(data) < 128 or data[-128:-125] != b"TAG":
        return {}
    blk = data[-128:]

    def txt(a: int, b: int) -> str:
        return blk[a:b].split(b"\x00")[0].decode("latin-1").strip()

    return {"title": txt(3, 33), "artist": txt(33, 63), "album": txt(63, 93),
            "year": txt(93, 97)}


def _frame_header(b: bytes):
    """Decode 4 header bytes → (frame_len, samples, sr, kbps, channels)
    or None when the bytes are not a valid frame header."""
    if len(b) < 4 or b[0] != 0xFF or (b[1] & 0xE0) != 0xE0:
        return None
    ver_bits = (b[1] >> 3) & 0x3
    layer_bits = (b[1] >> 1) & 0x3
    if ver_bits == 1 or layer_bits == 0:
        return None
    layer = 4 - layer_bits                     # 1/2/3
    br_idx = b[2] >> 4
    sr_idx = (b[2] >> 2) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:       # "free"/bad bitrate, bad sr
        return None
    padding = (b[2] >> 1) & 0x1
    channels = 1 if (b[3] >> 6) == 3 else 2
    vgroup = "1" if ver_bits == 3 else "2"
    kbps = _BITRATES[(vgroup, layer)][br_idx - 1]
    sr = _SAMPLERATES[ver_bits][sr_idx]
    if layer == 1:
        frame_len = (12000 * kbps // sr + padding) * 4
        samples = 384
    elif layer == 2:
        frame_len = 144000 * kbps // sr + padding
        samples = 1152
    else:                                      # Layer III
        if vgroup == "1":
            frame_len = 144000 * kbps // sr + padding
            samples = 1152
        else:
            frame_len = 72000 * kbps // sr + padding
            samples = 576
    return frame_len, samples, sr, kbps, channels


def sniff_mp3(data: bytes) -> bool:
    """True when the payload LOOKS like MPEG audio: an ID3v2 prefix or a
    fully valid first frame header. A bare 0xFF-0xEx prefix is NOT enough
    — ADTS AAC starts 0xFF 0xF1/0xF9 (layer bits 00) and must keep
    routing to the generic adapter, not the MP3 walk."""
    return data[:3] == b"ID3" or _frame_header(data[:4]) is not None


def build_frame(kbps: int, sr: int, channels: int = 2,
                version: int = 1, layer: int = 3) -> bytes:
    """Construct one valid (header + zero payload) MPEG audio frame —
    fixture/test side; the parser walks what this emits."""
    ver_bits = {1: 3, 2: 2}[version]
    vgroup = "1" if version == 1 else "2"
    try:
        br_idx = _BITRATES[(vgroup, layer)].index(kbps) + 1
        sr_idx = _SAMPLERATES[ver_bits].index(sr)
    except ValueError as exc:
        raise Mp3FormatError(f"no index for {kbps} kbps / {sr} Hz") from exc
    b1 = 0xFF
    b2 = 0xE0 | (ver_bits << 3) | ((4 - layer) << 1) | 1   # no CRC
    b3 = (br_idx << 4) | (sr_idx << 2)                     # no padding
    b4 = (0x3 if channels == 1 else 0x0) << 6
    hdr = bytes([b1, b2, b3, b4])
    decoded = _frame_header(hdr)
    assert decoded is not None
    return hdr + bytes(decoded[0] - 4)


def build_id3v2(title: str | None = None, artist: str | None = None,
                album: str | None = None) -> bytes:
    """Construct a minimal ID3v2.3 tag (latin-1 text frames)."""
    frames = bytearray()
    for fid, val in ((b"TIT2", title), (b"TPE1", artist), (b"TALB", album)):
        if val is None:
            continue
        body = b"\x00" + val.encode("latin-1")
        frames += fid + struct.pack(">I", len(body)) + b"\x00\x00" + body
    size = len(frames)
    ss = bytes(((size >> s) & 0x7F) for s in (21, 14, 7, 0))
    return b"ID3\x03\x00\x00" + ss + bytes(frames)


def mp3_meta(data: bytes) -> dict:
    """Walk an MP3: skip ID3v2, decode every frame header, read ID3v1.

    Returns sample_rate, channels, n_frames, duration_ms (exact integer
    microsecond math floored to ms via duration_us), bitrate_kbps (of the
    first frame), vbr (any frame differs), plus title/artist/album (ID3v2
    wins over ID3v1). A truncated tail after >=1 complete frame degrades
    to the frames seen; zero decodable frames raises Mp3FormatError.
    """
    tags, pos = parse_id3v2(data)
    v1 = parse_id3v1(data)
    for k, v in v1.items():
        tags.setdefault(k, v)
    end = len(data) - (128 if v1 else 0)

    n_frames = 0
    total_samples = 0
    sr0 = kbps0 = ch0 = None
    vbr = False
    scanned = 0
    while pos + 4 <= end and n_frames < _MAX_FRAMES:
        h = _frame_header(data[pos:pos + 4])
        if h is None:
            if n_frames == 0:
                # bounded resync: tolerate leading junk before frame 1
                scanned += 1
                if scanned > _MAX_LEADING_JUNK:
                    raise Mp3FormatError("no frame sync in leading 64 KiB")
                pos += 1
                continue
            break                      # garbage after good frames: stop
        frame_len, samples, sr, kbps, ch = h
        if pos + frame_len > end:
            break                      # truncated final frame
        if n_frames == 0:
            sr0, kbps0, ch0 = sr, kbps, ch
        elif sr != sr0:
            break                      # samplerate change = not one stream
        elif kbps != kbps0:
            vbr = True
        n_frames += 1
        total_samples += samples
        pos += frame_len
    if n_frames == 0:
        raise Mp3FormatError("no decodable MPEG audio frames")
    duration_us = total_samples * 1_000_000 // sr0
    return {"sample_rate": sr0, "channels": ch0, "n_frames": n_frames,
            "duration_ms": duration_us // 1000, "bitrate_kbps": kbps0,
            "vbr": vbr, "title": tags.get("title"),
            "artist": tags.get("artist"), "album": tags.get("album")}
