"""MKV / WebM (EBML, RFC 8794 + the Matroska spec) — container metadata
triage, no codec.

The EBML twin of functions/mp4.py (VERDICT r6 #3): the first pass a
100 TB video pipeline runs over .mkv/.webm blobs is a header walk —
DocType, duration, track inventory, video dimensions, audio rate — all
plain EBML structure. Frame decode (VP9/AV1/H.264 payloads) stays the
documented codec-library boundary (operators/multimodal.py routes EBML
video to the ffmpeg adapter); the metadata walk is native.

EBML grammar: every element is [id: 1-4 byte VINT with marker kept]
[size: 1-8 byte VINT with marker stripped; all-ones data = unknown]
[body]. Unknown size is legal only for Segment (and Cluster) and means
"extends to the end of the enclosing scope" — common in live-muxed
files. Parsed elements: EBML header (DocType 0x4282), Segment
0x18538067 → Info 0x1549A966 (TimestampScale 0x2AD7B1 default 1e6 ns,
Duration 0x4489 float32/64 in scale units), Tracks 0x1654AE6B →
TrackEntry 0xAE (TrackType 0x83, CodecID 0x86, Video 0xE0 →
PixelWidth 0xB0 / PixelHeight 0xBA, Audio 0xE1 →
SamplingFrequency 0xB5 / Channels 0x9F). Clusters and everything else
skip by size. Depth/child caps bomb-guard the walk; every size is
bounds-checked; malformed structure raises MkvFormatError so the
mapInPandas wrappers keep errors as data.

Reference parity: the same skip-never-crash per-row contract as the
rest of the media surface (mis_initial_job FirebirdToIcebergJob
mis:530-586).
"""

from __future__ import annotations

import struct

_MAX_DEPTH = 16
_MAX_CHILDREN = 65_536

# element ids (marker bits kept, as they appear in the stream)
_EBML_HEADER = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_AUDIO = 0xE1
_SAMPLING_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675

_RECURSE = {_SEGMENT, _INFO, _TRACKS, _TRACK_ENTRY, _VIDEO, _AUDIO}

# Matroska top-level (Segment-child) element ids as stream bytes — the
# resync set for unknown-size Clusters: SeekHead, Info, Tracks, Cluster,
# Cues, Attachments, Chapters, Tags
_TOP_LEVEL_IDS = (b"\x11\x4d\x9b\x74", b"\x15\x49\xa9\x66",
                  b"\x16\x54\xae\x6b", b"\x1f\x43\xb6\x75",
                  b"\x1c\x53\xbb\x6b", b"\x19\x41\xa4\x69",
                  b"\x10\x43\xa7\x70", b"\x12\x54\xc3\x67")


class MkvFormatError(ValueError):
    """Malformed EBML structure — becomes a decode_error row."""


def _read_id(data: bytes, pos: int, end: int) -> tuple[int, int]:
    """Element ID: 1-4 byte VINT, marker bits KEPT (Matroska ids are
    quoted with the marker)."""
    if pos >= end:
        raise MkvFormatError("truncated element id")
    b0 = data[pos]
    for ln in range(1, 5):
        if b0 & (0x80 >> (ln - 1)):
            if pos + ln > end:
                raise MkvFormatError("truncated element id")
            return int.from_bytes(data[pos:pos + ln], "big"), pos + ln
    raise MkvFormatError(f"bad element id lead byte {b0:#x}")


def _read_size(data: bytes, pos: int, end: int) -> tuple[int | None, int]:
    """Element size: 1-8 byte VINT, marker stripped; all data bits set
    means UNKNOWN size (None)."""
    if pos >= end:
        raise MkvFormatError("truncated element size")
    b0 = data[pos]
    for ln in range(1, 9):
        if b0 & (0x80 >> (ln - 1)):
            if pos + ln > end:
                raise MkvFormatError("truncated element size")
            val = b0 & (0xFF >> ln)
            for i in range(1, ln):
                val = (val << 8) | data[pos + i]
            if val == (1 << (7 * ln)) - 1:       # VINT_DATA all ones
                return None, pos + ln
            return val, pos + ln
    raise MkvFormatError(f"bad size lead byte {b0:#x}")


def _plausible_sibling(data: bytes, p: int, end: int,
                       allow_unknown: bool) -> bool:
    """True when a well-formed VINT size follows a candidate top-level id
    at ``p`` and the implied element fits the enclosing scope. Unknown
    size (``allow_unknown``) is accepted only when the matched id is one
    for which RFC 8794 permits it — Segment/Cluster — so a decoy
    Tracks/Info/Cues byte pattern followed by 0xFF inside an opaque Block
    payload no longer truncates the unknown-size Cluster (ADVICE r9).
    Guards the unknown-size Cluster resync scan."""
    try:
        size, q = _read_size(data, p, end)
    except MkvFormatError:
        return False
    if size is None:
        return allow_unknown
    return q + size <= end


def _uint(body: bytes) -> int:
    if len(body) > 8:
        raise MkvFormatError("uint wider than 8 bytes")
    return int.from_bytes(body, "big")


def _float(body: bytes) -> float:
    if len(body) == 4:
        return struct.unpack(">f", body)[0]
    if len(body) == 8:
        return struct.unpack(">d", body)[0]
    if len(body) == 0:
        return 0.0
    raise MkvFormatError(f"bad float width {len(body)}")


def _walk(data: bytes, pos: int, end: int, depth: int, out: dict,
          track: dict | None) -> None:
    if depth > _MAX_DEPTH:
        raise MkvFormatError("EBML nesting exceeds depth cap")
    children = 0
    while pos < end:
        children += 1
        if children > _MAX_CHILDREN:
            raise MkvFormatError("EBML child count exceeds cap")
        eid, pos = _read_id(data, pos, end)
        size, pos = _read_size(data, pos, end)
        if size is None:
            # unknown size: legal for Segment/Cluster (RFC 8794 §6.2).
            # Segment runs to the end of the enclosing scope; a live-muxed
            # Cluster ends at the first valid SIBLING id — scan for the
            # next top-level Matroska id so elements placed after it
            # (later Clusters, trailing Info/Tracks) still parse instead
            # of being silently swallowed. Cluster bodies are opaque to
            # this triage walk, so a byte-pattern scan is the resync.
            if eid == _SEGMENT:
                size = end - pos
            elif eid == _CLUSTER:
                # ADVICE r8: a raw byte match alone is not a sibling — a
                # Block payload can contain e.g. 0x1F43B675 by chance and
                # would truncate the Cluster early. Accept a candidate
                # only if a well-formed VINT size follows the matched id
                # AND the implied element fits (or legally extends to)
                # the enclosing scope; otherwise keep scanning.
                nxt = end
                for pat in _TOP_LEVEL_IDS:
                    # unknown size on the SIBLING is only legal when the
                    # sibling itself is a Cluster (Segment never appears
                    # as a Segment child)
                    unk_ok = int.from_bytes(pat, "big") == _CLUSTER
                    i = data.find(pat, pos, nxt)
                    while i != -1 and i < nxt:
                        if _plausible_sibling(data, i + len(pat), end,
                                              unk_ok):
                            nxt = i
                            break
                        i = data.find(pat, i + 1, nxt)
                size = nxt - pos
            else:
                raise MkvFormatError(f"unknown size on element {eid:#x}")
        if pos + size > end:
            raise MkvFormatError(f"element {eid:#x} overruns scope")
        body_end = pos + size
        if eid == _EBML_HEADER:
            # header children: only DocType matters for triage
            p = pos
            hdr_children = 0
            while p < body_end:
                hdr_children += 1
                if hdr_children > _MAX_CHILDREN:
                    raise MkvFormatError("EBML header child cap")
                cid, p = _read_id(data, p, body_end)
                csz, p = _read_size(data, p, body_end)
                if csz is None or p + csz > body_end:
                    raise MkvFormatError("bad EBML header child")
                if cid == _DOCTYPE:
                    out["doc_type"] = data[p:p + csz].split(b"\x00")[0] \
                        .decode("ascii", "replace")
                p += csz
        elif eid in _RECURSE:
            if eid == _TRACK_ENTRY:
                t: dict = {"type": None, "codec": None, "w": None,
                           "h": None, "hz": None, "ch": None}
                _walk(data, pos, body_end, depth + 1, out, t)
                out["n_tracks"] += 1
                if t["type"] == 1:                # video
                    out["has_video"] = True
                    if out["vid_w"] is None:
                        out["vid_w"], out["vid_h"] = t["w"], t["h"]
                        out["video_codec"] = t["codec"]
                elif t["type"] == 2:              # audio
                    out["has_audio"] = True
                    if out["audio_hz"] is None:
                        out["audio_hz"] = t["hz"]
                        out["audio_channels"] = t["ch"]
            else:
                _walk(data, pos, body_end, depth + 1, out, track)
        elif track is not None and eid == _TRACK_TYPE:
            track["type"] = _uint(data[pos:body_end])
        elif track is not None and eid == _CODEC_ID:
            track["codec"] = data[pos:body_end].split(b"\x00")[0] \
                .decode("ascii", "replace")
        elif track is not None and eid == _PIXEL_W:
            track["w"] = _uint(data[pos:body_end])
        elif track is not None and eid == _PIXEL_H:
            track["h"] = _uint(data[pos:body_end])
        elif track is not None and eid == _SAMPLING_FREQ:
            track["hz"] = _float(data[pos:body_end])
        elif track is not None and eid == _CHANNELS:
            track["ch"] = _uint(data[pos:body_end])
        elif eid == _TIMESTAMP_SCALE:
            out["timestamp_scale"] = _uint(data[pos:body_end])
        elif eid == _DURATION:
            out["duration_units"] = _float(data[pos:body_end])
        pos = body_end


def mkv_meta(data: bytes) -> dict:
    """EBML-walk an MKV/WebM blob → doc_type, duration_ms (floor of
    units * scale_ns / 1e6), track inventory, first video track's dims
    and codec, first audio track's rate/channels. Raises MkvFormatError
    on malformed structure."""
    if len(data) < 4 or data[:4] != b"\x1a\x45\xdf\xa3":
        raise MkvFormatError("not an EBML file")
    out: dict = {"doc_type": None, "timestamp_scale": 1_000_000,
                 "duration_units": None, "n_tracks": 0,
                 "vid_w": None, "vid_h": None, "video_codec": None,
                 "audio_hz": None, "audio_channels": None,
                 "has_audio": False, "has_video": False}
    _walk(data, 0, len(data), 0, out, None)
    if out["doc_type"] is None:
        raise MkvFormatError("no DocType in EBML header")
    if out["duration_units"] is not None:
        ns = out["duration_units"] * out["timestamp_scale"]
        if not (0 <= ns < 2**62):
            raise MkvFormatError("implausible duration")
        out["duration_ms"] = int(ns // 1_000_000)
    else:
        out["duration_ms"] = None
    return out


# --------------------------------------------------------------------------
# builder (fixture/test side)
# --------------------------------------------------------------------------

def _vint_size(val: int) -> bytes:
    """Encode a size VINT in the fewest bytes (avoiding the all-ones
    unknown pattern)."""
    for ln in range(1, 9):
        if val < (1 << (7 * ln)) - 1:
            return ((1 << (7 * ln)) | val).to_bytes(ln, "big")
    raise MkvFormatError("size too large for VINT")


def _id_bytes(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _el(eid: int, body: bytes) -> bytes:
    return _id_bytes(eid) + _vint_size(len(body)) + body


def _el_uint(eid: int, val: int) -> bytes:
    body = val.to_bytes(max(1, (val.bit_length() + 7) // 8), "big")
    return _el(eid, body)


def build_mkv(doc_type: str = "matroska", timestamp_scale: int = 1_000_000,
              duration_units: float | None = None,
              video: tuple[int, int, str] | None = None,
              audio: tuple[int, int, str] | None = None,
              float32_duration: bool = False,
              unknown_segment_size: bool = False,
              cluster_bytes: int = 0,
              unknown_cluster_size: bool = False,
              cluster_before_tracks: bool = False) -> bytes:
    """Minimal-but-real Matroska/WebM: EBML header + Segment(Info +
    Tracks [+ Cluster]). `video` is (w, h, codec_id); `audio` is
    (hz, channels, codec_id). `unknown_segment_size` /
    `unknown_cluster_size` write the all-ones VINT the way live muxers
    do; `cluster_before_tracks` places the Cluster between Info and
    Tracks (the live-mux layout where trailing siblings must resync)."""
    header = _el(_EBML_HEADER,
                 _el_uint(0x4286, 1)                  # EBMLVersion
                 + _el_uint(0x42F7, 1)                # EBMLReadVersion
                 + _el(_DOCTYPE, doc_type.encode("ascii"))
                 + _el_uint(0x4287, 4))               # DocTypeVersion
    info = _el_uint(_TIMESTAMP_SCALE, timestamp_scale)
    if duration_units is not None:
        if float32_duration:
            info += _el(_DURATION, struct.pack(">f", duration_units))
        else:
            info += _el(_DURATION, struct.pack(">d", duration_units))
    seg_body = _el(_INFO, info)
    cluster = b""
    if cluster_bytes:
        # a Timestamp child (0xE7) then zero padding — no accidental
        # top-level id patterns in the body
        cbody = _el_uint(0xE7, 0) + bytes(max(0, cluster_bytes - 4))
        if unknown_cluster_size:
            cluster = _id_bytes(_CLUSTER) + b"\xff" + cbody
        else:
            cluster = _el(_CLUSTER, cbody)
    if cluster_before_tracks:
        seg_body += cluster
        cluster = b""
    tracks = b""
    if video is not None:
        w, h, codec = video
        tracks += _el(_TRACK_ENTRY,
                      _el_uint(_TRACK_TYPE, 1)
                      + _el(_CODEC_ID, codec.encode("ascii"))
                      + _el(_VIDEO, _el_uint(_PIXEL_W, w)
                            + _el_uint(_PIXEL_H, h)))
    if audio is not None:
        hz, ch, codec = audio
        tracks += _el(_TRACK_ENTRY,
                      _el_uint(_TRACK_TYPE, 2)
                      + _el(_CODEC_ID, codec.encode("ascii"))
                      + _el(_AUDIO,
                            _el(_SAMPLING_FREQ, struct.pack(">d", float(hz)))
                            + _el_uint(_CHANNELS, ch)))
    if tracks:
        seg_body += _el(_TRACKS, tracks)
    seg_body += cluster
    if unknown_segment_size:
        seg = _id_bytes(_SEGMENT) + b"\xff" + seg_body
    else:
        seg = _el(_SEGMENT, seg_body)
    return header + seg
