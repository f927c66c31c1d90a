"""MP4 / ISO-BMFF (ISO/IEC 14496-12) box walk — container metadata only.

The first pass any 100 TB video pipeline runs over .mp4/.mov blobs is
container triage: brand, duration, track count, video dimensions, audio
presence — all plain struct layouts in the box tree, no codec needed.
This module walks the tree natively; the frame decode itself stays the
documented codec-library boundary (H.264/VP9/AV1 need real decoders —
operators/multimodal.py + functions/codec_adapters.py), matching how the
engine splits JPEG (native) from HEIC (adapter).

Box grammar: [size:u32][type:4cc] with size==1 → u64 largesize follows,
size==0 → box extends to end of enclosing container. Parsed boxes:
``ftyp`` (major brand), ``mvhd`` v0/v1 (timescale + duration),
``tkhd`` v0/v1 (width/height as 16.16 fixed point), ``hdlr`` (handler
4cc: vide/soun). Container boxes (moov/trak/mdia/minf/stbl/edts/udta)
recurse; depth and child counts are bomb-guarded, every size is
bounds-checked, and malformed structure raises Mp4FormatError so the
mapInPandas wrappers keep errors as data.

Reference parity: the same skip-never-crash per-row contract as the rest
of the media surface (mis_initial_job FirebirdToIcebergJob mis:530-586).
"""

from __future__ import annotations

import struct


class Mp4FormatError(ValueError):
    """Malformed ISO-BMFF structure — becomes a decode_error row."""


_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts",
               b"udta"}
_MAX_DEPTH = 16
_MAX_CHILDREN = 4096


def _walk(data: bytes, start: int, end: int, depth: int, out: dict) -> None:
    if depth > _MAX_DEPTH:
        raise Mp4FormatError("box nesting exceeds depth cap")
    pos = start
    children = 0
    while pos < end:
        children += 1
        if children > _MAX_CHILDREN:
            raise Mp4FormatError("box child count exceeds cap")
        if pos + 8 > end:
            raise Mp4FormatError("truncated box header")
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4FormatError("truncated largesize")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:                        # to end of container
            size = end - pos
        if size < body - pos or pos + size > end:
            raise Mp4FormatError(f"box {btype!r} size out of range")
        bend = pos + size

        if btype == b"ftyp" and out.get("brand") is None:
            if body + 4 > bend:
                raise Mp4FormatError("truncated ftyp")
            out["brand"] = data[body:body + 4].decode("latin-1").strip()
        elif btype == b"mvhd":
            ver = data[body]
            if ver == 1:
                if body + 32 > bend:           # reads [body+20, body+32)
                    raise Mp4FormatError("truncated mvhd v1")
                ts, dur = struct.unpack(">IQ", data[body + 20:body + 32])
            else:
                if body + 20 > bend:
                    raise Mp4FormatError("truncated mvhd")
                ts, dur = struct.unpack(">II", data[body + 12:body + 20])
            if ts == 0:
                raise Mp4FormatError("mvhd timescale 0")
            out["timescale"] = ts
            out["duration_units"] = dur
        elif btype == b"tkhd":
            ver = data[body]
            # width/height are the LAST 8 bytes of the box (16.16 fixed),
            # same offset rule for v0 (84-byte body) and v1 (96-byte)
            if bend - 8 < body:
                raise Mp4FormatError("truncated tkhd")
            w16, h16 = struct.unpack(">II", data[bend - 8:bend])
            if w16 and h16 and out.get("vid_w") is None:   # first video track
                out["vid_w"] = w16 >> 16
                out["vid_h"] = h16 >> 16
            out["n_tracks"] = out.get("n_tracks", 0) + 1
        elif btype == b"hdlr":
            if body + 12 > bend:
                raise Mp4FormatError("truncated hdlr")
            handler = data[body + 8:body + 12]
            if handler == b"soun":
                out["has_audio"] = True
            elif handler == b"vide":
                out["has_video"] = True
        elif btype in _CONTAINERS:
            _walk(data, body, bend, depth + 1, out)
        pos = bend


def mp4_meta(data: bytes) -> dict:
    """Box-walk an ISO-BMFF blob → brand, duration_ms (exact integer
    floor of units*1000/timescale), n_tracks, video dims, audio/video
    presence. Raises Mp4FormatError on malformed structure."""
    if len(data) < 8:
        raise Mp4FormatError("too short for a box")
    out: dict = {"brand": None, "timescale": None, "duration_units": None,
                 "n_tracks": 0, "vid_w": None, "vid_h": None,
                 "has_audio": False, "has_video": False}
    _walk(data, 0, len(data), 0, out)
    if out["timescale"] is None:
        raise Mp4FormatError("no mvhd box (not a movie)")
    out["duration_ms"] = out["duration_units"] * 1000 // out["timescale"]
    return out


# --------------------------------------------------------------------------
# builder (fixture/test side)
# --------------------------------------------------------------------------

def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def build_mp4(brand: str = "isom", timescale: int = 1000,
              duration_units: int = 0, video_dims: tuple[int, int] | None
              = None, audio: bool = False, mvhd_v1: bool = False) -> bytes:
    """Construct a minimal-but-real movie: ftyp + moov(mvhd + tracks)."""
    ftyp = _box(b"ftyp", brand.encode("latin-1").ljust(4)[:4]
                + struct.pack(">I", 0) + b"isom")
    if mvhd_v1:
        mvhd = _box(b"mvhd", b"\x01" + bytes(3) + bytes(16)
                    + struct.pack(">IQ", timescale, duration_units)
                    + bytes(80))
    else:
        mvhd = _box(b"mvhd", b"\x00" + bytes(3) + bytes(8)
                    + struct.pack(">II", timescale, duration_units)
                    + bytes(80))
    tracks = b""
    if video_dims is not None:
        w, h = video_dims
        tkhd = _box(b"tkhd", b"\x00" + bytes(3) + bytes(72)
                    + struct.pack(">II", w << 16, h << 16))
        hdlr = _box(b"hdlr", bytes(8) + b"vide" + bytes(12))
        tracks += _box(b"trak", tkhd + _box(b"mdia", hdlr))
    if audio:
        tkhd = _box(b"tkhd", b"\x00" + bytes(3) + bytes(72)
                    + struct.pack(">II", 0, 0))
        hdlr = _box(b"hdlr", bytes(8) + b"soun" + bytes(12))
        tracks += _box(b"trak", tkhd + _box(b"mdia", hdlr))
    return ftyp + _box(b"moov", mvhd + tracks)
