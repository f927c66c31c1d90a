"""APNG (animated PNG) decode — pure stdlib, built ON the PNG codec.

The modern animation format next to GIF89a: an acTL chunk declares the
frame count, each frame is an fcTL control chunk (region dims/offsets,
delay fraction, dispose/blend ops) followed by IDAT (first frame) or fdAT
chunks (sequence-numbered IDAT-equivalents). Each frame's datastream is,
per the spec, a COMPLETE PNG image stream for the region — so decode here
synthesizes a one-image PNG per frame (IHDR with region dims + the shared
PLTE/tRNS + the concatenated payloads as IDAT) and routes it through
decode_png: every color type / bit depth / filter / interlace case the
still codec handles, animation gets for free.

Compositing follows the spec: blend 0 (SOURCE) replaces the region, blend
1 (OVER) alpha-composites with exact integer rounding
(out = (src*a + dst*(255-a) + 127) // 255 — round-half-up, documented);
dispose 0 keeps the canvas, 1 clears the region to transparent black,
2 restores the previous canvas. Sequence numbers must be contiguous from
0 per spec; violations raise ApngFormatError (errors-as-data upstream).
"""

from __future__ import annotations

import struct
import zlib

from flink_job_spark.functions.png import (PNG_SIGNATURE, PngFormatError,
                                           decode_png, png_meta)

_MAX_FRAMES = 4096
# Work bomb guard: highly-compressible frames make a tiny file demand
# frames x pixels of compositing work; bound the TOTAL decoded pixels.
_MAX_TOTAL_PIXELS = 256_000_000


class ApngFormatError(ValueError):
    pass


def _chunks(data: bytes):
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ApngFormatError(f"truncated {tag!r} chunk")
        yield tag, body
        if tag == b"IEND":
            return
        pos += 12 + length


def _mk_chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def parse_apng(data: bytes) -> dict:
    """{width, height, num_frames, num_plays, frames: [frame dicts]} —
    each frame dict carries the fcTL fields plus the raw image payload.
    A plain PNG (no acTL) raises ApngFormatError — route it to decode_png."""
    if data[:8] != PNG_SIGNATURE:
        raise ApngFormatError("not a PNG")
    try:
        w, h, depth, ctype = png_meta(data)
    except (PngFormatError, struct.error) as e:
        raise ApngFormatError(str(e)) from e

    actl = None
    shared: list[tuple[bytes, bytes]] = []   # PLTE/tRNS to replay per frame
    ihdr_body = None
    frames: list[dict] = []
    cur: dict | None = None
    seqs: list[int] = []
    for tag, body in _chunks(data):
        if tag == b"IHDR":
            ihdr_body = body
        elif tag == b"acTL":
            if len(body) < 8:
                raise ApngFormatError("truncated acTL")
            nf, np_ = struct.unpack(">II", body[:8])
            if not 1 <= nf <= _MAX_FRAMES:
                raise ApngFormatError(f"frame count {nf} out of range")
            actl = (nf, np_)
        elif tag == b"fcTL":
            if len(body) < 26:
                raise ApngFormatError("truncated fcTL")
            (seq, fw, fh, fx, fy, dnum, dden, dispose,
             blend) = struct.unpack(">IIIIIHHBB", body[:26])
            seqs.append(seq)
            if fw == 0 or fh == 0 or fx + fw > w or fy + fh > h:
                raise ApngFormatError("frame region outside canvas")
            if dispose > 2 or blend > 1:
                raise ApngFormatError("bad dispose/blend op")
            cur = {"w": fw, "h": fh, "x": fx, "y": fy,
                   "delay_num": dnum, "delay_den": dden or 100,
                   "dispose": dispose, "blend": blend,
                   "payload": bytearray()}
            frames.append(cur)
        elif tag == b"IDAT":
            if cur is not None:
                cur["payload"] += body
            # IDAT with no preceding fcTL = a default image that is not
            # part of the animation; ignored here
        elif tag == b"fdAT":
            if cur is None:
                raise ApngFormatError("fdAT before any fcTL")
            if len(body) < 4:
                raise ApngFormatError("truncated fdAT")
            seqs.append(struct.unpack(">I", body[:4])[0])
            cur["payload"] += body[4:]
        elif tag in (b"PLTE", b"tRNS"):
            shared.append((tag, body))

    if actl is None:
        raise ApngFormatError("no acTL chunk — not an APNG")
    if sum(f["w"] * f["h"] for f in frames) > _MAX_TOTAL_PIXELS:
        raise ApngFormatError("total frame pixels exceed cap")
    if len(frames) != actl[0]:
        raise ApngFormatError(
            f"fcTL count {len(frames)} != acTL frame count {actl[0]}")
    if seqs != list(range(len(seqs))):
        raise ApngFormatError("fcTL/fdAT sequence numbers not contiguous")
    for f in frames:
        if not f["payload"]:
            raise ApngFormatError("frame without image data")
        ihdr = (struct.pack(">IIBBBBB", f["w"], f["h"], depth, ctype, 0, 0, 0)
                if ihdr_body is None else
                struct.pack(">II", f["w"], f["h"]) + ihdr_body[8:])
        sub = bytearray(PNG_SIGNATURE) + _mk_chunk(b"IHDR", ihdr)
        for tag, body in shared:
            sub += _mk_chunk(tag, body)
        sub += _mk_chunk(b"IDAT", bytes(f["payload"]))
        sub += _mk_chunk(b"IEND", b"")
        f["png"] = bytes(sub)
        del f["payload"]
    return {"width": w, "height": h, "num_frames": actl[0],
            "num_plays": actl[1], "frames": frames}


def _to_rgba(w: int, h: int, ch: int, px: bytes) -> bytearray:
    """Channel-expand to RGBA with whole-array numpy ops (r10): the
    per-pixel Python loop was the apng decode's dominant cost — same
    output bytes, byte for byte."""
    import numpy as np

    n = w * h
    if ch == 4:
        out4 = bytearray(n * 4)
        out4[:] = px
        return out4
    a = np.frombuffer(bytes(px), np.uint8)
    out = np.empty((n, 4), np.uint8)
    if ch == 3:
        out[:, :3] = a.reshape(n, 3)
        out[:, 3] = 255
    elif ch == 2:                                  # gray + alpha
        ga = a.reshape(n, 2)
        out[:, 0] = out[:, 1] = out[:, 2] = ga[:, 0]
        out[:, 3] = ga[:, 1]
    else:
        out[:, 0] = out[:, 1] = out[:, 2] = a
        out[:, 3] = 255
    return bytearray(out.tobytes())


def decode_apng_frames(data: bytes,
                       indices: list[int] | None = None
                       ) -> tuple[dict, list[tuple[int, bytes]]]:
    """(meta, [(frame_index, canvas RGBA bytes)]) — composites every frame
    in order (dispose/blend honored) and snapshots the canvas at the
    requested indices (all frames when None)."""
    meta = parse_apng(data)
    w, h = meta["width"], meta["height"]
    want = set(range(meta["num_frames"])) if indices is None else set(indices)
    canvas = bytearray(w * h * 4)                  # transparent black
    snaps: list[tuple[int, bytes]] = []
    for idx, f in enumerate(meta["frames"]):
        try:
            fw, fh, ch, px = decode_png(f["png"])
        except (PngFormatError, zlib.error, struct.error) as e:
            raise ApngFormatError(f"frame {idx}: {e}") from e
        region = _to_rgba(fw, fh, ch, px)
        before = bytes(canvas) if f["dispose"] == 2 else None
        # APNG spec: for the very first frame, blend_op OVER must be
        # treated as SOURCE (the canvas is fully transparent but the
        # composite rule is still "replace", not "over transparent black")
        blend = 0 if idx == 0 else f["blend"]
        for j in range(fh):
            dst0 = ((f["y"] + j) * w + f["x"]) * 4
            src0 = j * fw * 4
            if blend == 0:
                canvas[dst0:dst0 + fw * 4] = region[src0:src0 + fw * 4]
            else:
                for i in range(fw):
                    s = src0 + 4 * i
                    d = dst0 + 4 * i
                    a = region[s + 3]
                    if a == 255:
                        canvas[d:d + 4] = region[s:s + 4]
                    elif a:
                        na = 255 - a
                        for k in range(3):
                            canvas[d + k] = (region[s + k] * a
                                             + canvas[d + k] * na + 127) // 255
                        canvas[d + 3] = (a * 255 + canvas[d + 3] * na
                                         + 127) // 255
        if idx in want:
            snaps.append((idx, bytes(canvas)))
        if f["dispose"] == 1:
            for j in range(fh):
                d0 = ((f["y"] + j) * w + f["x"]) * 4
                canvas[d0:d0 + f["w"] * 4] = b"\x00" * (f["w"] * 4)
        elif f["dispose"] == 2:
            canvas = bytearray(before)
    return meta, snaps


def encode_apng(width: int, height: int,
                frames: list[dict],
                color_type: int = 2) -> bytes:
    """Fixture builder: frames = [{x, y, pixels(bytes RGB, or RGBA when
    color_type=6), w, h, delay_num, delay_den, dispose, blend}] —
    filter-0 scanlines, first frame as IDAT, the rest as fdAT."""
    if color_type not in (2, 6):
        raise ApngFormatError("fixture builder supports color type 2/6")
    bpp = 3 if color_type == 2 else 4
    out = bytearray(PNG_SIGNATURE)
    out += _mk_chunk(b"IHDR", struct.pack(">IIBBBBB", width, height,
                                          8, color_type, 0, 0, 0))
    out += _mk_chunk(b"acTL", struct.pack(">II", len(frames), 0))
    seq = 0
    for idx, f in enumerate(frames):
        fw, fh = f["w"], f["h"]
        if len(f["pixels"]) != fw * fh * bpp:
            raise ApngFormatError("frame pixel buffer mismatch")
        out += _mk_chunk(b"fcTL", struct.pack(
            ">IIIIIHHBB", seq, fw, fh, f.get("x", 0), f.get("y", 0),
            f.get("delay_num", 1), f.get("delay_den", 10),
            f.get("dispose", 0), f.get("blend", 0)))
        seq += 1
        raw = b"".join(b"\x00" + f["pixels"][j * fw * bpp:(j + 1) * fw * bpp]
                       for j in range(fh))
        z = zlib.compress(raw)
        if idx == 0:
            out += _mk_chunk(b"IDAT", z)
        else:
            out += _mk_chunk(b"fdAT", struct.pack(">I", seq) + z)
            seq += 1
    out += _mk_chunk(b"IEND", b"")
    return bytes(out)
