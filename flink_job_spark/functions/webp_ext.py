"""Extended (VP8X) WebP still images — RFC 9649 §4.2: the container
layout real encoders emit whenever a lossy image carries ALPHA, ICC,
EXIF or XMP. Closes most of the remaining WebP adapter surface (r8):
a VP8X still image with an ALPH chunk now decodes natively end to end —
lossy VP8 color (functions/vp8.py) merged with a lossless alpha plane
decoded from the ALPH chunk in all its forms: uncompressed, any of the
four prediction filters (none/horizontal/vertical/gradient), and the
HEADERLESS VP8L compression mode (the alpha values ride the green
channel of a dimension-implied lossless stream —
webp._decode_vp8l_stream). ANIMATED WebP (ANIM/ANMF) remains the
documented adapter boundary: frame blending/disposal is a video
concern, and the triage path records it as such.

The alpha unfilters follow the public libwebp semantics (horizontal
seeds each row from the pixel above, vertical falls back to horizontal
on row 0, gradient uses the clamped a+b-c predictor with the same
fallbacks); the builder applies the exact forward filters so fixtures
roundtrip the alpha plane EXACTLY — which is what makes the oracle for
q_media_webp_alpha closed-form despite the lossy color path.

Errors-as-data: malformed container structure raises WebpFormatError
(shared family), dimension caps fire before pixel loops.
"""

from __future__ import annotations

import struct

import numpy as np

from flink_job_spark.functions.vp8 import (Vp8FormatError, MAX_PIXELS,
                                           decode_webp_lossy,
                                           encode_webp_lossy)
from flink_job_spark.functions.webp import (WebpFormatError, _Bits,
                                            _decode_vp8l_stream,
                                            decode_webp_lossless,
                                            encode_webp_lossless)

_FLAG_ICC = 0x20
_FLAG_ALPHA = 0x10
_FLAG_EXIF = 0x08
_FLAG_XMP = 0x04
_FLAG_ANIM = 0x02


def _chunks(data: bytes, pos: int):
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body_end = pos + 8 + size
        if body_end > len(data):
            raise WebpFormatError(f"chunk {tag!r} overruns file")
        yield tag, data[pos + 8:body_end]
        pos = body_end + (size & 1)          # chunks are 2-byte aligned


def _gradient(a: int, b: int, c: int) -> int:
    v = a + b - c
    return 0 if v < 0 else (255 if v > 255 else v)


def _unfilter_alpha(raw: np.ndarray, method: int) -> np.ndarray:
    """Invert the ALPH prediction filter in place-order (libwebp
    semantics: horizontal seeds each row from the pixel above; vertical
    and gradient fall back to horizontal on the first row)."""
    h, w = raw.shape
    out = np.zeros((h, w), np.int64)
    if method == 0:
        return raw.copy()
    for y in range(h):
        if method == 1 or y == 0:
            pred = 0 if y == 0 else int(out[y - 1, 0])
            for x in range(w):
                pred = (pred + int(raw[y, x])) & 0xFF
                out[y, x] = pred
        elif method == 2:
            out[y] = (out[y - 1] + raw[y]) & 0xFF
        else:                               # gradient
            top = int(out[y - 1, 0])
            top_left = top
            left = top
            for x in range(w):
                top = int(out[y - 1, x])
                left = (int(raw[y, x])
                        + _gradient(left, top, top_left)) & 0xFF
                top_left = top
                out[y, x] = left
    return out


def _filter_alpha(plane: np.ndarray, method: int) -> np.ndarray:
    """Forward filter (builder twin) — exact inverse of the above."""
    h, w = plane.shape
    out = np.zeros((h, w), np.int64)
    if method == 0:
        return plane.copy()
    for y in range(h):
        if method == 1 or y == 0:
            pred = 0 if y == 0 else int(plane[y - 1, 0])
            for x in range(w):
                out[y, x] = (int(plane[y, x]) - pred) & 0xFF
                pred = int(plane[y, x])
        elif method == 2:
            out[y] = (plane[y] - plane[y - 1]) & 0xFF
        else:
            top_left = int(plane[y - 1, 0])
            left = top_left
            for x in range(w):
                top = int(plane[y - 1, x])
                out[y, x] = (int(plane[y, x])
                             - _gradient(left, top, top_left)) & 0xFF
                left = int(plane[y, x])
                top_left = top
    return out


def _decode_alpha(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH chunk -> (h, w) uint8 alpha plane."""
    if not body:
        raise WebpFormatError("empty ALPH chunk")
    b0 = body[0]
    if b0 & 0xC0:
        raise WebpFormatError("reserved ALPH bits set")
    filt = (b0 >> 2) & 3
    comp = b0 & 3
    data = body[1:]
    if comp == 0:
        if len(data) < w * h:
            raise WebpFormatError("raw ALPH data truncated")
        raw = np.frombuffer(data[:w * h], np.uint8).astype(
            np.int64).reshape(h, w)
    elif comp == 1:
        # headerless VP8L stream; alpha rides the GREEN channel
        px = _decode_vp8l_stream(_Bits(data, 0), w, h)
        raw = (np.array(px, np.int64).reshape(h, w) >> 8) & 0xFF
    else:
        raise WebpFormatError(f"reserved ALPH compression {comp}")
    return _unfilter_alpha(raw, filt).astype(np.uint8)


def webp_extended_meta(data: bytes) -> tuple[int, int, bool, bool]:
    """Header-only (canvas_w, canvas_h, has_alpha, animated) of a VP8X
    file — no pixel decode."""
    if len(data) < 30 or data[:4] != b"RIFF" or data[8:12] != b"WEBP" \
            or data[12:16] != b"VP8X":
        raise WebpFormatError("not an extended (VP8X) WebP")
    (vsize,) = struct.unpack("<I", data[16:20])
    if vsize != 10 or 20 + vsize > len(data):
        raise WebpFormatError(f"bad VP8X chunk size {vsize}")
    flags = data[20]
    cw = 1 + int.from_bytes(data[24:27], "little")
    ch = 1 + int.from_bytes(data[27:30], "little")
    return cw, ch, bool(flags & _FLAG_ALPHA), bool(flags & _FLAG_ANIM)


def decode_webp_extended(data: bytes, max_pixels: int = MAX_PIXELS
                         ) -> tuple[int, int, int, bytes]:
    """VP8X still image -> (w, h, 4, row-major RGBA). Animated files
    raise the tagged adapter-boundary error."""
    if len(data) < 30 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpFormatError("not a RIFF/WEBP file")
    if data[12:16] != b"VP8X":
        raise WebpFormatError("not an extended (VP8X) WebP")
    (vsize,) = struct.unpack("<I", data[16:20])
    if vsize != 10 or 20 + vsize > len(data):
        raise WebpFormatError(f"bad VP8X chunk size {vsize}")
    flags = data[20]
    cw = 1 + int.from_bytes(data[24:27], "little")
    ch = 1 + int.from_bytes(data[27:30], "little")
    if cw * ch > max_pixels:
        raise WebpFormatError(f"canvas exceeds pixel cap: {cw}x{ch}")
    if flags & _FLAG_ANIM:
        raise WebpFormatError(
            "animated WebP (ANIM) needs a codec library — the adapter "
            "boundary; still VP8X images decode natively")
    alph = image = image_tag = None
    for tag, body in _chunks(data, 30):
        if tag == b"ALPH":
            alph = body
        elif tag in (b"VP8 ", b"VP8L") and image is None:
            image, image_tag = body, tag
        elif tag == b"ANMF":
            raise WebpFormatError(
                "animated WebP (ANMF) needs a codec library — the "
                "adapter boundary; still VP8X images decode natively")
        # ICCP/EXIF/XMP and unknown chunks: metadata, skipped
    if image is None:
        raise WebpFormatError("VP8X without an image chunk")

    def wrap(tag: bytes, body: bytes) -> bytes:
        chunk = tag + struct.pack("<I", len(body)) + body
        if len(body) % 2:
            chunk += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" \
            + chunk

    if image_tag == b"VP8L":
        w, h, _c, rgba = decode_webp_lossless(wrap(b"VP8L", image))
        out = bytearray(rgba)
    else:
        w, h, _c, rgb = decode_webp_lossy(wrap(b"VP8 ", image),
                                          max_pixels)
        rgb3 = np.frombuffer(rgb, np.uint8).reshape(h, w, 3)
        out4 = np.empty((h, w, 4), np.uint8)
        out4[..., :3] = rgb3
        out4[..., 3] = 255
        out = bytearray(out4.tobytes())
    if (w, h) != (cw, ch):
        raise WebpFormatError(
            f"image dims {w}x{h} != VP8X canvas {cw}x{ch}")
    if alph is not None and image_tag == b"VP8 ":
        # VP8L payloads carry their own alpha; ALPH applies to lossy
        a = _decode_alpha(alph, w, h)
        out[3::4] = a.tobytes()
    return w, h, 4, bytes(out)


# --- builder (fixture/test side) -----------------------------------------------


def build_webp_extended(width: int, height: int, rgba: bytes, *,
                        qi: int = 8, mode_policy: str = "cycle",
                        alpha_filter: int = 0,
                        alpha_compress: str = "raw",
                        lossless: bool = False,
                        with_exif: bool = False,
                        animated: bool = False) -> bytes:
    """RGBA -> a VP8X file: ALPH (chosen filter + raw/VP8L compression)
    + VP8 color, or a VP8L payload when `lossless`. `animated` stamps
    the ANIM flag + an ANMF chunk to exercise the gated boundary."""
    if len(rgba) != width * height * 4:
        raise WebpFormatError("pixel buffer does not match dims")
    if not 0 <= alpha_filter <= 3:
        raise WebpFormatError(f"bad alpha filter {alpha_filter}")
    arr = np.frombuffer(rgba, np.uint8).reshape(height, width, 4)

    def chunk(tag: bytes, body: bytes) -> bytes:
        out = tag + struct.pack("<I", len(body)) + body
        if len(body) % 2:
            out += b"\x00"
        return out

    body = b""
    flags = 0
    if animated:
        flags |= _FLAG_ANIM
    if lossless:
        # encode_webp_lossless returns a full RIFF; its single chunk
        # (tag+size+payload+pad) starts at byte 12 and is reused as-is
        vp8l = encode_webp_lossless(width, height, rgba, 4)
        body += vp8l[12:]
    else:
        flags |= _FLAG_ALPHA
        filtered = _filter_alpha(arr[..., 3].astype(np.int64),
                                 alpha_filter)
        if alpha_compress == "raw":
            adata = filtered.astype(np.uint8).tobytes()
        elif alpha_compress == "vp8l":
            # headerless stream: gray RGBA (alpha in green), strip the
            # 20-byte RIFF + 5-byte VP8L signature/dims header
            g = filtered.astype(np.uint8)
            quad = np.zeros((height, width, 4), np.uint8)
            quad[..., 1] = g
            quad[..., 3] = 255
            full = encode_webp_lossless(width, height, quad.tobytes(), 4)
            adata = full[25:]
        else:
            raise WebpFormatError(
                f"bad alpha compression {alpha_compress!r}")
        comp = 0 if alpha_compress == "raw" else 1
        body += chunk(b"ALPH", bytes([(alpha_filter << 2) | comp])
                      + adata)
        vp8 = encode_webp_lossy(width, height, arr[..., :3].tobytes(), 3,
                                qi=qi, mode_policy=mode_policy)
        (fsize,) = struct.unpack("<I", vp8[16:20])
        body += chunk(b"VP8 ", vp8[20:20 + fsize])
    if with_exif:
        flags |= _FLAG_EXIF
        body += chunk(b"EXIF", b"II*\x00\x08\x00\x00\x00\x00\x00")
    if animated:
        body += chunk(b"ANMF", bytes(16))
    vp8x = (bytes([flags]) + b"\x00\x00\x00"
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little"))
    body = chunk(b"VP8X", vp8x) + body
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
