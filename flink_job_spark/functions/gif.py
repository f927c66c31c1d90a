"""Minimal GIF codec (struct + numpy only — no imaging library).

Decode supports the full GIF87a/89a still-image path: logical screen
descriptor, global/local color tables, extension-block skipping, INTERLACED
and sequential row order, and a complete variable-width LZW decompressor
(clear/end codes, table growth to 4096, the cScSc self-reference case).
Animated GIFs decode as their FIRST frame. Output is row-major top-down RGB
via the palette.

Encode writes a valid single-frame GIF with a 256-entry palette using a
REAL variable-width LZW compressor (dictionary growth to 4096 entries,
width bumps synchronized with the decoder's table-length rule, CLEAR+reset
on table overflow), optionally interlaced — round-trips any 8-bit-indexed
image through a conforming decoder at normal compression ratios.

Third REAL raster codec next to png.py (compressed, filtered) and bmp.py
(raw DIB): GIF exercises the variable-width bitstream + dictionary-codec
path. The fourth, JPEG (functions/jpeg.py), covers the transform-codec
path; only compressed audio/video remain stubbed
(operators/multimodal.py documents the rationale).
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGNATURES = (b"GIF87a", b"GIF89a")

# Decompression-bomb guard (same rationale as png.MAX_PIXELS): header dims
# up to 65535x65535 with ~2500x LZW expansion would allocate multi-GB from a
# few-MB blob. _lzw_decode already stops at `expected`; capping w*h keeps
# `expected` itself sane so one crafted row can't OOM a 100 TB scan.
MAX_PIXELS = 64_000_000


class GifFormatError(ValueError):
    pass


# --- encode -------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_rows(height: int) -> list[int]:
    return [y for start, step in _INTERLACE_PASSES
            for y in range(start, height, step)]


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.out)


def _lzw_encode(mcs: int, indices: bytes) -> bytes:
    """Variable-width LZW, the inverse of _lzw_decode.

    Width-bump bookkeeping mirrors the decoder exactly: the decoder appends
    its entry for emission #m only while reading emission #(m+1), so the
    encoder bumps the write width one assignment EARLIER than its own table
    suggests — after assigning entry E the next code is written at width w+1
    only once E+1 > 2**w (roundtrips pinned in tests/test_multimodal.py).
    """
    clear, end = 1 << mcs, (1 << mcs) + 1
    bw = _BitWriter()
    fresh = {bytes([i]): i for i in range(clear)}
    table = dict(fresh)
    next_code = end + 1
    width = mcs + 1
    bw.write(clear, width)
    prev = b""
    for px in indices:
        cur = prev + bytes([px])
        if cur in table:
            prev = cur
            continue
        bw.write(table[prev], width)
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            bw.write(clear, width)
            table = dict(fresh)
            next_code = end + 1
            width = mcs + 1
        prev = bytes([px])
    if prev:
        bw.write(table[prev], width)
        if next_code < 4096:
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
    bw.write(end, width)
    return bw.flush()


def encode_gif(width: int, height: int, indices: bytes,
               palette: bytes | None = None, interlace: bool = False) -> bytes:
    """indices = row-major top-down 8-bit palette indices; palette = 768
    bytes RGB (defaults to the grayscale ramp r=g=b=i)."""
    if len(indices) != width * height:
        raise GifFormatError("index buffer does not match dims")
    if palette is None:
        palette = bytes(b for i in range(256) for b in (i, i, i))
    if len(palette) != 768:
        raise GifFormatError("palette must be 256 RGB entries")
    head = (b"GIF89a"
            + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # 256-entry GCT
            + palette)
    imgdesc = b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height,
                                    0x40 if interlace else 0)
    rows = (_interlace_rows(height) if interlace else range(height))
    seq = b"".join(indices[y * width:(y + 1) * width] for y in rows)
    mcs = 8                        # min code size for a 256-color table
    payload = _lzw_encode(mcs, seq)
    blocks = b"".join(
        bytes([min(255, len(payload) - i)]) + payload[i:i + 255]
        for i in range(0, len(payload), 255)
    ) or b"\x01\x00"
    return (head + imgdesc + bytes([mcs]) + blocks + b"\x00" + b"\x3B")


# --- decode -------------------------------------------------------------------


def gif_meta(data: bytes) -> tuple[int, int]:
    """Header-only (width, height) from the logical screen descriptor."""
    if data[:6] not in GIF_SIGNATURES:
        raise GifFormatError("not a GIF")
    if len(data) < 13:
        raise GifFormatError("truncated header")
    w, h = struct.unpack("<HH", data[6:10])
    return w, h


def _lzw_decode(mcs: int, data: bytes, expected: int) -> bytearray:
    clear, end = 1 << mcs, (1 << mcs) + 1
    base: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = base[:]
    width = mcs + 1
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = base[:]    # ref-copy reset, not 256 fresh allocations
                width = mcs + 1
                prev = None
                continue
            if code == end:
                return out
            if code < len(table):
                entry = table[code]
            elif code == len(table) and prev is not None:
                entry = prev + prev[:1]          # the cScSc case
            else:
                raise GifFormatError(f"bad LZW code {code}")
            out += entry
            if prev is not None and len(table) < 4096:
                table.append(prev + entry[:1])
            if len(table) >= (1 << width) and width < 12:
                width += 1
            prev = entry
            if len(out) >= expected:
                return out
    return out


def decode_gif(data: bytes, max_pixels: int = MAX_PIXELS
               ) -> tuple[int, int, int, bytes]:
    """First-frame full decode → (width, height, 3, top-down RGB)."""
    if data[:6] not in GIF_SIGNATURES:
        raise GifFormatError("not a GIF")
    if len(data) < 13:
        raise GifFormatError("truncated header")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = data[pos:pos + n]
        if len(gct) < n:
            raise GifFormatError("truncated global color table")
        pos += n
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:                       # trailer before any image
            raise GifFormatError("no image data")
        if b0 == 0x21:                       # extension: skip sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b0 != 0x2C:
            raise GifFormatError(f"unexpected block 0x{b0:02x}")
        if pos + 10 > len(data):
            raise GifFormatError("truncated image descriptor")
        _l, _t, w, h, ipacked = struct.unpack("<HHHHB", data[pos + 1:pos + 10])
        if w * h > max_pixels:
            raise GifFormatError(f"dims too large ({w}x{h} > {max_pixels} px)")
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            pal = data[pos:pos + n]
            if len(pal) < n:
                raise GifFormatError("truncated local color table")
            pos += n
        if not pal:
            raise GifFormatError("no color table")
        if pos >= len(data):
            raise GifFormatError("truncated before LZW data")
        mcs = data[pos]
        pos += 1
        if not (2 <= mcs <= 8):
            raise GifFormatError(f"bad LZW min code size {mcs}")
        payload = bytearray()
        while pos < len(data) and data[pos] != 0:
            n = data[pos]
            block = data[pos + 1:pos + 1 + n]
            if len(block) < n:
                raise GifFormatError("truncated data sub-block")
            payload += block
            pos += 1 + n
        if pos >= len(data):
            raise GifFormatError("missing block terminator")
        idx = _lzw_decode(mcs, bytes(payload), w * h)
        if len(idx) < w * h:
            raise GifFormatError(
                f"LZW stream ended early ({len(idx)}/{w * h} pixels)")
        if ipacked & 0x40:                   # interlaced: un-permute rows
            seq = bytearray(w * h)
            for dst_row, y in enumerate(_interlace_rows(h)):
                seq[y * w:(y + 1) * w] = idx[dst_row * w:(dst_row + 1) * w]
            idx = seq
        ncolors = len(pal) // 3
        pix = np.frombuffer(bytes(idx[:w * h]), dtype=np.uint8)
        if int(pix.max(initial=0)) >= ncolors:
            raise GifFormatError("palette index out of range")
        rgb = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[pix]
        return w, h, 3, rgb.tobytes()
    raise GifFormatError("no image data")


# --- GIF89a animation ------------------------------------------------------------
#
# Multi-frame GIFs: NETSCAPE2.0 loop extension + one Graphic Control
# Extension (delay, disposal) per image. The index walk below touches only
# block HEADERS (sub-block length hops) — like the AVI idx1 path, sampling
# a frame LZW-decodes only that frame's bytes, the property that matters
# when the payload column is 100 TB. Compositing of PARTIAL frames (left/
# top offsets smaller than the logical screen) or TRANSPARENT frames
# (prior pixels show through the transparent index) requires decoding
# every prior frame, so frame seeking is only offered for opaque
# full-screen frames —
# which is what this encoder emits and what screen-recording/banner GIFs
# mostly are; partial-frame files raise GifFormatError (errors-as-data
# upstream).


def encode_gif_anim(width: int, height: int, frames: list[bytes],
                    delay_cs: int = 10, palette: bytes | None = None) -> bytes:
    """frames = row-major top-down 8-bit palette-index buffers, all
    full-screen; one GCE per frame with the given delay (centiseconds)."""
    if not frames:
        raise GifFormatError("at least one frame required")
    if not (0 < width < 65536 and 0 < height < 65536):
        raise GifFormatError("dims out of range")
    if not 0 < delay_cs < 65536:
        raise GifFormatError("delay out of range")
    if palette is None:
        palette = bytes(b for i in range(256) for b in (i, i, i))
    if len(palette) != 768:
        raise GifFormatError("palette must be 256 RGB entries")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0) + palette
    # NETSCAPE2.0 application extension: loop forever
    out += b"\x21\xFF\x0BNETSCAPE2.0\x03\x01\x00\x00\x00"
    for indices in frames:
        if len(indices) != width * height:
            raise GifFormatError("frame buffer does not match dims")
        # GCE: disposal 1 (leave in place), no transparency
        out += b"\x21\xF9\x04" + bytes([0x04]) + struct.pack(
            "<H", delay_cs) + b"\x00\x00"
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        payload = _lzw_encode(8, indices)
        out += bytes([8])
        for i in range(0, len(payload), 255):
            out += bytes([min(255, len(payload) - i)]) + payload[i:i + 255]
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


def open_gif_anim(data: bytes) -> dict:
    """Header/index walk (no LZW work): -> {width, height, palette,
    frames: [(left, top, w, h, ipacked, mcs, [(blockpos, blocklen), ...],
    delay_cs)], total_delay_cs}."""
    if data[:6] not in GIF_SIGNATURES:
        raise GifFormatError("not a GIF")
    if len(data) < 13:
        raise GifFormatError("truncated header")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = b""
    if packed & 0x80:
        n = 3 * (2 << (packed & 0x07))
        gct = data[pos:pos + n]
        if len(gct) < n:
            raise GifFormatError("truncated global color table")
        pos += n
    frames: list[tuple] = []
    total_delay = 0
    delay = 0
    transparent = False
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x3B:
            break
        if b0 == 0x21:                       # extension
            if pos + 2 > len(data):
                raise GifFormatError("truncated extension")
            label = data[pos + 1]
            p = pos + 2
            if label == 0xF9 and p < len(data) and data[p] == 4:
                if p + 5 > len(data):
                    raise GifFormatError("truncated GCE")
                (delay,) = struct.unpack("<H", data[p + 2:p + 4])
                transparent = bool(data[p + 1] & 0x01)
            while p < len(data) and data[p] != 0:
                p += 1 + data[p]
            if p >= len(data):
                raise GifFormatError("unterminated extension")
            pos = p + 1
            continue
        if b0 != 0x2C:
            raise GifFormatError(f"unexpected block 0x{b0:02x}")
        if pos + 10 > len(data):
            raise GifFormatError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB",
                                                 data[pos + 1:pos + 10])
        if w * h > MAX_PIXELS:
            raise GifFormatError(f"dims too large ({w}x{h} > {MAX_PIXELS} px)")
        pos += 10
        pal = gct
        if ipacked & 0x80:
            n = 3 * (2 << (ipacked & 0x07))
            pal = data[pos:pos + n]
            if len(pal) < n:
                raise GifFormatError("truncated local color table")
            pos += n
        if not pal:
            raise GifFormatError("no color table")
        if pos >= len(data):
            raise GifFormatError("truncated before LZW data")
        mcs = data[pos]
        pos += 1
        if not (2 <= mcs <= 8):
            raise GifFormatError(f"bad LZW min code size {mcs}")
        blocks: list[tuple[int, int]] = []
        while pos < len(data) and data[pos] != 0:
            n = data[pos]
            if pos + 1 + n > len(data):
                raise GifFormatError("truncated data sub-block")
            blocks.append((pos + 1, n))
            pos += 1 + n
        if pos >= len(data):
            raise GifFormatError("missing block terminator")
        pos += 1
        frames.append((left, top, w, h, ipacked, mcs, blocks, delay, pal,
                       transparent))
        total_delay += delay
        delay = 0
        transparent = False
    if not frames:
        raise GifFormatError("no image data")
    return {"width": sw, "height": sh, "frames": frames,
            "total_delay_cs": total_delay}


def gif_anim_meta(data: bytes) -> tuple[int, int, int, int]:
    """Header-only (width, height, n_frames, total_delay_cs)."""
    info = open_gif_anim(data)
    return (info["width"], info["height"], len(info["frames"]),
            info["total_delay_cs"])


def decode_gif_anim_frame(data: bytes, info: dict, index: int) -> bytes:
    """Decode ONLY the indexed frame -> top-down RGB. Requires the frame to
    cover the full logical screen (see module note on compositing);
    negative indexes count from the end."""
    frames = info["frames"]
    if not -len(frames) <= index < len(frames):
        raise GifFormatError(
            f"frame index {index} out of range ({len(frames)} frames)")
    (left, top, w, h, ipacked, mcs, blocks, _delay, pal,
     transparent) = frames[index]
    if (left, top, w, h) != (0, 0, info["width"], info["height"]):
        raise GifFormatError(
            "partial frame needs compositing (full-screen frames only)")
    if transparent:
        # a transparent full-screen frame shows prior-frame pixels through
        # its transparent index — decoding it standalone would silently
        # return the palette color instead (review-caught r5); same
        # errors-as-data boundary as partial frames
        raise GifFormatError(
            "transparent frame needs compositing (opaque frames only)")
    payload = b"".join(data[p:p + n] for p, n in blocks)
    idx = _lzw_decode(mcs, payload, w * h)
    if len(idx) < w * h:
        raise GifFormatError(
            f"LZW stream ended early ({len(idx)}/{w * h} pixels)")
    if ipacked & 0x40:
        seq = bytearray(w * h)
        for dst_row, y in enumerate(_interlace_rows(h)):
            seq[y * w:(y + 1) * w] = idx[dst_row * w:(dst_row + 1) * w]
        idx = seq
    ncolors = len(pal) // 3
    pix = np.frombuffer(bytes(idx[:w * h]), dtype=np.uint8)
    if int(pix.max(initial=0)) >= ncolors:
        raise GifFormatError("palette index out of range")
    return np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)[pix].tobytes()
