"""Baseline JFIF/JPEG codec (ITU-T T.81 baseline sequential DCT) —
struct + numpy only, no codec library.

Encode: 8-bit baseline, grayscale (1 component) or color (3-component
JFIF YCbCr at 4:4:4 or — r5 — 4:2:0 with 2x2 box-mean chroma
downsampling and T.81 A.2.3 MCU interleaving), ISO/IEC 10918-1 Annex K
quantization tables scaled by an IJG-style quality factor, Annex K
"typical" Huffman tables, single restart-free scan, partial edge blocks
padded by edge replication. Decode: the matching baseline subset with
GENERIC sampling factors (1..4 each axis, integer ratios — covers
4:4:4 / 4:2:2 / 4:2:0 / 4:1:1, i.e. virtually all real-world baseline
files) — SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS marker walk, canonical
Huffman decode with 0xFF00 byte-unstuffing and RSTn handling,
MCU-interleaved block placement, dequant + de-zigzag + float IDCT,
level shift, sample-replication chroma upsampling, JFIF YCbCr→RGB,
crop to declared dims. Progressive (SOF2) stays a documented stub.

Fourth REAL raster codec next to png.py (zlib + scanline filters),
bmp.py (raw DIB) and gif.py (variable-width LZW): JPEG exercises the
transform-codec path — block DCT, quantization, zigzag run-length and
canonical Huffman entropy coding. The roundtrip is LOSSY but fully
deterministic given the quant tables: decode(encode(x)) equals the
transform model round(idct(dequant(quant(dct(x))))) exactly (the
entropy layer is lossless — property-fuzzed against an independently
written transform twin in tests/test_codec_properties.py), and
DC-only blocks (constant 8x8 content with even sample values at
quality 50, where q_dc=16 divides the scaled DC exactly) roundtrip
IDENTICALLY — the closed form q_media_jpeg_stats' SQL oracle checks.

Compressed audio (mp3/ogg) and motion-compensated video (H.264) remain
the only stubbed formats (operators/multimodal.py documents why).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SOI = b"\xff\xd8"

# Decompression-bomb guard, same rationale as png.MAX_PIXELS: SOF0 dims
# are attacker-controlled 16-bit fields (65535x65535 -> ~4.3e9 samples).
MAX_PIXELS = 64_000_000


class JpegFormatError(ValueError):
    pass


# --- ISO/IEC 10918-1 Annex K tables (public spec constants) -----------------

# zigzag scan: ZIGZAG[k] = natural (row-major) index of the k-th scanned coef
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# Annex K "typical" Huffman specs: (BITS[1..16], HUFFVAL)
_DC_LUMA_SPEC = (
    (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_DC_CHROMA_SPEC = (
    (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0),
    tuple(range(12)),
)
_AC_LUMA_SPEC = (
    (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D),
    (
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ),
)
_AC_CHROMA_SPEC = (
    (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77),
    (
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ),
)

for _bits, _vals in (_DC_LUMA_SPEC, _DC_CHROMA_SPEC,
                     _AC_LUMA_SPEC, _AC_CHROMA_SPEC):
    assert sum(_bits) == len(_vals), "Annex K table internally inconsistent"


def _canonical_codes(bits, vals):
    """Canonical Huffman assignment (T.81 C.2): codes of ascending length,
    consecutive within a length. Returns {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits, vals):
    """{(length, code): symbol} for the bit-at-a-time decoder."""
    enc = _canonical_codes(bits, vals)
    return {(length, code): sym for sym, (code, length) in enc.items()}


# orthonormal 8-point DCT-II basis: A[u, x] = 0.5 * c(u) * cos((2x+1)u pi/16)
# => forward F = A @ B @ A.T, inverse B = A.T @ F @ A (T.81 A.3.3 scaling)
_DCT_A = np.array([
    [0.5 * (1 / np.sqrt(2) if u == 0 else 1.0)
     * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])


def quant_tables(quality: int = 50) -> tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled by the IJG quality convention: scale =
    5000/q (q<50) else 200-2q; entry = clip((base*scale+50)//100, 1, 255).
    quality=50 returns the Annex K tables UNCHANGED (q_dc=16) — the
    setting the exact-roundtrip oracle key relies on."""
    if not 1 <= quality <= 100:
        raise JpegFormatError(f"quality {quality} out of range")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    def sc(base):
        t = (base * scale + 50) // 100
        return np.clip(t, 1, 255).astype(np.int32)
    return sc(_Q_LUMA), sc(_Q_CHROMA)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:          # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.put((1 << (8 - self._n)) - 1, 8 - self._n)  # 1-fill pad


def _magnitude(v: int) -> int:
    return v.bit_length() if v >= 0 else (-v).bit_length()


def _encode_block(bw: _BitWriter, zz: np.ndarray, prev_dc: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    diff = int(zz[0]) - prev_dc
    s = _magnitude(diff)
    bw.put(*dc_codes[s])
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*ac_codes[0xF0])    # ZRL
            run -= 16
        s = _magnitude(v)
        bw.put(*ac_codes[(run << 4) | s])
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        bw.put(*ac_codes[0x00])        # EOB
    return int(zz[0])


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _plane_blocks(plane: np.ndarray, mult: int = 8
                  ) -> tuple[np.ndarray, int, int]:
    """Edge-replicate to multiples of `mult` (8, or 16 for the luma plane
    of a 4:2:0 MCU grid), return (blocks[by, bx, 8, 8], nby, nbx)."""
    h, w = plane.shape
    ph, pw = -h % mult, -w % mult
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    nby, nbx = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = padded.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    return blocks, nby, nbx


def _downsample2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-mean chroma downsample (the deterministic filter this codec
    defines for 4:2:0 — T.81 leaves the filter to the encoder). Odd edges
    are edge-replicated before averaging."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return (p[0::2, 0::2] + p[0::2, 1::2]
            + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0


def encode_jpeg(width: int, height: int, pixels: bytes, channels: int = 1,
                quality: int = 50, subsampling: str = "444") -> bytes:
    """pixels = row-major interleaved 8-bit samples (1=gray, 3=RGB).
    subsampling: "444" (every component full resolution — the default and
    the exact-roundtrip-oracle setting) or "420" (color only: chroma
    downsampled 2x2 box-mean, Y coded as 2x2 blocks per MCU per T.81
    A.2.3 interleaving — the dominant real-world layout)."""
    if channels not in (1, 3):
        raise JpegFormatError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise JpegFormatError("pixel buffer does not match dims")
    if width <= 0 or height <= 0 or width > 65535 or height > 65535:
        raise JpegFormatError(f"bad dims {width}x{height}")
    if subsampling not in ("444", "420"):
        raise JpegFormatError(f"unsupported subsampling {subsampling!r}")
    sub420 = subsampling == "420" and channels == 3

    qtabs = quant_tables(quality)
    arr = np.frombuffer(pixels, np.uint8).astype(np.float64).reshape(
        height, width, channels)
    if channels == 3:
        planes = _rgb_to_ycbcr(arr)
        planes = [planes[..., c] for c in range(3)]
        qsel = [0, 1, 1]
    else:
        planes = [arr[..., 0]]
        qsel = [0]

    dc_l = _canonical_codes(*_DC_LUMA_SPEC)
    ac_l = _canonical_codes(*_AC_LUMA_SPEC)
    dc_c = _canonical_codes(*_DC_CHROMA_SPEC)
    ac_c = _canonical_codes(*_AC_CHROMA_SPEC)
    huff = [(dc_l, ac_l), (dc_c, ac_c)]
    zz = np.array(ZIGZAG)

    def quantize(plane, qi, mult):
        blocks, nby, nbx = _plane_blocks(plane, mult)
        f = np.einsum("ux,byxw,wv->byuv", _DCT_A, blocks - 128.0, _DCT_A.T)
        q = np.round(f / qtabs[qi]).astype(np.int32)
        return q.reshape(nby, nbx, 64)[:, :, zz], nby, nbx

    bw = _BitWriter()
    if sub420:
        # Y at full res padded to the 16-px MCU grid; chroma box-mean
        # downsampled then padded to its own 8-px grid — the two grids
        # cover the same MCU count by construction.
        zzY, nbyY, nbxY = quantize(planes[0], 0, 16)
        zzCb, ncy, ncx = quantize(_downsample2(planes[1]), 1, 8)
        zzCr, _, _ = quantize(_downsample2(planes[2]), 1, 8)
        mcuy, mcux = nbyY // 2, nbxY // 2
        assert (ncy, ncx) == (mcuy, mcux)
        prev = [0, 0, 0]
        for my in range(mcuy):
            for mx in range(mcux):
                for r in range(2):          # 4 Y blocks, row-major (A.2.3)
                    for c in range(2):
                        prev[0] = _encode_block(
                            bw, zzY[2 * my + r, 2 * mx + c], prev[0],
                            dc_l, ac_l)
                prev[1] = _encode_block(bw, zzCb[my, mx], prev[1], dc_c, ac_c)
                prev[2] = _encode_block(bw, zzCr[my, mx], prev[2], dc_c, ac_c)
        samp = [0x22, 0x11, 0x11]
    else:
        comps = []
        nby = nbx = 0
        for plane, qi in zip(planes, qsel):
            czz, nby, nbx = quantize(plane, qi, 8)
            comps.append(czz)
        prev = [0] * len(comps)
        for by in range(nby):
            for bx in range(nbx):
                for ci, comp in enumerate(comps):
                    tsel = 0 if ci == 0 else 1
                    prev[ci] = _encode_block(bw, comp[by, bx], prev[ci],
                                             huff[tsel][0], huff[tsel][1])
        samp = [0x11] * channels
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(JPEG_SOI)
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    for ti in range(2 if channels == 3 else 1):
        tab = qtabs[ti].reshape(64)[zz]        # stored in zigzag order
        out += seg(0xFFDB, bytes([ti]) + bytes(int(v) for v in tab))
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        sof += bytes([ci + 1, samp[ci], qsel[ci]])
    out += seg(0xFFC0, sof)
    specs = [(0x00, _DC_LUMA_SPEC), (0x10, _AC_LUMA_SPEC)]
    if channels == 3:
        specs += [(0x01, _DC_CHROMA_SPEC), (0x11, _AC_CHROMA_SPEC)]
    for tc, (bits, vals) in specs:
        out += seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))
    sos = bytes([channels])
    for ci in range(channels):
        tsel = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder -----------------------------------------------------------------


def jpeg_meta(data: bytes) -> tuple[int, int, int]:
    """(width, height, n_components) from the SOF0 header — marker walk
    only, never touches entropy-coded data (cheap metadata scans)."""
    if data[:2] != JPEG_SOI:
        raise JpegFormatError("not a JPEG")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise JpegFormatError(f"bad marker sync at {pos}")
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if marker in (0xC0, 0xC1):
            if pos + 4 + 6 > len(data):
                raise JpegFormatError("truncated SOF")
            _prec, h, w, ncomp = struct.unpack(">BHHB", data[pos + 4:pos + 10])
            return w, h, ncomp
        if marker in (0xC2, 0xC3) or 0xC5 <= marker <= 0xCF and marker != 0xC8:
            raise JpegFormatError(f"unsupported SOF marker 0xFF{marker:02X} "
                                  "(baseline sequential only)")
        if marker == 0xD9:
            break
        pos += 2 + seglen
    raise JpegFormatError("no SOF0 before end of stream")


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    RSTn markers surface via `restart()`, any other marker ends the scan."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.hit_marker = False

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise JpegFormatError("truncated entropy stream")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
                self._acc = (self._acc << 8) | 0xFF
                self._n += 8
                return
            self.hit_marker = True
            raise JpegFormatError("entropy stream ended at marker")
        self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an expected RSTn marker."""
        self._acc = 0
        self._n = 0
        if (self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF
                and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
            self.pos += 2
        else:
            raise JpegFormatError("missing restart marker")


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegFormatError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes, max_pixels: int = MAX_PIXELS
                ) -> tuple[int, int, int, bytes]:
    """Full decode → (width, height, channels, row-major interleaved
    samples). Gray JPEGs return channels=1, color returns RGB."""
    if data[:2] != JPEG_SOI:
        raise JpegFormatError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    pos = 2
    while True:
        if pos + 2 > len(data):
            raise JpegFormatError("truncated before SOS")
        if data[pos] != 0xFF:
            raise JpegFormatError(f"bad marker sync at {pos}")
        marker = data[pos + 1]
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
            raise JpegFormatError("EOI before SOS")
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegFormatError("truncated segment")
        if marker == 0xDB:                      # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                if len(body) < p + 65:
                    raise JpegFormatError("truncated DQT")
                tab = np.zeros(64, np.int32)
                tab[list(ZIGZAG)] = list(body[p + 1:p + 65])
                qt[tq] = tab.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC1):            # SOF0/1 (baseline huffman)
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise JpegFormatError(f"unsupported precision {prec}")
            if ncomp not in (1, 3):
                raise JpegFormatError(f"unsupported component count {ncomp}")
            if w * h > max_pixels:
                raise JpegFormatError(
                    f"dims too large ({w}x{h} > {max_pixels} px)")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise JpegFormatError(f"bad sampling factors {hi}x{vi}")
                comps.append((cid, tq, hi, vi))
            if ncomp == 1:
                # a single-component frame is coded non-interleaved; its
                # sampling factors do not affect the block grid (T.81 A.2.2)
                comps = [(comps[0][0], comps[0][1], 1, 1)]
            sof = (w, h, comps)
        elif 0xC2 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            raise JpegFormatError(f"unsupported SOF marker 0xFF{marker:02X} "
                                  "(baseline sequential only)")
        elif marker == 0xC4:                    # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0x0F
                bits = tuple(body[p + 1:p + 17])
                n = sum(bits)
                vals = tuple(body[p + 17:p + 17 + n])
                if len(vals) != n:
                    raise JpegFormatError("truncated DHT")
                huff[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xDD:                    # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:                    # SOS: entropy data follows
            if sof is None:
                raise JpegFormatError("SOS before SOF")
            ns = body[0]
            scan_sel = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan_sel.append((cs, tt >> 4, tt & 0x0F))
            pos = pos + 2 + seglen
            break
        # APPn / COM / anything else with a length: skip
        pos += 2 + seglen

    w, h, comps = sof
    if len(scan_sel) != len(comps):
        raise JpegFormatError("scan does not cover all components")
    order = []
    for cs, td, ta in scan_sel:
        match = [i for i, c in enumerate(comps) if c[0] == cs]
        if not match:
            raise JpegFormatError(f"scan references unknown component {cs}")
        ci = match[0]
        if comps[ci][1] not in qt:
            raise JpegFormatError(f"missing quant table {comps[ci][1]}")
        if (0, td) not in huff or (1, ta) not in huff:
            raise JpegFormatError("missing Huffman table")
        order.append((ci, qt[comps[ci][1]], huff[(0, td)], huff[(1, ta)]))

    # MCU geometry (T.81 A.2.3/A.2.4): each MCU carries hi*vi blocks of
    # component i, row-major; the MCU grid is sized by the max factors.
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    for _, _, hi, vi in comps:
        if hmax % hi or vmax % vi:
            raise JpegFormatError(
                f"non-integer subsampling ratio {hi}x{vi} vs {hmax}x{vmax}")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * vi * 8, mcux * hi * 8), np.float64)
              for _, _, hi, vi in comps]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    zznat = np.array(ZIGZAG)
    mcu = 0

    def read_block(q, dct_tab, act_tab, ci):
        zz = np.zeros(64, np.int64)
        s = _decode_huff(br, dct_tab)
        if s > 11:
            raise JpegFormatError(f"bad DC category {s}")
        diff = _extend(br.bits(s), s) if s else 0
        pred[ci] += diff
        zz[0] = pred[ci]
        k = 1
        while k < 64:
            rs = _decode_huff(br, act_tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r == 15:
                    k += 16             # ZRL
                    continue
                break                   # EOB
            k += r
            if k > 63:
                raise JpegFormatError("AC run past block end")
            zz[k] = _extend(br.bits(s), s)
            k += 1
        coef = np.zeros(64, np.float64)
        coef[zznat] = zz * q.reshape(64)[zznat]
        return _DCT_A.T @ coef.reshape(8, 8) @ _DCT_A

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                br.restart()
                pred = [0] * len(comps)
            for ci, q, dct_tab, act_tab in order:
                hi, vi = comps[ci][2], comps[ci][3]
                for r in range(vi):
                    for c in range(hi):
                        by, bx = my * vi + r, mx * hi + c
                        planes[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = (
                            read_block(q, dct_tab, act_tab, ci) + 128.0)
            mcu += 1

    # upsample subsampled components by sample replication (the decoder's
    # defined filter — T.81 leaves it open; replication keeps the twin
    # proof exact), then crop every plane to the declared dims
    cropped = []
    for (_, _, hi, vi), p in zip(comps, planes):
        if hi != hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        if vi != vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        cropped.append(p[:h, :w])
    if len(cropped) == 3:
        rgb = _ycbcr_to_rgb(np.stack(cropped, axis=-1))
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        return w, h, 3, out.tobytes()
    out = np.clip(np.round(cropped[0]), 0, 255).astype(np.uint8)
    return w, h, 1, out.tobytes()
