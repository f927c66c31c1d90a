"""JFIF/JPEG codec (ITU-T T.81) — struct + numpy only, no codec library.

Encode: 8-bit grayscale / color (JFIF YCbCr 4:4:4 or — r5 — 4:2:0 with
2x2 box-mean chroma and T.81 A.2.3 MCU interleaving) / Adobe
4-component CMYK and YCCK (APP14 transform 0 / 2), ISO/IEC 10918-1
Annex K quantization tables scaled by an IJG-style quality factor,
Annex K "typical" Huffman tables, partial edge blocks padded by edge
replication; sequential (SOF0) or — r5 — progressive (SOF2, Annex G:
spectral selection + one successive-approximation level, the libjpeg
scan-script shape). Decode: both frame types with GENERIC sampling
factors (1..4 each axis, integer ratios — 4:4:4 / 4:2:2 / 4:2:0 /
4:1:1) and 1/3/4 components — SOI/APPn/COM/DQT/SOF0-2/DHT/DRI/SOS
marker walk with Adobe APP14 color-transform detection, canonical
Huffman decode with 0xFF00 byte-unstuffing and RSTn handling, per-scan
coefficient accumulation (interleaved MCU order or the component's own
block grid), dequant + de-zigzag + batched float IDCT, level shift,
sample-replication upsampling, YCbCr→RGB / (YCCK|CMYK)→RGB via the
stored-domain quick conversion, crop to declared dims. Together this
covers virtually every JPEG in a real crawl — including (r6)
arithmetic-coded SOF9/SOF10 frames via the QM-coder in
functions/jpeg_arith.py, 12-bit-precision DCT in grayscale AND color
(chroma centered at 2^(P-1); normalized to v >> 4 at the 8-bit output
contract) and LOSSLESS SOF3 at 2..16-bit (functions/jpeg_lossless.py,
exact roundtrip); only hierarchical frames are rejected.

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

Outside this module: compressed-audio CONTAINER metadata is parsed
natively (functions/mp3.py, flac_ogg.py) and PCM decode routes through
the capability-gated ffmpeg adapter (functions/codec_adapters.py);
motion-compensated video (H.264-class) frame decode remains the one
hard library boundary (operators/multimodal.py documents why).
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SOI = b"\xff\xd8"

# Decompression-bomb guard, same rationale as png.MAX_PIXELS: SOF0 dims
# are attacker-controlled 16-bit fields (65535x65535 -> ~4.3e9 samples).
MAX_PIXELS = 64_000_000

# Lossless (SOF3) decodes per-sample in pure Python (the entropy stream
# is inherently serial — variable-length categories gate every sample),
# so it gets its OWN tighter work-bomb cap, the Adam7/APNG precedent: a
# 64 MP claim against the DCT cap would be minutes of CPU from one
# crafted file; 2 MP is seconds and covers the DNG-thumbnail/DICOM-slice
# sizes this family actually ships at.
MAX_LOSSLESS_PIXELS = 2_000_000


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


def _rgb_to_ycbcr(rgb: np.ndarray, mid: float = 128.0) -> np.ndarray:
    # chroma centering scales with sample precision: 128 for 8-bit,
    # 2048 for 12-bit (JFIF's offset is 2^(P-1))
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = mid - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = mid + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray, mid: float = 128.0) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - mid, ycc[..., 2] - mid
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
                quality: int = 50, subsampling: str = "444",
                progressive: bool = False, ycck: bool = False) -> bytes:
    """pixels = row-major interleaved 8-bit samples (1=gray, 3=RGB,
    4=Adobe stored-domain CMYK — see ycck).
    subsampling: "444" (every component full resolution — the default and
    the exact-roundtrip-oracle setting) or "420" (color only: chroma
    downsampled 2x2 box-mean, Y coded as 2x2 blocks per MCU per T.81
    A.2.3 interleaving — the dominant real-world layout).
    progressive: emit a SOF2 multi-scan file (T.81 Annex G) with BOTH
    spectral selection and one successive-approximation level (Al=1):
    interleaved DC first scan, per-component AC first scans, DC
    refinement (raw bits), per-component AC refinement — the scan script
    shape real encoders ship. The quantized coefficients are IDENTICAL to
    the sequential encoding, so both decode to bit-identical pixels (the
    progressive twin proof in tests/test_codec_properties.py).
    ycck (channels=4 only): False = APP14 transform 0, four stored-domain
    planes coded directly on luma tables (libjpeg JCS_CMYK); True =
    transform 2, stored CMY through YCbCr with K direct (JCS_YCCK, the
    Photoshop layout)."""
    if channels not in (1, 3, 4):
        raise JpegFormatError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise JpegFormatError("pixel buffer does not match dims")
    if width <= 0 or height <= 0 or width > 65535 or height > 65535:
        raise JpegFormatError(f"bad dims {width}x{height}")
    if subsampling not in ("444", "420"):
        raise JpegFormatError(f"unsupported subsampling {subsampling!r}")
    if subsampling == "420" and channels != 3:
        # silently ignoring the request would hand callers a 4:4:4 file
        # they believe is subsampled (review-caught r5)
        raise JpegFormatError(
            "subsampling='420' is a color (channels=3) mode")
    sub420 = subsampling == "420"

    qtabs = quant_tables(quality)
    arr = np.frombuffer(pixels, np.uint8).astype(np.float64).reshape(
        height, width, channels)
    if channels == 3:
        planes = _rgb_to_ycbcr(arr)
        planes = [planes[..., c] for c in range(3)]
        qsel = [0, 1, 1]
        tsels = [0, 1, 1]
    elif channels == 4:
        # Adobe 4-component: callers pass STORED-domain samples (the
        # inverted-ink convention, S = 255 - ink). ycck=False codes the
        # four planes directly on the luma tables (libjpeg JCS_CMYK,
        # APP14 transform 0); ycck=True color-transforms the stored CMY
        # through YCbCr with K direct (JCS_YCCK, transform 2 — what
        # Photoshop writes), Y/K on luma tables, Cb/Cr on chroma.
        if ycck:
            ycc = _rgb_to_ycbcr(arr[..., :3])
            planes = [ycc[..., c] for c in range(3)] + [arr[..., 3]]
            qsel = [0, 1, 1, 0]
            tsels = [0, 1, 1, 0]
        else:
            planes = [arr[..., c] for c in range(4)]
            qsel = [0, 0, 0, 0]
            tsels = [0, 0, 0, 0]
    else:
        planes = [arr[..., 0]]
        qsel = [0]
        tsels = [0]

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

    if progressive:
        if sub420:
            comps_zz = [quantize(planes[0], 0, 16)[0],
                        quantize(_downsample2(planes[1]), 1, 8)[0],
                        quantize(_downsample2(planes[2]), 1, 8)[0]]
            samp_hv = [(2, 2), (1, 1), (1, 1)]
        else:
            comps_zz = [quantize(p, qi, 8)[0]
                        for p, qi in zip(planes, qsel)]
            samp_hv = [(1, 1)] * channels
        return _encode_progressive(width, height, channels, qtabs, qsel,
                                   comps_zz, samp_hv, tsels,
                                   2 if (channels == 4 and ycck) else 0)

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
                    tsel = tsels[ci]
                    prev[ci] = _encode_block(bw, comp[by, bx], prev[ci],
                                             huff[tsel][0], huff[tsel][1])
        samp = [0x11] * channels
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(_header_segments(
        0xFFC0, width, height, channels, qtabs, qsel, samp, tsels,
        (2 if ycck else 0) if channels == 4 else None))
    sos = bytes([channels])
    for ci in range(channels):
        tsel = tsels[ci]
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)


def _header_segments(sof_marker, width, height, channels, qtabs, qsel,
                     samp_bytes, tsels, adobe_transform=None) -> bytes:
    """SOI through the last DHT — the marker prefix SHARED by the
    sequential and progressive encoders (review-caught r5: two divergent
    copies would silently break the progressive-equals-sequential twin
    proof). adobe_transform None = no APP14 segment."""
    zz = np.array(ZIGZAG)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(JPEG_SOI)
    out += seg(0xFFE0,
               b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0))
    if adobe_transform is not None:
        # APP14 Adobe marker: ColorTransform 0 = direct planes, 2 = YCCK
        out += seg(0xFFEE, b"Adobe" + struct.pack(">HHHB", 100, 0, 0,
                                                  adobe_transform))
    for ti in range(max(qsel) + 1):
        tab = qtabs[ti].reshape(64)[zz]        # stored in zigzag order
        out += seg(0xFFDB, bytes([ti]) + bytes(int(v) for v in tab))
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for ci in range(channels):
        sof += bytes([ci + 1, samp_bytes[ci], qsel[ci]])
    out += seg(sof_marker, sof)
    specs = [(0x00, _DC_LUMA_SPEC), (0x10, _AC_LUMA_SPEC)]
    if any(t == 1 for t in tsels):
        specs += [(0x01, _DC_CHROMA_SPEC), (0x11, _AC_CHROMA_SPEC)]
    for tc, (bits, vals) in specs:
        out += seg(0xFFC4, bytes([tc]) + bytes(bits) + bytes(vals))
    return bytes(out)


def _enc_ac_first_block(bw, zz, al, ac_codes) -> None:
    """AC band 1..63 first pass at point transform Al (sign-magnitude
    shift, T.81 G.1.2.2); end-of-band coded as EOB0 per block."""
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*ac_codes[0xF0])             # ZRL
            run -= 16
        s = t.bit_length()
        bw.put(*ac_codes[(run << 4) | s])
        tv = t if v >= 0 else -t
        bw.put(tv if tv >= 0 else tv + (1 << s) - 1, s)
        run = 0
    if run > 0:
        bw.put(*ac_codes[0x00])                 # EOB0


def _enc_ac_refine_block(bw, zz, al, ac_codes) -> None:
    """AC successive-approximation refinement (T.81 G.1.2.3, the
    jcphuff.c shape): newly nonzero coefficients (magnitude exactly 1 at
    this level) emit (run, 1) + sign; coefficients already nonzero emit
    one buffered correction bit, flushed after each symbol."""
    run = 0
    pending: list[int] = []
    eob = 0                         # index of the LAST newly-nonzero coef
    for k in range(1, 64):
        if (abs(int(zz[k])) >> al) == 1:
            eob = k
    for k in range(1, 64):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            run += 1
            continue
        # ZRLs must be emitted BEFORE buffering this coefficient's bit so
        # every pending correction sits inside the decoder's 16-zero ZRL
        # span; ZRLs foldable into the trailing EOB are skipped (k > eob)
        while run > 15 and k <= eob:
            bw.put(*ac_codes[0xF0])
            run -= 16
            for b in pending:
                bw.put(b, 1)
            pending = []
        if t > 1:                               # already nonzero: correction
            pending.append(t & 1)
            continue
        bw.put(*ac_codes[(run << 4) | 1])
        bw.put(1 if v >= 0 else 0, 1)
        for b in pending:
            bw.put(b, 1)
        pending = []
        run = 0
    if run > 0 or pending:
        bw.put(*ac_codes[0x00])                 # EOB0
        for b in pending:
            bw.put(b, 1)


def _encode_progressive(width, height, channels, qtabs, qsel, comps_zz,
                        samp_hv, tsels, adobe_transform=0) -> bytes:
    """Assemble a SOF2 progressive file from per-component quantized
    zigzag coefficient arrays. Scan script (the shape libjpeg's default
    ships, at one successive-approximation level): interleaved DC first
    (Al=1) → per-component AC first (Ss=1..63, Al=1) → interleaved DC
    refinement (raw bits) → per-component AC refinement."""
    zz = np.array(ZIGZAG)
    dc_codes = [_canonical_codes(*_DC_LUMA_SPEC),
                _canonical_codes(*_DC_CHROMA_SPEC)]
    ac_codes = [_canonical_codes(*_AC_LUMA_SPEC),
                _canonical_codes(*_AC_CHROMA_SPEC)]
    hmax = max(hv[0] for hv in samp_hv)
    vmax = max(hv[1] for hv in samp_hv)
    mcuy = comps_zz[0].shape[0] // samp_hv[0][1]
    mcux = comps_zz[0].shape[1] // samp_hv[0][0]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    def dc_scan(ah: int, al: int) -> bytes:
        bw = _BitWriter()
        pred = [0] * channels
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(channels):
                    hi, vi = samp_hv[ci]
                    tsel = tsels[ci]
                    for r in range(vi):
                        for c in range(hi):
                            v = int(comps_zz[ci][my * vi + r, mx * hi + c, 0])
                            if ah == 0:
                                d = (v >> al) - pred[ci]
                                pred[ci] = v >> al
                                s = _magnitude(d)
                                bw.put(*dc_codes[tsel][s])
                                if s:
                                    bw.put(d if d >= 0 else d + (1 << s) - 1,
                                           s)
                            else:
                                bw.put((v >> al) & 1, 1)
        bw.flush()
        body = bytes([channels])
        for ci in range(channels):
            body += bytes([ci + 1, tsels[ci] << 4])
        body += bytes([0, 0, (ah << 4) | al])
        return seg(0xFFDA, body) + bytes(bw.buf)

    def ac_scan(ci: int, ah: int, al: int) -> bytes:
        # non-interleaved: the component's TRUE block grid (T.81 A.2.2),
        # which can be smaller than the MCU-padded coefficient array
        hi, vi = samp_hv[ci]
        nbxc = ((width * hi + hmax - 1) // hmax + 7) // 8
        nbyc = ((height * vi + vmax - 1) // vmax + 7) // 8
        tsel = tsels[ci]
        bw = _BitWriter()
        for by in range(nbyc):
            for bx in range(nbxc):
                if ah == 0:
                    _enc_ac_first_block(bw, comps_zz[ci][by, bx], al,
                                        ac_codes[tsel])
                else:
                    _enc_ac_refine_block(bw, comps_zz[ci][by, bx], al,
                                         ac_codes[tsel])
        bw.flush()
        body = bytes([1, ci + 1, tsel]) + bytes([1, 63, (ah << 4) | al])
        return seg(0xFFDA, body) + bytes(bw.buf)

    out = bytearray(_header_segments(
        0xFFC2, width, height, channels, qtabs, qsel,
        [(hi << 4) | vi for hi, vi in samp_hv], tsels,
        adobe_transform if channels == 4 else None))
    out += dc_scan(0, 1)                        # DC first, Al=1
    for ci in range(channels):
        out += ac_scan(ci, 0, 1)                # AC first per component
    out += dc_scan(1, 0)                        # DC refinement
    for ci in range(channels):
        out += ac_scan(ci, 1, 0)                # AC refinement
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
        if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA):
            if pos + 4 + 6 > len(data):
                raise JpegFormatError("truncated SOF")
            _prec, h, w, ncomp = struct.unpack(">BHHB", data[pos + 4:pos + 10])
            return w, h, ncomp
        if marker in (0xC5, 0xC6, 0xC7, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegFormatError(
                f"unsupported SOF marker 0xFF{marker:02X} "
                "(sequential/progressive, huffman or arithmetic)")
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

    def _try_fill(self) -> bool:
        """Non-raising _fill: False (nothing consumed) at EOF / a marker.
        Used by the batched fast paths to top the accumulator up WITHOUT
        changing error semantics — when it returns False the caller falls
        back to the raising path, which reports the same condition the
        bit-at-a-time reader always did."""
        data, pos = self.data, self.pos
        if pos >= len(data):
            return False
        b = data[pos]
        if b == 0xFF:
            if pos + 1 < len(data) and data[pos + 1] == 0x00:
                self.pos = pos + 2
                self._acc = (self._acc << 8) | 0xFF
                self._n += 8
                return True
            return False
        self.pos = pos + 1
        self._acc = (self._acc << 8) | b
        self._n += 8
        return True

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        v = (self._acc >> self._n) & 1
        self._acc &= (1 << self._n) - 1     # drop consumed bits (see bits())
        return v

    def bits(self, n: int) -> int:
        while self._n < n:
            if not self._try_fill():
                # reproduce the exact bit-at-a-time error behavior:
                # consume what is buffered, then raise from _fill
                v = 0
                for _ in range(n):
                    v = (v << 1) | self.bit()
                return v
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        # mask consumed bits away: without this the accumulator grows 8 bits
        # per entropy byte and every shift copies the whole scan history —
        # O(scan_bytes²) decode (review-caught r5; 28.7 -> 16.9 ms on a
        # 320x240 q75 scan, and quadratically worse on bigger frames)
        self._acc &= (1 << self._n) - 1
        return v

    def restart(self) -> None:
        """Byte-align and consume an expected RSTn marker. An unread
        stuffed pad byte (0xFF 0x00 — a 1-filled final byte the decoder
        never pulled bits from) and 0xFF fill bytes (B.1.1.2) may
        legally precede the marker; skip both."""
        self._acc = 0
        self._n = 0
        d, p = self.data, self.pos
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0x00:
            p += 2
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1
        if p + 1 < len(d) and d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
            self.pos = p + 2
        else:
            raise JpegFormatError("missing restart marker")


def _decode_huff(br: _BitReader, table: dict) -> int:
    # fast path: with >=16 buffered bits the whole walk is local shifts
    # (one dict probe per length, zero reader calls). Together with the
    # consumed-bit masking in the reader this measured 2.9x end-to-end on
    # 320x240 photos (48.4 -> 16.8 ms at 4:2:0 q75) and made decode linear
    # in scan bytes; what remains is the per-coefficient run loop in
    # _dec_ac_first, inherent to a pure-Python entropy decode
    n = br._n
    while n < 16:
        if not br._try_fill():
            break
        n = br._n
    acc = br._acc
    if n >= 16:
        get = table.get
        for length in range(1, 17):
            sym = get((length, (acc >> (n - length)) & ((1 << length) - 1)))
            if sym is not None:
                br._n = n - length
                br._acc = acc & ((1 << br._n) - 1)   # drop consumed bits
                return sym
        raise JpegFormatError("invalid Huffman code")
    # slow path (scan tail, next to a marker): bit-at-a-time, preserving
    # the exact truncation/marker error behavior
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise JpegFormatError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _ScanState:
    """Per-scan entropy state: DC predictors (per component) + the
    progressive AC end-of-band run (T.81 G.1.2.2)."""

    __slots__ = ("pred", "eobrun")

    def __init__(self, ncomp: int) -> None:
        self.pred = [0] * ncomp
        self.eobrun = 0

    def reset(self) -> None:
        self.pred = [0] * len(self.pred)
        self.eobrun = 0


def _dec_dc(br, st, ci, coef, dct_tab, ah, al):
    """DC coefficient of one block: first pass (diff-coded in the
    point-transformed domain) or successive-approximation refinement
    (one raw bit per block, T.81 G.1.2.1)."""
    if ah == 0:
        s = _decode_huff(br, dct_tab)
        if s > 11:
            raise JpegFormatError(f"bad DC category {s}")
        st.pred[ci] += _extend(br.bits(s), s) if s else 0
        coef[0] = st.pred[ci] << al
    else:
        if br.bit():
            coef[0] |= 1 << al


def _dec_ac_first(br, st, coef, act_tab, ss, se, al):
    """AC band Ss..Se, first pass at point transform Al (also the
    sequential-baseline AC path: ss=1, se=63, al=0, where every EOB is
    EOB0 so the run arithmetic degenerates to plain end-of-block)."""
    if st.eobrun > 0:
        st.eobrun -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_huff(br, act_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16                 # ZRL
                continue
            st.eobrun = (1 << r) - 1    # EOBn (T.81 G.1.2.2)
            if r:
                st.eobrun += br.bits(r)
            break
        k += r
        if k > se:
            raise JpegFormatError("AC run past band end")
        coef[k] = _extend(br.bits(s), s) * (1 << al)
        k += 1


def _dec_ac_refine(br, st, coef, act_tab, ss, se, al):
    """AC successive-approximation refinement (T.81 G.1.2.3): newly
    nonzero coefficients arrive as (run, 1) symbols; coefficients already
    nonzero from earlier scans each carry one correction bit, including
    inside ZRL runs and end-of-band runs."""
    p1, m1 = 1 << al, -1 << al

    def correct(k):
        if br.bit() and (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else m1

    k = ss
    if st.eobrun == 0:
        while k <= se:
            rs = _decode_huff(br, act_tab)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r < 15:              # EOBn: rest of band is corrections
                    st.eobrun = 1 << r
                    if r:
                        st.eobrun += br.bits(r)
                    break
                newval = None           # ZRL: skip 16 zero-history coeffs
            else:
                if s != 1:
                    raise JpegFormatError("bad refinement magnitude")
                newval = p1 if br.bit() else m1
            while k <= se:              # advance r zero-history positions
                if coef[k] != 0:
                    correct(k)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval is not None:
                if k > se:
                    raise JpegFormatError("refinement run past band end")
                coef[k] = newval
            k += 1
    if st.eobrun > 0:
        while k <= se:                  # corrections for the rest of band
            if coef[k] != 0:
                correct(k)
            k += 1
        st.eobrun -= 1


def _next_marker(data: bytes, pos: int) -> int:
    """Advance past entropy-coded data to the next true marker (skipping
    stuffed FF00 and the scan's RSTn separators)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00 or nxt == 0xFF or 0xD0 <= nxt <= 0xD7:
            pos += 2 if nxt != 0xFF else 1
            continue
        return pos
    return n


def _parse_dqt(body: bytes, qt: dict) -> None:
    p = 0
    while p < len(body):
        pq, tq = body[p] >> 4, body[p] & 0x0F
        if pq not in (0, 1):
            raise JpegFormatError(f"bad DQT precision {pq}")
        # Pq=1: 16-bit big-endian entries (extended sequential /
        # progressive frames; T.81 B.2.4.1)
        step = 1 if pq == 0 else 2
        if len(body) < p + 1 + 64 * step:
            raise JpegFormatError("truncated DQT")
        raw = body[p + 1:p + 1 + 64 * step]
        ent = (list(raw) if pq == 0
               else list(struct.unpack(">64H", raw)))
        tab = np.zeros(64, np.int32)
        tab[list(ZIGZAG)] = ent
        qt[tq] = tab.reshape(8, 8)
        p += 1 + 64 * step


def _parse_dht(body: bytes, huff: dict) -> None:
    p = 0
    while p < len(body):
        tc, th = body[p] >> 4, body[p] & 0x0F
        if p + 17 > len(body):          # BITS array itself cut off
            raise JpegFormatError("truncated DHT")
        bits = tuple(body[p + 1:p + 17])
        n = sum(bits)
        vals = tuple(body[p + 17:p + 17 + n])
        if len(vals) != n:
            raise JpegFormatError("truncated DHT")
        huff[(tc, th)] = _decode_table(bits, vals)
        p += 17 + n


def _parse_sof(marker: int, body: bytes, max_pixels: int):
    """One SOF header → (sof, geom, coefs). Differential hierarchical
    frames (SOF5/7) share the layout of their non-differential twins
    (SOF1/3); the caller tracks differential-ness separately."""
    lossless = marker in (0xC3, 0xC7)
    if len(body) < 6:
        raise JpegFormatError("truncated SOF body")
    prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
    # 12-bit precision (r6): extended sequential / progressive
    # frames only (T.81 restricts SOF0 baseline to 8-bit),
    # grayscale or YCbCr color (chroma centering scales to
    # 2^(P-1)); Adobe 4-component stays 8-bit. Lossless (Annex H)
    # allows 2..16-bit (components independent, no transform).
    if lossless:
        if not 2 <= prec <= 16:
            raise JpegFormatError(f"unsupported precision {prec}")
    elif prec not in (8, 12) or (marker == 0xC0 and prec != 8):
        raise JpegFormatError(f"unsupported precision {prec}")
    if ncomp not in (1, 3, 4):
        raise JpegFormatError(f"unsupported component count {ncomp}")
    if prec == 12 and not lossless and ncomp not in (1, 3):
        raise JpegFormatError(
            "12-bit precision supported for 1 or 3 components")
    if lossless and ncomp not in (1, 3):
        raise JpegFormatError(
            "lossless supported for 1 or 3 components")
    if w * h > max_pixels:
        raise JpegFormatError(
            f"dims too large ({w}x{h} > {max_pixels} px)")
    if len(body) < 6 + 3 * ncomp:
        raise JpegFormatError("truncated SOF component specs")
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
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    for _, _, hi, vi in comps:
        if hmax % hi or vmax % vi:
            raise JpegFormatError(
                f"non-integer subsampling ratio {hi}x{vi} "
                f"vs {hmax}x{vmax}")
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    geom = (hmax, vmax, mcux, mcuy)
    if lossless:
        if hmax != 1 or vmax != 1:
            raise JpegFormatError(
                "lossless supported at 1x1 sampling only")
        if w * h * ncomp > MAX_LOSSLESS_PIXELS:
            raise JpegFormatError(
                f"lossless dims too large ({w}x{h}x{ncomp} > "
                f"{MAX_LOSSLESS_PIXELS} samples)")
        # sample planes, not coefficient planes
        coefs = [np.zeros((h, w), np.int32) for _ in comps]
    else:
        coefs = [np.zeros((mcuy * vi, mcux * hi, 64), np.int64)
                 for _, _, hi, vi in comps]
    sof = (w, h, comps, marker in (0xC2, 0xCA),
           marker in (0xC9, 0xCA), prec, lossless)
    return sof, geom, coefs


def decode_jpeg(data: bytes, max_pixels: int = MAX_PIXELS
                ) -> tuple[int, int, int, bytes]:
    """Full decode → (width, height, channels, row-major interleaved
    samples). Gray JPEGs return channels=1, color returns RGB. Handles
    baseline sequential (SOF0/1) and progressive (SOF2 — spectral
    selection AND successive approximation, multi-scan) frames with
    generic sampling factors; every scan accumulates into per-component
    coefficient planes and one shared reconstruction dequantizes,
    inverse-transforms, upsamples and crops."""
    if data[:2] != JPEG_SOI:
        raise JpegFormatError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    # arithmetic conditioning (DAC, T.81 B.2.4.3); keys are table ids
    arith_cond = {"dc": {}, "ac": {}}
    sof = None
    restart_interval = 0
    adobe_transform = None
    geom = None        # (hmax, vmax, mcux, mcuy) once SOF is known
    coefs = None       # per-component (nby, nbx, 64) zigzag-order int arrays
    nscans = 0
    pos = 2
    while True:
        if pos + 2 > len(data):
            if nscans:
                break                   # missing EOI after a complete scan
            raise JpegFormatError("truncated before SOS")
        if data[pos] != 0xFF:
            raise JpegFormatError(f"bad marker sync at {pos}")
        while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1                    # fill bytes before marker (B.1.1.2)
        if pos + 2 > len(data):
            if nscans:
                break
            raise JpegFormatError("truncated before SOS")
        marker = data[pos + 1]
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:              # EOI
            if nscans == 0:
                raise JpegFormatError("EOI before SOS")
            break
        if pos + 4 > len(data):         # marker byte arrived, length didn't
            if nscans:
                break
            raise JpegFormatError("truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegFormatError("truncated segment")
        if marker == 0xDB:                      # DQT
            _parse_dqt(body, qt)
        elif marker in (0xC0, 0xC1, 0xC2,       # SOF0/1 baseline, SOF2 prog.
                        0xC3,                   # SOF3 lossless (r6)
                        0xC9, 0xCA):            # SOF9/10 arithmetic (r6)
            if sof is not None:
                raise JpegFormatError("multiple SOF markers")
            sof, geom, coefs = _parse_sof(marker, body, max_pixels)
        elif marker == 0xDE:                    # DHP: hierarchical (r7)
            from flink_job_spark.functions import jpeg_hier

            return jpeg_hier.decode_hierarchical(
                data, pos, body, max_pixels,
                qt=qt, huff=huff, restart_interval=restart_interval)
        elif 0xC5 <= marker <= 0xCF and marker not in (0xC8, 0xCC):
            if marker in (0xC5, 0xC6, 0xC7, 0xCD, 0xCE, 0xCF):
                raise JpegFormatError(
                    f"differential SOF 0xFF{marker:02X} outside a "
                    "hierarchical (DHP) stream")
            raise JpegFormatError(
                f"unsupported SOF marker 0xFF{marker:02X} "
                "(sequential/progressive, huffman or arithmetic)")
        elif marker == 0xC4:                    # DHT
            _parse_dht(body, huff)
        elif marker == 0xCC:                    # DAC: arith conditioning
            p = 0
            while p + 2 <= len(body):
                tc, tb = body[p] >> 4, body[p] & 0x0F
                cs = body[p + 1]
                if tb > 3:
                    raise JpegFormatError(f"bad DAC table id {tb}")
                if tc == 0:                     # DC: Cs packs (U << 4) | L
                    lo, hi = cs & 0x0F, cs >> 4
                    if lo > hi or hi > 15:
                        raise JpegFormatError(f"bad DC conditioning {cs}")
                    arith_cond["dc"][tb] = (lo, hi)
                elif tc == 1:                   # AC: Cs = Kx
                    if not 1 <= cs <= 63:
                        raise JpegFormatError(f"bad AC conditioning Kx={cs}")
                    arith_cond["ac"][tb] = cs
                else:
                    raise JpegFormatError(f"bad DAC class {tc}")
                p += 2
        elif marker == 0xDD:                    # DRI
            if len(body) < 2:
                raise JpegFormatError("truncated DRI")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xEE:                    # APP14: Adobe transform
            if body[:5] == b"Adobe" and len(body) >= 12:
                adobe_transform = body[11]
        elif marker == 0xDA:                    # SOS
            if sof is None:
                raise JpegFormatError("SOS before SOF")
            pos = _decode_scan(data, pos + 2 + seglen, body, sof, geom,
                               coefs, qt, huff, restart_interval,
                               arith_cond)
            nscans += 1
            continue
        # APPn / COM / anything else with a length: skip
        pos += 2 + seglen

    if sof is not None and sof[6]:
        from flink_job_spark.functions import jpeg_lossless as jl

        return jl.reconstruct(sof, coefs)
    return _reconstruct(sof, geom, coefs, qt, adobe_transform)


def _decode_scan(data, pos, body, sof, geom, coefs, qt, huff,
                 restart_interval, arith_cond=None, differential=False):
    """Decode one entropy-coded scan into the coefficient planes; returns
    the stream position of the next marker after the scan. Entropy coding
    is Huffman (SOF0/1/2) or arithmetic (SOF9/10, functions/jpeg_arith.py
    — same scan walk, different per-block decoder). `differential`
    (hierarchical SOF5/7 frames, r7): DC is coded WITHOUT prediction and
    lossless samples without spatial prediction — the values are
    reference-frame differences."""
    w, h, comps, progressive, arith, _prec, lossless = sof
    if lossless:
        from flink_job_spark.functions import jpeg_lossless as jl

        return jl.decode_scan(data, pos, body, sof, coefs, huff,
                              restart_interval, differential=differential)
    hmax, vmax, mcux, mcuy = geom
    ns = body[0]
    if len(body) < 1 + 2 * ns + 3:
        raise JpegFormatError("truncated SOS header")
    ss, se, ahl = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
    ah, al = ahl >> 4, ahl & 0x0F
    if not progressive:
        ss, se, ah, al = 0, 63, 0, 0    # baseline ignores the S fields
    if not (0 <= ss <= se <= 63):
        raise JpegFormatError(f"bad spectral band {ss}..{se}")
    has_dc, has_ac = ss == 0, se >= max(ss, 1)
    if progressive and has_dc and has_ac:
        raise JpegFormatError("progressive scan mixes DC and AC")

    order = []
    for si in range(ns):
        cs, tt = body[1 + 2 * si], body[2 + 2 * si]
        td, ta = tt >> 4, tt & 0x0F
        match = [i for i, c in enumerate(comps) if c[0] == cs]
        if not match:
            raise JpegFormatError(f"scan references unknown component {cs}")
        ci = match[0]
        if comps[ci][1] not in qt:
            raise JpegFormatError(f"missing quant table {comps[ci][1]}")
        if arith:
            # td/ta select arithmetic conditioning tables, not DHTs
            if td > 3 or ta > 3:
                raise JpegFormatError(f"bad arith table id {td}/{ta}")
            order.append((ci, td, ta))
            continue
        dct = act = None
        if has_dc and ah == 0:
            if (0, td) not in huff:
                raise JpegFormatError("missing Huffman table")
            dct = huff[(0, td)]
        if has_ac:
            if (1, ta) not in huff:
                raise JpegFormatError("missing Huffman table")
            act = huff[(1, ta)]
        order.append((ci, dct, act))

    if arith:
        if differential:
            raise JpegFormatError(
                "arithmetic differential frames (SOF13-15) unsupported")
        from flink_job_spark.functions import jpeg_arith as ja

        dec = ja.ArithDecoder(data, pos)
        stats = ja._Stats()
        stats.need({td for _, td, _ in order}, {ta for _, _, ta in order})
        dc_cond = (arith_cond or {}).get("dc", {})
        ac_cond = (arith_cond or {}).get("ac", {})
        dc_ctx = [0] * len(comps)
        last_dc = [0] * len(comps)

        def block(ci, td, ta, by, bx):
            coef = coefs[ci][by, bx]
            if has_dc:
                if ah == 0:
                    lo, hi = dc_cond.get(td, ja.DEFAULT_DC_COND)
                    coef[0] = ja.decode_dc(dec, stats.dc[td], dc_ctx,
                                           last_dc, ci, lo, hi) << al
                else:
                    ja.decode_dc_refine(dec, stats.fixed, coef, al)
            if has_ac:
                kx = ac_cond.get(ta, ja.DEFAULT_AC_KX)
                if ah == 0:
                    ja.decode_ac(dec, stats.ac[ta], stats.fixed, coef,
                                 max(ss, 1), se, kx, al)
                else:
                    ja.decode_ac_refine(dec, stats.ac[ta], stats.fixed,
                                        coef, max(ss, 1), se, al)

        def do_restart():
            dec.restart()
            stats.reset()
            dc_ctx[:] = [0] * len(comps)
            last_dc[:] = [0] * len(comps)

        end_pos = dec
    else:
        br = _BitReader(data, pos)
        st = _ScanState(len(comps))

        def block(ci, dct, act, by, bx):
            coef = coefs[ci][by, bx]
            if has_dc:
                if differential:
                    st.pred[ci] = 0     # F.1.1.5.1: PRED = 0 every block
                _dec_dc(br, st, ci, coef, dct, ah, al)
            if has_ac:
                if ah == 0:
                    _dec_ac_first(br, st, coef, act, max(ss, 1), se, al)
                else:
                    _dec_ac_refine(br, st, coef, act, max(ss, 1), se, al)

        def do_restart():
            br.restart()
            st.reset()

        end_pos = br

    unit = 0                            # MCUs (interleaved) / blocks (not)
    if ns > 1:
        # interleaved: hi*vi blocks per component per MCU (A.2.3).
        # A SINGLE-component scan is non-interleaved in ANY frame type
        # (T.81 A.2.2) — baseline files written with per-component scan
        # scripts (cjpeg -scans) walk the component's own block grid,
        # which differs from the MCU grid once chroma is subsampled
        # (review-caught r5: routing baseline Ns=1 scans through the MCU
        # walk desynced the Huffman stream on 4:2:0 scan-script files).
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and unit and unit % restart_interval == 0:
                    do_restart()
                for ci, dct, act in order:
                    hi, vi = comps[ci][2], comps[ci][3]
                    for r in range(vi):
                        for c in range(hi):
                            block(ci, dct, act, my * vi + r, mx * hi + c)
                unit += 1
    else:
        # non-interleaved: the component's OWN block grid (its true dims
        # rounded up to blocks — possibly smaller than the MCU-padded
        # allocation; padding blocks simply stay zero and crop away)
        ci, dct, act = order[0]
        _, _, hi, vi = comps[ci]
        nbxc = ((w * hi + hmax - 1) // hmax + 7) // 8
        nbyc = ((h * vi + vmax - 1) // vmax + 7) // 8
        for by in range(nbyc):
            for bx in range(nbxc):
                if restart_interval and unit and unit % restart_interval == 0:
                    do_restart()
                block(ci, dct, act, by, bx)
                unit += 1

    return _next_marker(data, end_pos.pos)


def _component_planes(sof, geom, coefs, qt,
                      differential: bool = False) -> list[np.ndarray]:
    """Dequantize zigzag coefficient planes, batched IDCT, level shift
    (suppressed for differential hierarchical frames, T.81 J.3/A.3.1),
    replication upsample, crop — per-component float planes."""
    w, h, comps, _prog, _arith, prec, _lossless = sof
    hmax, vmax, mcux, mcuy = geom
    zznat = np.array(ZIGZAG)
    cropped = []
    shift = 0.0 if differential else float(1 << (prec - 1))
    for (cid, tq, hi, vi), cz in zip(comps, coefs):
        q = qt[tq].reshape(64)[zznat]           # quant steps, zigzag order
        nby, nbx, _ = cz.shape
        nat = np.zeros((nby, nbx, 64), np.float64)
        nat[:, :, zznat] = cz * q               # dequant + de-zigzag
        blocks = nat.reshape(nby, nbx, 8, 8)
        rec = (_DCT_A.T @ blocks) @ _DCT_A + shift
        p = rec.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        if hi != hmax:
            p = np.repeat(p, hmax // hi, axis=1)
        if vi != vmax:
            p = np.repeat(p, vmax // vi, axis=0)
        cropped.append(p[:h, :w])
    return cropped


def _reconstruct(sof, geom, coefs, qt,
                 adobe_transform=None) -> tuple[int, int, int, bytes]:
    """Shared tail: dequantize zigzag coefficient planes, batched IDCT,
    level shift, replication upsample, crop, color-convert."""
    w, h, comps, _prog, _arith, prec, _lossless = sof
    cropped = _component_planes(sof, geom, coefs, qt)
    if len(cropped) == 3:
        if adobe_transform == 0:
            # Adobe APP14 ColorTransform 0 on a 3-component frame: the
            # planes are stored R,G,B directly (some Adobe tools emit
            # this) — no YCbCr inversion (review-caught r5)
            rgb = np.stack(cropped, axis=-1)
        else:
            rgb = _ycbcr_to_rgb(np.stack(cropped, axis=-1),
                                mid=float(1 << (prec - 1)))
        if prec == 12:
            hi = np.clip(np.round(rgb), 0, 4095).astype(np.uint16)
            return w, h, 3, (hi >> 4).astype(np.uint8).tobytes()
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        return w, h, 3, out.tobytes()
    if len(cropped) == 4:
        # Adobe 4-component (CMYK press JPEGs): stored samples are
        # INVERTED ink per the Adobe convention (S = 255 - ink). APP14
        # transform 2 = YCCK (first three planes are the YCbCr of the
        # stored CMY, K coded directly); 0/absent = stored CMYK direct.
        # Normalize to RGB for the uniform stats contract with the quick
        # conversion R = S_C*S_K/255 etc. (what browsers apply; exact
        # passthrough of the stored CMY when S_K == 255, i.e. no black
        # ink — the exactness lever the oracle key uses).
        if adobe_transform == 2:
            cmy = _ycbcr_to_rgb(np.stack(cropped[:3], axis=-1))
        else:
            cmy = np.stack(cropped[:3], axis=-1)
        k = np.clip(cropped[3], 0.0, 255.0)[..., None]
        rgb = np.clip(cmy, 0.0, 255.0) * k / 255.0
        out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
        return w, h, 3, out.tobytes()
    if prec == 12:
        # normalize to the engine-wide 8-bit sample contract: clip to the
        # declared 12-bit range, then drop the 4 extra bits (floor — the
        # same v >> 4 a downstream stats pipeline applies; documented in
        # the 12-bit keys' oracles)
        hi = np.clip(np.round(cropped[0]), 0, 4095).astype(np.uint16)
        return w, h, 1, (hi >> 4).astype(np.uint8).tobytes()
    out = np.clip(np.round(cropped[0]), 0, 255).astype(np.uint8)
    return w, h, 1, out.tobytes()
