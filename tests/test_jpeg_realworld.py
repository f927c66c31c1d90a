"""Real-world JPEG layout regressions (review-caught, r5):

1. Baseline files written with per-component scan scripts (cjpeg -scans)
   code each Ns=1 scan NON-interleaved on the component's own block grid
   (T.81 A.2.2) — routing them through the MCU walk desynced the Huffman
   stream once chroma was subsampled.
2. A 3-component frame carrying Adobe APP14 ColorTransform=0 stores
   R,G,B planes directly — applying the YCbCr inversion silently wrecked
   the colors.
3. encode_jpeg must reject subsampling='420' for non-color channel
   counts instead of silently emitting 4:4:4.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from flink_job_spark.functions import jpeg as J


def build_nonint_420(w: int, h: int, rgb: bytes, quality: int = 75) -> bytes:
    """Baseline 4:2:0 with THREE single-component scans — the scan-script
    layout; each scan walks the component's own block grid, which differs
    from the MCU grid once chroma is subsampled."""
    arr = np.frombuffer(rgb, np.uint8).astype(np.float64).reshape(h, w, 3)
    ycc = J._rgb_to_ycbcr(arr)
    qtabs = J.quant_tables(quality)
    zz = np.array(J.ZIGZAG)
    dc = [J._canonical_codes(*J._DC_LUMA_SPEC),
          J._canonical_codes(*J._DC_CHROMA_SPEC)]
    ac = [J._canonical_codes(*J._AC_LUMA_SPEC),
          J._canonical_codes(*J._AC_CHROMA_SPEC)]

    def quant(plane, qi):
        blocks, nby, nbx = J._plane_blocks(plane, 8)   # component's OWN grid
        f = np.einsum("ux,byxw,wv->byuv", J._DCT_A, blocks - 128.0,
                      J._DCT_A.T)
        q = np.round(f / qtabs[qi]).astype(np.int32)
        return q.reshape(nby, nbx, 64)[:, :, zz], nby, nbx

    planes = [(ycc[..., 0], 0, 0), (J._downsample2(ycc[..., 1]), 1, 1),
              (J._downsample2(ycc[..., 2]), 1, 1)]
    out = bytearray(J._header_segments(0xFFC0, w, h, 3, qtabs, [0, 1, 1],
                                       [0x22, 0x11, 0x11], [0, 1, 1]))

    def seg(m, b):
        return struct.pack(">HH", m, len(b) + 2) + b

    for ci, (plane, qi, tsel) in enumerate(planes):
        czz, nby, nbx = quant(plane, qi)
        bw = J._BitWriter()
        prev = 0
        for by in range(nby):
            for bx in range(nbx):
                prev = J._encode_block(bw, czz[by, bx], prev,
                                       dc[tsel], ac[tsel])
        bw.flush()
        out += seg(0xFFDA, bytes([1, ci + 1, (tsel << 4) | tsel, 0, 63, 0]))
        out += bytes(bw.buf)
    out += b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("dims", [(20, 12), (24, 40), (17, 9)])
def test_baseline_noninterleaved_scan_script(dims):
    """A scan-script baseline 4:2:0 file decodes to EXACTLY the pixels of
    the interleaved encoding of the same image (identical quantized
    coefficients, different scan layout)."""
    w, h = dims
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    nonint = build_nonint_420(w, h, px.tobytes())
    inter = J.encode_jpeg(w, h, px.tobytes(), 3, quality=75,
                          subsampling="420")
    assert J.decode_jpeg(nonint) == J.decode_jpeg(inter)


def test_adobe_transform0_three_component_rgb_stored():
    """APP14 ColorTransform=0 on a 3-component frame returns the coded
    planes directly; applying the YCbCr inversion to the raw output must
    reproduce (within post-rounding slack) what the same bitstream
    decodes to WITHOUT the marker."""
    rng = np.random.default_rng(12)
    px = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    plain = J.encode_jpeg(24, 16, px.tobytes(), 3, quality=90)
    app14 = (b"\xFF\xEE" + struct.pack(">H", 14)
             + b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 0))
    t0 = plain[:2] + app14 + plain[2:]
    w0, h0, c0, raw = J.decode_jpeg(t0)
    _, _, _, rgb = J.decode_jpeg(plain)
    assert (w0, h0, c0) == (24, 16, 3)
    assert raw != rgb                       # the marker must change decode
    raw_a = np.frombuffer(raw, np.uint8).reshape(16, 24, 3).astype(float)
    rgb_a = np.frombuffer(rgb, np.uint8).reshape(16, 24, 3).astype(np.int64)
    conv = np.clip(np.round(J._ycbcr_to_rgb(raw_a)), 0, 255).astype(np.int64)
    assert np.abs(conv - rgb_a).max() <= 2  # one rounding each side
    # ...and transform=1 (explicit YCbCr) decodes like no marker at all
    app14_t1 = (b"\xFF\xEE" + struct.pack(">H", 14)
                + b"Adobe" + struct.pack(">HHHB", 100, 0, 0, 1))
    assert J.decode_jpeg(plain[:2] + app14_t1 + plain[2:]) \
        == J.decode_jpeg(plain)


def test_encode_420_rejects_non_color():
    for ch in (1, 4):
        with pytest.raises(J.JpegFormatError):
            J.encode_jpeg(16, 16, bytes(16 * 16 * ch), ch,
                          subsampling="420")
