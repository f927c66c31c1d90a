"""Extended (VP8X) WebP still images (functions/webp_ext.py, r8):
ALPH filters/compressions, payload variants, animation gate, fuzz."""

import random

import numpy as np
import pytest

from flink_job_spark.functions.webp import WebpFormatError
from flink_job_spark.functions.webp_ext import (_filter_alpha,
                                                _unfilter_alpha,
                                                build_webp_extended,
                                                decode_webp_extended,
                                                webp_extended_meta)


def _rgba(w, h, seed=0):
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    r = (x * 255) // max(1, w - 1) + np.zeros((h, w), np.int64)
    g = (y * 255) // max(1, h - 1) + np.zeros((h, w), np.int64)
    b = ((x + y + seed % 8) * 255) // (w + h + 5)
    a = (x * 7 + y * 3 + seed) % 256
    return np.stack([r, g, b, a], -1).astype(np.uint8)


@pytest.mark.parametrize("filt", [0, 1, 2, 3])
def test_alpha_filter_pairs_exact(filt):
    """Forward/inverse ALPH prediction filters are exact inverses on
    arbitrary content (the libwebp unfilter semantics: horizontal seeds
    rows from the pixel above, vertical/gradient fall back on row 0)."""
    rnd = random.Random(filt)
    for w, h in ((1, 1), (7, 3), (16, 16), (23, 9)):
        plane = np.array([[rnd.randrange(256) for _ in range(w)]
                          for _ in range(h)], np.int64)
        round_ = _unfilter_alpha(_filter_alpha(plane, filt), filt)
        assert np.array_equal(round_, plane), (filt, w, h)


@pytest.mark.parametrize("filt", [0, 1, 2, 3])
@pytest.mark.parametrize("comp", ["raw", "vp8l"])
def test_vp8x_alpha_roundtrip(filt, comp):
    """ALPH alpha is lossless through every filter x compression cell;
    the lossy color stays within the VP8 certificate bound."""
    for (w, h) in ((16, 16), (33, 22), (17, 41)):
        src = _rgba(w, h, w + filt)
        blob = build_webp_extended(w, h, src.tobytes(), qi=8,
                                   alpha_filter=filt,
                                   alpha_compress=comp)
        dw, dh, ch, out = decode_webp_extended(blob)
        assert (dw, dh, ch) == (w, h, 4)
        got = np.frombuffer(out, np.uint8).reshape(h, w, 4)
        assert np.array_equal(got[..., 3], src[..., 3])
        err = int(np.abs(got[..., :3].astype(int)
                         - src[..., :3].astype(int)).max())
        assert err <= 48, (filt, comp, err)
        assert webp_extended_meta(blob) == (w, h, True, False)


def test_vp8x_lossless_payload_and_metadata_chunks():
    """A VP8L payload inside VP8X roundtrips EXACTLY (alpha included);
    EXIF/unknown chunks are skipped as metadata."""
    src = _rgba(21, 14, 3)
    blob = build_webp_extended(21, 14, src.tobytes(), lossless=True,
                               with_exif=True)
    dw, dh, ch, out = decode_webp_extended(blob)
    assert (dw, dh, ch) == (21, 14, 4)
    assert np.array_equal(
        np.frombuffer(out, np.uint8).reshape(14, 21, 4), src)


def test_vp8x_animation_gate_and_rejections():
    src = _rgba(16, 16)
    anim = build_webp_extended(16, 16, src.tobytes(), animated=True)
    with pytest.raises(WebpFormatError, match="animated"):
        decode_webp_extended(anim)
    assert webp_extended_meta(anim)[3] is True
    with pytest.raises(WebpFormatError, match="VP8X"):
        decode_webp_extended(b"RIFF\x00\x00\x00\x00WEBPVP8 " + bytes(20))
    bad = bytearray(build_webp_extended(16, 16, src.tobytes()))
    bad[16] = 9                              # VP8X size != 10
    with pytest.raises(WebpFormatError, match="chunk size"):
        decode_webp_extended(bytes(bad))
    # canvas/image dim mismatch
    bad = bytearray(build_webp_extended(16, 16, src.tobytes()))
    bad[24] = 20                             # canvas w-1
    with pytest.raises(WebpFormatError, match="canvas"):
        decode_webp_extended(bytes(bad))
    # reserved ALPH compression
    blob = bytearray(build_webp_extended(16, 16, src.tobytes(),
                                         alpha_compress="raw"))
    i = blob.find(b"ALPH") + 8
    blob[i] = (blob[i] & ~3) | 2
    with pytest.raises(WebpFormatError, match="compression"):
        decode_webp_extended(bytes(blob))


@pytest.mark.parametrize("seed", [1, 2])
def test_vp8x_fuzz_stays_format_error(seed):
    rnd = random.Random(seed)
    blob = build_webp_extended(20, 15, _rgba(20, 15, seed).tobytes(),
                               alpha_filter=seed % 4,
                               alpha_compress="vp8l" if seed % 2 else "raw")
    for cut in range(12, len(blob), 31):
        try:
            decode_webp_extended(blob[:cut])
        except WebpFormatError:
            pass
    for i in range(12, len(blob), 17):
        bad = blob[:i] + bytes([blob[i] ^ rnd.randrange(1, 256)]) \
            + blob[i + 1:]
        try:
            decode_webp_extended(bad)
        except WebpFormatError:
            pass


def test_vp8x_media_dispatch():
    """Pixel and meta dispatch agree on still VP8X files."""
    from flink_job_spark.operators.multimodal import _decode_any_image

    src = _rgba(18, 12, 5)
    blob = build_webp_extended(18, 12, src.tobytes(), qi=4,
                               alpha_filter=3, alpha_compress="vp8l")
    w, h, ch, out = _decode_any_image(blob)
    assert (w, h, ch) == (18, 12, 4)
    got = np.frombuffer(out, np.uint8).reshape(12, 18, 4)
    assert np.array_equal(got[..., 3], src[..., 3])
