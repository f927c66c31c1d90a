"""Hierarchical JPEG (ITU-T T.81 Annex J) — the last declared JPEG
boundary (SURVEY §8 / VERDICT r6 #4).

A hierarchical stream is a pyramid: DHP (define hierarchical
progression — an SOF-shaped header giving the FINAL dims) followed by a
sequence of frames. The first frame is non-differential (SOF0/1/3) and
establishes the reference; each later frame may be preceded by EXP
(expand reference 2x horizontally and/or vertically, the J.8.1
interpolation filter) and, if DIFFERENTIAL (SOF5 sequential DCT diff /
SOF7 lossless diff), codes corrections that are ADDED to the reference
modulo 2^16 (J.5). Differential frames suppress the level shift and
code DC/samples without prediction (F.1.1.5.1 / J.5). The final image
is the reference after the last frame, clamped to [0, 2^P-1] with
mod-2^16 values read as signed 16-bit.

Scope (documented): Huffman entropy coding, 1x1 sampling inside the
pyramid, 1 or 3 components. Rejected with precise messages: progressive
frames inside a hierarchy (SOF2/6/10/14), arithmetic hierarchical
frames (SOF9/11/13-15 in a DHP stream), DNL. The fixture encoders emit
real 2..n-level pyramids: a lossless one (SOF3 base + SOF7 refinements
— EXACT roundtrip, the strongest oracle) and a DCT one (SOF0 base +
SOF5 refinement — bounded-loss certificate).

The upsampling filter is J.8.1 exactly: even outputs copy the input,
odd outputs are the rounded mean of the two neighbors (edge
replicated); an expanded axis must measure 2x or 2x-1 of the reference,
the relation the ceil-halving pyramid produces naturally.
"""

from __future__ import annotations

import struct

import numpy as np

from flink_job_spark.functions.jpeg import (
    JPEG_SOI,
    JpegFormatError,
    MAX_PIXELS,
    _decode_scan,
    _component_planes,
    _parse_dht,
    _parse_dqt,
    _parse_sof,
    _ycbcr_to_rgb,
)

_NONDIFF = {0xC0: 0xC0, 0xC1: 0xC1, 0xC3: 0xC3}
_DIFF = {0xC5: 0xC1, 0xC7: 0xC3}          # layout twin for header parsing
_MAX_FRAMES = 16


def _exp_upsample(p: np.ndarray, eh: int, ev: int, out_w: int,
                  out_h: int) -> np.ndarray:
    """J.8.1 reference expansion: even outputs copy, odd outputs are the
    rounded neighbor mean with edge replication. Expanded axes must come
    out at 2x or 2x-1 of the input (the next frame's SOF decides)."""
    p = p.astype(np.int64)
    if eh:
        in_w = p.shape[1]
        if out_w not in (2 * in_w, 2 * in_w - 1):
            raise JpegFormatError(
                f"EXP width {out_w} is not 2x/2x-1 of reference {in_w}")
        ext = np.concatenate([p, p[:, -1:]], axis=1)
        up = np.empty((p.shape[0], 2 * in_w), np.int64)
        up[:, 0::2] = p
        up[:, 1::2] = (ext[:, :-1] + ext[:, 1:] + 1) >> 1
        p = up[:, :out_w]
    elif p.shape[1] != out_w:
        raise JpegFormatError("frame width changed without EXP")
    if ev:
        in_h = p.shape[0]
        if out_h not in (2 * in_h, 2 * in_h - 1):
            raise JpegFormatError(
                f"EXP height {out_h} is not 2x/2x-1 of reference {in_h}")
        ext = np.concatenate([p, p[-1:, :]], axis=0)
        up = np.empty((2 * in_h, p.shape[1]), np.int64)
        up[0::2, :] = p
        up[1::2, :] = (ext[:-1, :] + ext[1:, :] + 1) >> 1
        p = up[:out_h, :]
    elif p.shape[0] != out_h:
        raise JpegFormatError("frame height changed without EXP")
    return p & 0xFFFF


def decode_hierarchical(data: bytes, dhp_pos: int, dhp_body: bytes,
                        max_pixels: int = MAX_PIXELS, *,
                        qt: dict | None = None, huff: dict | None = None,
                        restart_interval: int = 0
                        ) -> tuple[int, int, int, bytes]:
    """Entered from decode_jpeg at the DHP marker; walks the frame
    sequence and returns the final (w, h, channels, samples). Tables
    parsed before the DHP (legal per B.2.1) arrive via qt/huff."""
    # DHP shares the SOF layout; parse with the lossless rules (the
    # permissive precision set 2..16, 1x1 sampling — exactly this
    # module's scope)
    dsof, _, _ = _parse_sof(0xC3, dhp_body, max_pixels)
    full_w, full_h, dcomps, _, _, prec, _ = dsof
    dhp_ids = [c[0] for c in dcomps]

    qt = dict(qt or {})
    huff = dict(huff or {})
    arith_cond = {"dc": {}, "ac": {}}
    adobe_transform = None

    refs: dict[int, np.ndarray] = {}
    any_dct = False
    n_frames = 0
    exp_pending: tuple[int, int] | None = None

    sof = geom = coefs = None
    differential = False
    nscans = 0

    def finalize_frame() -> None:
        nonlocal sof, geom, coefs, nscans, any_dct, n_frames
        if nscans == 0:
            raise JpegFormatError("hierarchical frame without a scan")
        w, h, comps, _prog, _arith, _prec, lossless = sof
        if lossless:
            planes = [c.astype(np.int64) for c in coefs]
        else:
            any_dct = True
            planes = [np.round(p).astype(np.int64)
                      for p in _component_planes(sof, geom, coefs, qt,
                                                 differential)]
        for (cid, _tq, _hi, _vi), plane in zip(comps, planes):
            if differential:
                refs[cid] = (refs[cid] + plane) & 0xFFFF
            elif lossless:
                refs[cid] = plane & 0xFFFF
            else:
                # T.81 defines a DCT frame's decoder output WITH sample
                # clamping (A.3.1); only differential ADDITIONS are
                # mod-2^16 (J.5). Storing an unclamped under/overshoot
                # here would wrap negatives to ~65535 and diverge from
                # the encoder's clamped reference.
                refs[cid] = np.clip(plane, 0, (1 << prec) - 1)
        n_frames += 1
        sof = geom = coefs = None
        nscans = 0

    def start_frame(marker: int, body: bytes) -> None:
        nonlocal sof, geom, coefs, differential, exp_pending
        if n_frames >= _MAX_FRAMES:
            raise JpegFormatError("hierarchical frame count exceeds cap")
        differential = marker in _DIFF
        eff = _DIFF.get(marker, marker)
        new_sof, new_geom, new_coefs = _parse_sof(eff, body, max_pixels)
        w, h, comps, _prog, _arith, fprec, _lossless = new_sof
        if fprec != prec:
            raise JpegFormatError("frame precision differs from DHP")
        if w > full_w or h > full_h:
            raise JpegFormatError("frame exceeds DHP dimensions")
        if new_geom[0] != 1 or new_geom[1] != 1:
            raise JpegFormatError(
                "subsampled hierarchical frames unsupported")
        for cid, _tq, _hi, _vi in comps:
            if cid not in dhp_ids:
                raise JpegFormatError(
                    f"frame component {cid} not declared in DHP")
        if exp_pending is not None:
            eh, ev = exp_pending
            exp_pending = None
            for cid in list(refs):
                refs[cid] = _exp_upsample(refs[cid], eh, ev, w, h)
        if differential:
            for cid, _tq, _hi, _vi in comps:
                ref = refs.get(cid)
                if ref is None:
                    raise JpegFormatError(
                        f"differential frame before reference for {cid}")
                if ref.shape != (h, w):
                    raise JpegFormatError(
                        "differential frame dims do not match reference")
        sof, geom, coefs = new_sof, new_geom, new_coefs

    pos = dhp_pos + 4 + len(dhp_body)
    while True:
        if pos + 2 > len(data):
            if n_frames or sof is not None:
                break                     # missing EOI after frames
            raise JpegFormatError("truncated hierarchical stream")
        if data[pos] != 0xFF:
            raise JpegFormatError(f"bad marker sync at {pos}")
        while pos + 2 <= len(data) and data[pos + 1] == 0xFF:
            pos += 1                      # fill bytes before marker (B.1.1.2)
        if pos + 2 > len(data):
            if n_frames or sof is not None:
                break
            raise JpegFormatError("truncated hierarchical stream")
        marker = data[pos + 1]
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:                # EOI
            break
        if pos + 4 > len(data):
            if n_frames or sof is not None:
                break
            raise JpegFormatError("truncated segment header")
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise JpegFormatError("truncated segment")
        if marker == 0xDB:
            _parse_dqt(body, qt)
        elif marker == 0xC4:
            _parse_dht(body, huff)
        elif marker == 0xDD:
            if len(body) < 2:
                raise JpegFormatError("truncated DRI")
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xEE:
            if body[:5] == b"Adobe" and len(body) >= 12:
                adobe_transform = body[11]
        elif marker == 0xDF:              # EXP
            if sof is not None:
                finalize_frame()
            if exp_pending is not None:
                raise JpegFormatError("consecutive EXP markers")
            if len(body) < 1:
                raise JpegFormatError("truncated EXP")
            eh, ev = body[0] >> 4, body[0] & 0x0F
            if eh > 1 or ev > 1 or (eh == 0 and ev == 0):
                raise JpegFormatError(f"bad EXP fields {eh}/{ev}")
            if not refs:
                raise JpegFormatError("EXP before any reference frame")
            exp_pending = (eh, ev)
        elif marker in _NONDIFF or marker in _DIFF:
            if sof is not None:
                finalize_frame()
            if marker in _NONDIFF and n_frames and exp_pending is not None:
                raise JpegFormatError(
                    "EXP precedes a non-differential frame")
            start_frame(marker, body)
        elif marker in (0xC2, 0xC6, 0xCA, 0xCE):
            raise JpegFormatError(
                "progressive frames inside a hierarchical stream "
                "unsupported")
        elif marker in (0xC9, 0xCB, 0xCD, 0xCF):
            raise JpegFormatError(
                "arithmetic frames inside a hierarchical stream "
                "unsupported")
        elif marker == 0xDE:
            raise JpegFormatError("nested DHP")
        elif marker == 0xDC:
            raise JpegFormatError("DNL unsupported")
        elif marker == 0xDA:              # SOS
            if sof is None:
                raise JpegFormatError("SOS before SOF")
            pos = _decode_scan(data, pos + 2 + seglen, body, sof, geom,
                               coefs, qt, huff, restart_interval,
                               arith_cond, differential=differential)
            nscans += 1
            continue
        pos += 2 + seglen

    if sof is not None:
        finalize_frame()
    if n_frames == 0:
        raise JpegFormatError("hierarchical stream with no frames")
    missing = [cid for cid in dhp_ids if cid not in refs]
    if missing:
        raise JpegFormatError(f"no frame coded components {missing}")
    shapes = {refs[cid].shape for cid in dhp_ids}
    if shapes != {(full_h, full_w)}:
        raise JpegFormatError(
            f"final reference dims {shapes} != DHP {full_h}x{full_w}")

    # final output: mod-2^16 values read as signed, clamped to the
    # sample range, then the engine-wide 8-bit normalization
    out_planes = []
    for cid in dhp_ids:
        v = refs[cid].astype(np.int64)
        if prec < 16:
            # mod-2^16 wraparound reads as signed undershoot; at P=16
            # the full unsigned range is legitimate sample space
            v = np.where(v >= 0x8000, v - 0x10000, v)
        v = np.clip(v, 0, (1 << prec) - 1)
        out_planes.append(v.astype(np.float64))
    if len(out_planes) == 3 and any_dct and adobe_transform != 0:
        rgb = _ycbcr_to_rgb(np.stack(out_planes, axis=-1),
                            mid=float(1 << (prec - 1)))
        mx = 255 if prec == 8 else (1 << prec) - 1
        out = np.clip(np.round(rgb), 0, mx).astype(np.int64)
    else:
        out = np.stack(out_planes, axis=-1).astype(np.int64)
    if prec >= 8:
        out8 = (out >> (prec - 8)).astype(np.uint8)
    else:
        out8 = (out << (8 - prec)).astype(np.uint8)
    if len(dhp_ids) == 1:
        return full_w, full_h, 1, out8[..., 0].tobytes()
    return full_w, full_h, 3, out8.tobytes()


# --- fixture encoders ---------------------------------------------------------


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _lossless_frame(marker: int, w: int, h: int, planes: list[np.ndarray],
                    precision: int, predictor: int,
                    differential: bool) -> bytes:
    """One SOF3/SOF7 frame (SOF + DHT + SOS + entropy bytes). For
    differential frames the coded values ARE the plane values (mod-2^16
    differences, prediction 0); otherwise H.1.1 prediction applies."""
    from flink_job_spark.functions.jpeg import (_BitWriter,
                                                _canonical_codes,
                                                _magnitude)
    from flink_job_spark.functions.jpeg_lossless import _predict

    channels = len(planes)
    bits = [0] * 16
    bits[4] = 17
    vals = tuple(range(17))
    codes = _canonical_codes(tuple(bits), vals)
    bw = _BitWriter()
    default = 1 << (precision - 1)
    for y in range(h):
        for x in range(w):
            for ci in range(channels):
                if differential:
                    d = int(planes[ci][y, x]) & 0xFFFF
                elif y == 0:
                    pred = default if x == 0 else int(planes[ci][y, x - 1])
                    d = (int(planes[ci][y, x]) - pred) & 0xFFFF
                else:
                    pred = (int(planes[ci][y - 1, 0]) if x == 0 else
                            _predict(planes[ci], x, y, predictor, default))
                    d = (int(planes[ci][y, x]) - pred) & 0xFFFF
                if d >= 32768:
                    d -= 65536
                if d == -32768:
                    bw.put(*codes[16])
                    continue
                s = _magnitude(d)
                bw.put(*codes[s])
                if s:
                    bw.put(d if d >= 0 else d + (1 << s) - 1, s)
    bw.flush()
    sofb = struct.pack(">BHHB", precision, h, w, channels)
    for ci in range(channels):
        sofb += bytes([ci + 1, 0x11, 0])
    out = _seg(marker, sofb)
    out += _seg(0xFFC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, 0])
    return out + _seg(0xFFDA, sos) + bw.buf


def _pyramid_dims(w: int, h: int, levels: int) -> list[tuple[int, int]]:
    """Smallest-first dim chain by ceil-halving — each step satisfies
    the EXP 2x/2x-1 relation by construction."""
    dims = [(w, h)]
    for _ in range(levels - 1):
        pw, ph = dims[-1]
        dims.append(((pw + 1) // 2, (ph + 1) // 2))
    return dims[::-1]


def encode_jpeg_hier_lossless(width: int, height: int, samples: bytes,
                              channels: int = 1, precision: int = 8,
                              predictor: int = 1,
                              levels: int = 2) -> bytes:
    """Lossless hierarchical pyramid: SOF3 base at the smallest level,
    then per level EXP(1,1) + SOF7 differential refinement whose
    differences are computed against the SAME J.8.1 upsample the decoder
    applies — exact roundtrip by construction at any precision 2..16."""
    if channels not in (1, 3):
        raise JpegFormatError("hier lossless: 1 or 3 channels")
    if not 2 <= precision <= 16:
        raise JpegFormatError(f"bad precision {precision}")
    if not 2 <= levels <= 6:
        raise JpegFormatError(f"bad level count {levels}")
    if width < 2 ** (levels - 1) or height < 2 ** (levels - 1):
        raise JpegFormatError("dims too small for the level count")
    sw = 1 if precision <= 8 else 2
    if len(samples) != width * height * channels * sw:
        raise JpegFormatError("sample buffer does not match dims")
    arr = (np.frombuffer(samples, np.uint8) if sw == 1
           else np.frombuffer(samples, "<u2")).astype(np.int64).reshape(
        height, width, channels)
    if arr.max(initial=0) >= (1 << precision):
        raise JpegFormatError(f"sample out of {precision}-bit range")
    full = [arr[..., c] for c in range(channels)]

    dims = _pyramid_dims(width, height, levels)
    # per-level planes by decimation (any encoder-side downsample is
    # legal; the DIFFERENCES carry exactness)
    level_planes = [full]
    for _ in range(levels - 1):
        level_planes.append([p[::2, ::2] for p in level_planes[-1]])
    level_planes = level_planes[::-1]     # smallest first, matches dims

    out = bytearray(JPEG_SOI)
    dhpb = struct.pack(">BHHB", precision, height, width, channels)
    for ci in range(channels):
        dhpb += bytes([ci + 1, 0x11, 0])
    out += _seg(0xFFDE, dhpb)

    w0, h0 = dims[0]
    out += _lossless_frame(0xFFC3, w0, h0, level_planes[0], precision,
                           predictor, False)
    refs = [p & 0xFFFF for p in level_planes[0]]
    for lvl in range(1, levels):
        w1, h1 = dims[lvl]
        out += _seg(0xFFDF, bytes([0x11]))          # EXP both axes
        refs = [_exp_upsample(r, 1, 1, w1, h1) for r in refs]
        diffs = [(p - r) & 0xFFFF
                 for p, r in zip(level_planes[lvl], refs)]
        out += _lossless_frame(0xFFC7, w1, h1, diffs, precision,
                               predictor, True)
        refs = [(r + d) & 0xFFFF for r, d in zip(refs, diffs)]
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_hier_dct(width: int, height: int, pixels: bytes,
                         quality: int = 90) -> bytes:
    """Grayscale DCT pyramid: SOF0 base (half resolution) + EXP + SOF5
    differential refinement quantized at step 1 (no level shift, DC
    without prediction). Bounded-loss: the only error sources are the
    base frame's quantization absorbed by the refinement and float-DCT
    rounding in the refinement itself."""
    from flink_job_spark.functions.jpeg import (ZIGZAG, _AC_LUMA_SPEC,
                                                _BitWriter, _DC_LUMA_SPEC,
                                                _DCT_A, _canonical_codes,
                                                _magnitude, encode_jpeg)

    if width < 2 or height < 2:
        raise JpegFormatError("dims too small for a pyramid")
    if len(pixels) != width * height:
        raise JpegFormatError("pixel buffer does not match dims")
    arr = np.frombuffer(pixels, np.uint8).astype(np.int64).reshape(
        height, width)
    base = arr[::2, ::2]
    bw0, bh0 = base.shape[1], base.shape[0]
    base_jpg = encode_jpeg(bw0, bh0, base.astype(np.uint8).tobytes(), 1,
                           quality=quality)
    from flink_job_spark.functions.jpeg import decode_jpeg
    _, _, _, base_dec = decode_jpeg(base_jpg)
    ref = np.frombuffer(base_dec, np.uint8).astype(np.int64).reshape(
        bh0, bw0)
    ref_up = _exp_upsample(ref, 1, 1, width, height)
    diff = arr - ref_up.astype(np.int64)   # small signed values

    # SOF5 refinement: 8x8 blocks of the diff, DCT, quant step 1,
    # sequential Huffman with PRED = 0
    nbx, nby = (width + 7) // 8, (height + 7) // 8
    padded = np.zeros((nby * 8, nbx * 8), np.float64)
    padded[:height, :width] = diff
    blocks = padded.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
    f = np.einsum("ux,byxw,wv->byuv", _DCT_A, blocks, _DCT_A.T)
    q = np.round(f).astype(np.int64).reshape(nby, nbx, 64)
    zz = np.array(ZIGZAG)
    qz = q[:, :, zz]

    dc_codes = _canonical_codes(*_DC_LUMA_SPEC)
    ac_codes = _canonical_codes(*_AC_LUMA_SPEC)
    bw = _BitWriter()
    for by in range(nby):
        for bx in range(nbx):
            blk = qz[by, bx]
            dc = int(blk[0])              # no prediction in differential
            s = _magnitude(dc)
            bw.put(*dc_codes[s])
            if s:
                bw.put(dc if dc >= 0 else dc + (1 << s) - 1, s)
            run = 0
            last_nz = (int(np.max(np.nonzero(blk)[0]))
                       if np.any(blk[1:]) else 0)
            for k in range(1, last_nz + 1):
                v = int(blk[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    bw.put(*ac_codes[0xF0])
                    run -= 16
                s = _magnitude(v)
                bw.put(*ac_codes[(run << 4) | s])
                bw.put(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < 63:
                bw.put(*ac_codes[0x00])   # EOB
    bw.flush()

    out = bytearray(JPEG_SOI)
    dhpb = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    out += _seg(0xFFDE, dhpb)
    out += base_jpg[2:-2]                 # base frame segments, no SOI/EOI
    out += _seg(0xFFDF, bytes([0x11]))    # EXP both axes
    # unit quant table id 1 + the refinement frame
    unit_q = np.ones(64, np.uint8).tobytes()
    out += _seg(0xFFDB, bytes([0x01]) + unit_q)
    sofb = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 1])
    out += _seg(0xFFC5, sofb)
    db, dv = _DC_LUMA_SPEC
    ab, av = _AC_LUMA_SPEC
    out += _seg(0xFFC4, bytes([0x00]) + bytes(db) + bytes(dv))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(ab) + bytes(av))
    out += _seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)
