"""Lossless JPEG (ITU-T T.81 Annex H, SOF3) — the DNG/DICOM lineage.

The last non-hierarchical JPEG process: no DCT, no quantization — each
sample is predicted from its decoded neighbors (predictors 1-7, H.1.2.1)
and the difference is entropy-coded with DC-style Huffman categories
(SSSS 0..16, category 16 = diff 32768 with no extra bits). Modulo-2^16
arithmetic makes the roundtrip EXACT at any precision 2..16.

Scope (documented): Huffman entropy coding (SOF3 — arithmetic lossless
SOF11 is vanishingly rare and stays rejected), 1x1 sampling factors,
1 or 3 components (components are coded independently and returned
as stored — lossless has no mandated color transform). Restart markers
reset the prediction to the scan-start default per H.2.2. Decoded
samples normalize to the engine-wide 8-bit sample contract:
``(value << Pt) >> (prec - 8)`` for prec >= 8, ``<< (8 - prec)`` below.

Both directions are implemented (same policy as jpeg_arith.py): the
fixture encoder writes extended DC tables (categories to 16, beyond
Annex K's 8-bit specs) so the decoder's DHT-generic path is what real
files exercise; the roundtrip property is EXACT sample recovery at the
coded precision, the strongest oracle any codec here admits.
"""

from __future__ import annotations

import struct

import numpy as np


def _predict(plane: np.ndarray, x: int, y: int, sel: int,
             default: int) -> int:
    """H.1.2.1: first line uses Ra, first column uses Rb, else the
    selected predictor 1-7. The very first sample (and the first after a
    restart) is handled by the caller with `default`."""
    if y == 0:
        return int(plane[0, x - 1])             # x>0 on the first line
    if x == 0:
        return int(plane[y - 1, 0])
    ra = int(plane[y, x - 1])
    rb = int(plane[y - 1, x])
    rc = int(plane[y - 1, x - 1])
    if sel == 1:
        return ra
    if sel == 2:
        return rb
    if sel == 3:
        return rc
    if sel == 4:
        return ra + rb - rc
    if sel == 5:
        return ra + ((rb - rc) >> 1)
    if sel == 6:
        return rb + ((ra - rc) >> 1)
    return (ra + rb) >> 1                       # sel == 7


def decode_scan(data: bytes, pos: int, body: bytes, sof, planes,
                huff, restart_interval: int,
                differential: bool = False) -> int:
    """Decode one lossless scan into per-component int32 sample planes;
    returns the stream position of the next marker. `differential`
    (hierarchical SOF7 frames, T.81 J.5): no spatial prediction — every
    coded value is a reference-frame difference (prediction 0)."""
    from flink_job_spark.functions.jpeg import (JpegFormatError, _BitReader,
                                                _decode_huff, _extend,
                                                _next_marker)

    w, h, comps, _prog, _arith, prec, _lossless = sof
    ns = body[0]
    if len(body) < 1 + 2 * ns + 3:
        raise JpegFormatError("truncated SOS header")
    sel = body[1 + 2 * ns]                      # Ss = predictor selector
    pt = body[3 + 2 * ns] & 0x0F                # Al = point transform
    if not 1 <= sel <= 7:
        raise JpegFormatError(f"bad lossless predictor {sel}")
    if pt >= prec:
        raise JpegFormatError(f"point transform {pt} >= precision {prec}")

    order = []
    for si in range(ns):
        cs, tt = body[1 + 2 * si], body[2 + 2 * si]
        td = tt >> 4
        match = [i for i, c in enumerate(comps) if c[0] == cs]
        if not match:
            raise JpegFormatError(f"scan references unknown component {cs}")
        if (0, td) not in huff:
            raise JpegFormatError("missing Huffman table")
        order.append((match[0], huff[(0, td)]))

    br = _BitReader(data, pos)
    default = 1 << (prec - pt - 1)

    def diff_of(dct) -> int:
        s = _decode_huff(br, dct)
        if s == 16:                             # H.1.2.3: no extra bits
            return 32768
        if s > 16:
            raise JpegFormatError(f"bad lossless category {s}")
        if s == 0:
            return 0
        return _extend(br.bits(s), s)

    # H.1.1/H.2.2: a restart resets the prediction AS AT SCAN START — the
    # whole first line of each restart interval predicts with Ra (its
    # first sample with the default). Restarts land at row starts because
    # Ri must be a multiple of MCUs-per-row for lossless (B.2.3); a DRI
    # that is not is rejected rather than decoded wrong.
    restart_row = 0
    unit = 0
    for y in range(h):
        for x in range(w):
            if restart_interval and unit and unit % restart_interval == 0:
                if x != 0:
                    raise JpegFormatError(
                        "lossless restart interval is not a multiple of "
                        "MCUs per row (B.2.3)")
                br.restart()
                restart_row = y
            for ci, dct in order:
                if differential:
                    pred = 0            # J.5: differences, no prediction
                elif y == restart_row:
                    # first line of the scan / restart interval (H.1.1)
                    pred = default if x == 0 else int(planes[ci][y, x - 1])
                else:
                    pred = _predict(planes[ci], x, y, sel, default)
                planes[ci][y, x] = (pred + diff_of(dct)) & 0xFFFF
            unit += 1
    # undo the point transform at scan end (each component is coded in
    # exactly one lossless scan, so the in-place shift is single-shot):
    # output samples are the shifted-domain values times 2^Pt (A.4)
    if pt:
        for ci, _ in order:
            planes[ci] <<= pt
    return _next_marker(data, br.pos)


def reconstruct(sof, planes) -> tuple[int, int, int, bytes]:
    """Normalize decoded planes (full-domain values — decode_scan undoes
    the point transform at scan end) to the 8-bit sample contract."""
    w, h, comps, _prog, _arith, prec, _lossless = sof
    out_planes = []
    for p in planes:
        v = p.astype(np.int64)
        if prec >= 8:
            v8 = np.clip(v >> (prec - 8), 0, 255)
        else:
            v8 = np.clip(v << (8 - prec), 0, 255)
        out_planes.append(v8.astype(np.uint8))
    if len(out_planes) == 1:
        return w, h, 1, out_planes[0].tobytes()
    return w, h, 3, np.stack(out_planes, axis=-1).tobytes()


# --- fixture encoder ---------------------------------------------------------

def encode_jpeg_lossless(width: int, height: int, samples: bytes,
                         channels: int = 1, precision: int = 8,
                         predictor: int = 1,
                         point_transform: int = 0,
                         restart_rows: int = 0) -> bytes:
    """SOF3 fixture: `samples` are uint8 bytes (precision <= 8) or
    little-endian uint16 (9..16), row-major, channel-interleaved for
    channels=3. Exact-roundtrip by construction (modulo-2^16 prediction
    coding); the DHT carries the full 0..16 category alphabet.
    `restart_rows` > 0 emits DRI = restart_rows * width (a row multiple,
    B.2.3) with RSTn markers and the H.2.2 prediction reset — each
    interval's first line codes against Ra / the default, as at scan
    start — exercising the DICOM/DNG restart lineage."""
    from flink_job_spark.functions.jpeg import (JPEG_SOI, JpegFormatError,
                                                MAX_LOSSLESS_PIXELS,
                                                _BitWriter, _canonical_codes,
                                                _magnitude)

    if channels not in (1, 3):
        raise JpegFormatError("lossless fixture encoder: 1 or 3 channels")
    if not 2 <= precision <= 16:
        raise JpegFormatError(f"bad precision {precision}")
    if not 1 <= predictor <= 7:
        raise JpegFormatError(f"bad predictor {predictor}")
    if not 0 <= point_transform < precision:
        raise JpegFormatError(f"bad point transform {point_transform}")
    if restart_rows < 0 or (restart_rows and restart_rows >= height):
        raise JpegFormatError(f"bad restart_rows {restart_rows}")
    if (width <= 0 or height <= 0
            or width * height * channels > MAX_LOSSLESS_PIXELS):
        raise JpegFormatError(f"bad dims {width}x{height}")
    sw = 1 if precision <= 8 else 2
    if len(samples) != width * height * channels * sw:
        raise JpegFormatError("sample buffer does not match dims")
    arr = (np.frombuffer(samples, np.uint8) if sw == 1
           else np.frombuffer(samples, "<u2")).astype(np.int64).reshape(
        height, width, channels)
    if arr.max(initial=0) >= (1 << precision):
        raise JpegFormatError(f"sample out of {precision}-bit range")
    arr = arr >> point_transform               # A.4: x >>= Pt before coding

    # DC-style table over the FULL lossless alphabet 0..16
    bits = [0] * 16
    bits[4] = 17
    vals = tuple(range(17))
    codes = _canonical_codes(tuple(bits), vals)

    bw = _BitWriter()
    default = 1 << (precision - point_transform - 1)
    planes = [arr[..., c] for c in range(channels)]
    restart_row = 0
    rst_n = 0
    for y in range(height):
        if restart_rows and y and y % restart_rows == 0:
            bw.flush()                       # byte-align (1-fill pad)
            bw.buf += bytes([0xFF, 0xD0 + rst_n])   # raw marker, unstuffed
            rst_n = (rst_n + 1) & 7
            restart_row = y
        for x in range(width):
            for ci in range(channels):
                if y == restart_row:         # first line of interval (H.1.1)
                    pred = (default if x == 0
                            else int(planes[ci][y, x - 1]))
                else:
                    pred = _predict(planes[ci], x, y, predictor, default)
                d = (int(planes[ci][y, x]) - pred) & 0xFFFF
                if d >= 32768:
                    d -= 65536                 # signed representative
                if d == -32768:
                    bw.put(*codes[16])         # category 16, no extra bits
                    continue
                s = _magnitude(d)
                bw.put(*codes[s])
                if s:
                    bw.put(d if d >= 0 else d + (1 << s) - 1, s)
    bw.flush()

    def seg(marker: int, b: bytes) -> bytes:
        return struct.pack(">HH", marker, len(b) + 2) + b

    out = bytearray(JPEG_SOI)
    sofb = struct.pack(">BHHB", precision, height, width, channels)
    for ci in range(channels):
        sofb += bytes([ci + 1, 0x11, 0])
    out += seg(0xFFC3, sofb)
    out += seg(0xFFC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    if restart_rows:
        out += seg(0xFFDD, struct.pack(">H", restart_rows * width))
    sos = bytes([channels])
    for ci in range(channels):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([predictor, 0, point_transform])
    out += seg(0xFFDA, sos)
    out += bw.buf
    out += b"\xff\xd9"
    return bytes(out)
