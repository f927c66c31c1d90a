"""WebP lossless (VP8L) — native decode + fixture encode, no codec lib.

Closes the highest-volume image gap still behind the Pillow adapter
(VERDICT r6 #2): ``RIFF....WEBP`` files whose image chunk is ``VP8L``
decode natively on the shared magic dispatch; lossy VP8 and extended
VP8X files stay on the capability-gated adapter.

Implemented from the published bitstream spec (RFC 9649 / the WebP
lossless bitstream specification), the same public procedure libwebp's
vp8l_dec realizes:

* LSB-first bit reading; canonical prefix codes read bit-by-bit
  (DEFLATE-style canonical assignment), both the "simple" 1-2 symbol
  form and the full code-length-coded form with 16/17/18 repeats and
  the optional max_symbol cut-off.
* The four transforms, inverted in reverse read order: predictor (all
  14 modes, with the flat-buffer TR rule — the top-right of a
  rightmost pixel is the leftmost pixel of the SAME row), color
  transform (3.5-bit signed fixed-point deltas, int8 channels),
  subtract-green, and color indexing with sub-byte pixel bundling
  (1/2/4-bit indices packed into the green channel).
* Entropy image: optional color cache (hash 0x1e35a7bd, every emitted
  pixel inserted), meta prefix-code groups for the main image, LZ77
  backward references with the 120-entry code-to-plane distance map.
  The map is DERIVED, not transcribed: the spec's table is exactly the
  120 nearest (dx, dy) offsets (dy 0..7, dx -7..8, causal) ordered by
  (dx^2 + dy^2, larger dy first, |dx|, positive dx first) — asserted
  against the published table's verified prefix in tests.

The fixture encoder emits real VP8L: optional predictor /
color-transform / subtract-green / palette transforms, optional color
cache and a greedy dist-1 / dist-width LZ77 (exercising overlapping
copies), with complete two-level canonical codes. Lossless means the
roundtrip oracle is EXACT pixel recovery — the strongest lemma any
codec here admits (same policy as jpeg_lossless.py).

Reference parity note: the reference engine has no media path — this
extends the LLM-pipeline north star the same way the other codecs do.
"""

from __future__ import annotations

import struct

MAX_PIXELS = 64_000_000
_MAX_GROUPS = 65_536

# code length codes are stored in this fixed order (spec 5.2.2)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14,
             15)

_HASH_MUL = 0x1E35A7BD


class WebpFormatError(ValueError):
    """Malformed WebP — becomes a decode_error row."""


def _distance_map() -> list[tuple[int, int]]:
    """The 120-entry code-to-plane map: nearest causal (dx, dy) offsets
    sorted by (squared distance, larger dy first, |dx|, +dx first)."""
    cands = [(x, y) for y in range(8) for x in range(-7, 9)
             if y > 0 or x > 0]
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1],
                              abs(p[0]), 0 if p[0] >= 0 else 1))
    return cands[:120]


_DIST_MAP = _distance_map()


# --- bit I/O (LSB-first) -----------------------------------------------------


class _Bits:
    __slots__ = ("d", "byte", "acc", "n")

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.d = data
        self.byte = pos
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        while self.n < nbits:
            if self.byte >= len(self.d):
                raise WebpFormatError("truncated VP8L stream")
            self.acc |= self.d[self.byte] << self.n
            self.byte += 1
            self.n += 8
        v = self.acc & ((1 << nbits) - 1)
        self.acc >>= nbits
        self.n -= nbits
        return v


class _BitsW:
    __slots__ = ("buf", "acc", "n")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def done(self) -> bytes:
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.buf)


# --- canonical prefix codes --------------------------------------------------


_LUT_BITS = 8
_LUT_MIN_PIXELS = 256   # LUT build break-even, measured at sf0.1 (r10)

# 8-bit bit-reversal table: _REV8[b] swaps bit k <-> bit 7-k, so the
# reversed-codeword LUT index is one lookup instead of a per-bit loop
_REV8 = tuple(int(f"{b:08b}"[::-1], 2) for b in range(256))


class _Code:
    """Decode table for one canonical prefix code: {(len, code): sym},
    codes assigned DEFLATE-style (by length then symbol order), read
    MSB-of-code-first. trivial != None short-cuts the 0-bit
    single-symbol case.

    With ``want_lut``, codes up to _LUT_BITS long additionally fill a
    flat 2^_LUT_BITS lookup table indexed by the next stream bits in
    LSB-first order (each codeword's bits are stored REVERSED, the
    classic DEFLATE table trick), so the common case decodes with one
    list index instead of one dict probe per code bit; longer codewords
    (rare symbols by construction) fall back to the per-bit dict walk.
    Callers decoding only a handful of symbols per table (tiny images,
    the code-length pre-code) skip the table build — r10 measured the
    256-entry fill costing MORE than it saves below a few hundred
    decodes, which is why the threshold keys off expected pixel count
    in _decode_entropy_image."""

    __slots__ = ("table", "trivial", "max_len", "lut")

    def __init__(self, lengths: list[int], want_lut: bool = True) -> None:
        # single pass: bucket symbols by length (canonical order is
        # length-major then symbol order, and enumerate() already yields
        # symbols ascending) while accumulating the Kraft sum — the
        # header path is hot for small images (one ~280-symbol and three
        # 256-symbol tables per image)
        by_len: dict[int, list[int]] = {}
        n_sym = 0
        first = 0
        kraft = 0
        for sym, ln in enumerate(lengths):
            if ln <= 0:
                continue
            n_sym += 1
            first = sym
            if ln > 15:
                raise WebpFormatError("prefix code is not complete")
            kraft += 1 << (15 - ln)
            b = by_len.get(ln)
            if b is None:
                by_len[ln] = [sym]
            else:
                b.append(sym)
        if n_sym == 0:
            raise WebpFormatError("empty prefix code")
        if n_sym == 1:
            self.trivial = first
            self.table = {}
            self.max_len = 0
            self.lut = None
            return
        self.trivial = None
        if kraft != (1 << 15):
            raise WebpFormatError("prefix code is not complete")
        table: dict[tuple[int, int], int] = {}
        lut = [0] * (1 << _LUT_BITS) if want_lut else None
        code = 0
        prev_len = 0
        for ln in sorted(by_len):
            code <<= (ln - prev_len)
            prev_len = ln
            for sym in by_len[ln]:
                table[(ln, code)] = sym
                if lut is not None and ln <= _LUT_BITS:
                    # stream bits arrive LSB-first but the codeword is
                    # compared MSB-first: store it bit-reversed, then
                    # replicate across every suffix pattern
                    p = _REV8[(code << (8 - ln)) & 0xFF]
                    step = 1 << ln
                    n_fill = 1 << (_LUT_BITS - ln)
                    lut[p::step] = [(sym << 4) | ln] * n_fill
                code += 1
        self.table = table
        self.max_len = prev_len
        self.lut = lut

    def decode(self, br: _Bits) -> int:
        if self.trivial is not None:
            return self.trivial
        # batched fast path: top the accumulator up once, then resolve
        # the whole codeword with one flat-LUT probe (local int ops,
        # zero reader calls); >_LUT_BITS codewords take the per-bit
        # dict walk
        d, data, byte, n = br, br.d, br.byte, br.n
        acc = d.acc
        max_len = self.max_len
        ndata = len(data)
        while n < max_len and byte < ndata:
            acc |= data[byte] << n
            byte += 1
            n += 8
        lut = self.lut
        skip = 0
        if lut is not None:
            e = lut[acc & 0xFF]
            if e:
                ln = e & 15
                if ln > n:
                    raise WebpFormatError("truncated VP8L stream")
                d.acc = acc >> ln
                d.n = n - ln
                d.byte = byte
                return e >> 4
            skip = _LUT_BITS
        table = self.table
        code = 0
        ln = 0
        while ln < max_len:
            if ln >= n:
                raise WebpFormatError("truncated VP8L stream")
            code = (code << 1) | (acc & 1)
            acc >>= 1
            ln += 1
            if ln > skip:
                sym = table.get((ln, code))
                if sym is not None:
                    d.acc = acc
                    d.n = n - ln
                    d.byte = byte
                    return sym
        raise WebpFormatError("invalid prefix code word")


def _canonical_code_map(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Encoder side: sym -> (code, len), same canonical assignment."""
    nz = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln > 0)
    out: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = nz[0][0] if nz else 0
    for ln, sym in nz:
        code <<= (ln - prev_len)
        prev_len = ln
        out[sym] = (code, ln)
        code += 1
    return out


def _read_prefix_code(br: _Bits, alphabet: int,
                      want_lut: bool = True) -> _Code:
    """One prefix code (spec 5.2): simple (1-2 symbols, explicit) or
    code-length-coded with repeats and the optional max_symbol limit.
    ``want_lut`` gates the fast-decode table build (see _Code); the
    19-symbol code-length pre-code never builds one — it decodes at most
    ``alphabet`` symbols."""
    if br.read(1):                        # simple code
        num_symbols = br.read(1) + 1
        first_8 = br.read(1)
        lengths = [0] * alphabet
        s0 = br.read(8 if first_8 else 1)
        if s0 >= alphabet:
            raise WebpFormatError("simple code symbol out of range")
        if num_symbols == 1:
            lengths[s0] = 1               # trivial: 0 bits per decode
            return _Code(lengths)
        s1 = br.read(8)
        if s1 >= alphabet or s1 == s0:
            raise WebpFormatError("simple code symbol out of range")
        lengths[s0] = lengths[s1] = 1
        return _Code(lengths, want_lut=want_lut)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _Code(cl_lengths, want_lut=False)
    if br.read(1):                        # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev_len = 8
    sym = 0
    while sym < alphabet:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev_len = cl
        elif cl == 16:
            rep = 3 + br.read(2)
            if sym + rep > alphabet:
                raise WebpFormatError("code length repeat overruns")
            for _ in range(rep):
                lengths[sym] = prev_len
                sym += 1
        elif cl == 17:
            sym += 3 + br.read(3)
        else:                             # 18
            sym += 11 + br.read(7)
        if sym > alphabet:
            raise WebpFormatError("code length repeat overruns")
    return _Code(lengths, want_lut=want_lut)


def _prefix_split(v: int) -> tuple[int, int, int]:
    """LZ77 length/distance prefix coding (spec 5.2.3): value >= 1 ->
    (symbol, extra_bit_count, extra_bits)."""
    if v <= 4:
        return v - 1, 0, 0
    x = v - 1
    eb = x.bit_length() - 2
    base = x >> eb
    return 2 * eb + base, eb, x & ((1 << eb) - 1)


def _prefix_join(sym: int, br: _Bits) -> int:
    if sym < 4:
        return sym + 1
    eb = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << eb
    return offset + br.read(eb) + 1


# --- entropy-coded image decode ---------------------------------------------


def _subsample(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _decode_entropy_image(br: _Bits, w: int, h: int,
                          main: bool) -> list[int]:
    """One entropy-coded ARGB image (spec 5.2.2): color-cache bit, meta
    prefix groups (main image only), 5 prefix codes per group, then the
    literal / LZ77 / cache-reference pixel stream."""
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise WebpFormatError(f"bad entropy image dims {w}x{h}")
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise WebpFormatError(f"bad color cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0
    cache = [0] * cache_size

    meta: list[int] | None = None
    meta_bits = 0
    n_groups = 1
    if main and br.read(1):
        meta_bits = br.read(3) + 2
        mw, mh = _subsample(w, meta_bits), _subsample(h, meta_bits)
        meta_px = _decode_entropy_image(br, mw, mh, False)
        meta = [((p >> 8) & 0xFFFF) for p in meta_px]   # (red<<8)|green
        n_groups = max(meta) + 1
        if n_groups > _MAX_GROUPS:
            raise WebpFormatError("meta prefix group count exceeds cap")

    green_alpha = 256 + 24 + cache_size
    # fast-decode LUTs amortize over the pixel stream: build them only
    # when this image will decode enough symbols to pay for the fill
    # (production-size images always qualify; the bench's smallest
    # fixtures and meta/palette side images often don't)
    want_lut = w * h >= _LUT_MIN_PIXELS
    groups = []
    for _ in range(n_groups):
        groups.append((_read_prefix_code(br, green_alpha, want_lut),
                       _read_prefix_code(br, 256, want_lut),
                       _read_prefix_code(br, 256, want_lut),
                       _read_prefix_code(br, 256, want_lut),
                       _read_prefix_code(br, 40, want_lut)))

    n = w * h
    out = [0] * n
    i = 0
    g = groups[0]
    mrow_w = _subsample(w, meta_bits) if meta is not None else 0
    while i < n:
        if meta is not None:
            x, y = i % w, i // w
            g = groups[meta[(y >> meta_bits) * mrow_w + (x >> meta_bits)]]
        s = g[0].decode(br)
        if s < 256:                       # literal
            red = g[1].decode(br)
            blue = g[2].decode(br)
            alpha = g[3].decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[i] = px
            i += 1
            if cache_bits:
                cache[(_HASH_MUL * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 280:                     # LZ77 backward reference
            length = _prefix_join(s - 256, br)
            dist_code = _prefix_join(g[4].decode(br), br)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dx + dy * w
                if dist < 1:
                    dist = 1
            if dist > i or i + length > n:
                raise WebpFormatError("LZ77 reference out of range")
            if cache_bits:
                for _ in range(length):
                    px = out[i - dist]
                    out[i] = px
                    i += 1
                    cache[(_HASH_MUL * px & 0xFFFFFFFF)
                          >> (32 - cache_bits)] = px
            else:
                for _ in range(length):
                    out[i] = out[i - dist]
                    i += 1
        else:                             # color cache reference
            idx = s - 280
            if idx >= cache_size:
                raise WebpFormatError("color cache index out of range")
            out[i] = cache[idx]
            i += 1
    return out


# --- transforms (decode side: inverse) ---------------------------------------


def _avg2(a: int, b: int) -> int:
    return ((((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)) & 0xFFFFFFFF


def _add_px(a: int, b: int) -> int:
    """Per-channel modulo-256 add of two ARGB words."""
    return (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00) | \
           (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF)


def _sub_px(a: int, b: int) -> int:
    """Per-channel modulo-256 subtract of two ARGB words."""
    out = 0
    for sh in (24, 16, 8, 0):
        out |= (((a >> sh) - (b >> sh)) & 0xFF) << sh
    return out


def _select(l: int, t: int, tl: int) -> int:
    p_l = p_t = 0
    for sh in (24, 16, 8, 0):
        cl, ct, ctl = (l >> sh) & 0xFF, (t >> sh) & 0xFF, (tl >> sh) & 0xFF
        pred = cl + ct - ctl
        p_l += abs(pred - cl)
        p_t += abs(pred - ct)
    return l if p_l < p_t else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        v = ((l >> sh) & 0xFF) + ((t >> sh) & 0xFF) - ((tl >> sh) & 0xFF)
        out |= min(255, max(0, v)) << sh
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a, b = (ave >> sh) & 0xFF, (tl >> sh) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)   # trunc toward zero
        out |= min(255, max(0, a + half)) << sh
    return out


def _predict(mode: int, buf: list[int], i: int, w: int) -> int:
    """Predictor modes 0-13 (spec 4.2.2). Caller guarantees x>0 and y>0
    (borders are forced to modes 0/1/2 before getting here). Flat-buffer
    addressing makes TR of a rightmost pixel the leftmost pixel of the
    same row — the spec's rule — for free."""
    l = buf[i - 1]
    t = buf[i - w]
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return buf[i - w + 1]
    if mode == 4:
        return buf[i - w - 1]
    if mode == 5:
        return _avg2(_avg2(l, buf[i - w + 1]), t)
    if mode == 6:
        return _avg2(l, buf[i - w - 1])
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(buf[i - w - 1], t)
    if mode == 9:
        return _avg2(t, buf[i - w + 1])
    if mode == 10:
        return _avg2(_avg2(l, buf[i - w - 1]), _avg2(t, buf[i - w + 1]))
    if mode == 11:
        return _select(l, t, buf[i - w - 1])
    if mode == 12:
        return _clamp_add_sub_full(l, t, buf[i - w - 1])
    if mode == 13:
        return _clamp_add_sub_half(_avg2(l, t), buf[i - w - 1])
    raise WebpFormatError(f"bad predictor mode {mode}")


def _inv_predictor(px: list[int], w: int, h: int, bits: int,
                   modes: list[int]) -> None:
    mw = _subsample(w, bits)
    i = 0
    for y in range(h):
        for x in range(w):
            if y == 0:
                pred = 0xFF000000 if x == 0 else px[i - 1]
            elif x == 0:
                pred = px[i - w]
            else:
                mode = (modes[(y >> bits) * mw + (x >> bits)] >> 8) & 0xFF
                if mode > 13:
                    raise WebpFormatError(f"bad predictor mode {mode}")
                pred = _predict(mode, px, i, w)
            px[i] = _add_px(px[i], pred)
            i += 1


def _ct_delta(t: int, c: int) -> int:
    """3.5 fixed-point color transform delta: both args int8."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(px: list[int], w: int, h: int, bits: int,
                         elems: list[int]) -> None:
    mw = _subsample(w, bits)
    i = 0
    for y in range(h):
        row = (y >> bits) * mw
        for x in range(w):
            e = elems[row + (x >> bits)]
            g2r, g2b, r2b = e & 0xFF, (e >> 8) & 0xFF, (e >> 16) & 0xFF
            v = px[i]
            green = (v >> 8) & 0xFF
            red = (((v >> 16) & 0xFF) + _ct_delta(g2r, green)) & 0xFF
            blue = ((v & 0xFF) + _ct_delta(g2b, green)) & 0xFF
            blue = (blue + _ct_delta(r2b, red)) & 0xFF
            px[i] = (v & 0xFF00FF00) | (red << 16) | blue
            i += 1


def _inv_subtract_green(px: list[int]) -> None:
    for i, v in enumerate(px):
        g = (v >> 8) & 0xFF
        red = (((v >> 16) & 0xFF) + g) & 0xFF
        blue = ((v & 0xFF) + g) & 0xFF
        px[i] = (v & 0xFF00FF00) | (red << 16) | blue


def _inv_color_index(px: list[int], w: int, h: int,
                     palette: list[int]) -> list[int]:
    n_colors = len(palette)
    if n_colors <= 2:
        width_bits = 3
    elif n_colors <= 4:
        width_bits = 2
    elif n_colors <= 16:
        width_bits = 1
    else:
        width_bits = 0
    ppb = 1 << width_bits                 # pixels per packed unit
    ibits = 8 >> width_bits               # index bits
    mask = (1 << ibits) - 1
    packed_w = _subsample(w, width_bits)
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            g = (px[y * packed_w + (x >> width_bits)] >> 8) & 0xFF
            idx = (g >> ((x % ppb) * ibits)) & mask
            # RFC 9649 §4.2.3: an index >= palette size decodes as
            # transparent black, matching libwebp — not an error row
            out[y * w + x] = palette[idx] if idx < n_colors else 0x00000000
    return out


# --- top-level decode ---------------------------------------------------------


def webp_meta(data: bytes) -> tuple[int, int, bool, str]:
    """(width, height, has_alpha_hint, variant) from the RIFF/WebP
    headers; variant is 'VP8L', 'VP8' or 'VP8X' (only VP8L dims parse
    natively here — VP8/VP8X return the container variant for routing)."""
    if len(data) < 16 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise WebpFormatError("not a RIFF/WEBP file")
    tag = data[12:16]
    if tag == b"VP8L":
        if len(data) < 25 or data[20] != 0x2F:
            raise WebpFormatError("bad VP8L signature")
        bits = int.from_bytes(data[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        alpha = bool((bits >> 28) & 1)
        if (bits >> 29) & 0x7:
            raise WebpFormatError("unsupported VP8L version")
        return w, h, alpha, "VP8L"
    if tag in (b"VP8 ", b"VP8X"):
        return 0, 0, False, tag.decode().strip()
    raise WebpFormatError(f"unknown WebP chunk {tag!r}")


def decode_webp_lossless(data: bytes) -> tuple[int, int, int, bytes]:
    """Full VP8L decode -> (w, h, 4, row-major RGBA bytes). Raises
    WebpFormatError on anything malformed (errors-as-data contract)."""
    w, h, _alpha, variant = webp_meta(data)
    if variant != "VP8L":
        raise WebpFormatError(f"not a lossless (VP8L) WebP: {variant}")
    chunk_size = int.from_bytes(data[16:20], "little")
    if chunk_size < 5 or 20 + chunk_size > len(data):
        raise WebpFormatError("VP8L chunk overruns file")
    if w * h > MAX_PIXELS:
        raise WebpFormatError(f"image exceeds pixel cap: {w}x{h}")
    br = _Bits(data[:20 + chunk_size], 25)
    px = _decode_vp8l_stream(br, w, h)

    out = bytearray(w * h * 4)
    for i, v in enumerate(px):
        out[4 * i] = (v >> 16) & 0xFF     # R
        out[4 * i + 1] = (v >> 8) & 0xFF  # G
        out[4 * i + 2] = v & 0xFF         # B
        out[4 * i + 3] = (v >> 24) & 0xFF # A
    return w, h, 4, bytes(out)


def _decode_vp8l_stream(br: _Bits, w: int, h: int) -> list[int]:
    """The VP8L bitstream AFTER the signature/dims header: transforms +
    entropy-coded image. Shared by the full-file path above and the
    HEADERLESS form an ALPH chunk embeds (RFC 9649 §4.2.6 — same
    stream, dims implied by the frame)."""
    # transforms, in read order; each may appear at most once. Every
    # transform captures the image width AT READ TIME: color indexing
    # shrinks the coded width (pixel bundling), so a predictor/color
    # transform read AFTER it operates on the PACKED image and its
    # inverse must run at that width (matching libwebp's xsize flow) —
    # using the full width there would mis-address and walk off the
    # packed buffer on crafted orderings.
    transforms: list[tuple] = []
    seen: set[int] = set()
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise WebpFormatError(f"transform {ttype} repeated")
        seen.add(ttype)
        if ttype == 0:                    # predictor
            bits = br.read(3) + 2
            modes = _decode_entropy_image(
                br, _subsample(xsize, bits), _subsample(h, bits), False)
            transforms.append((0, xsize, bits, modes))
        elif ttype == 1:                  # color transform
            bits = br.read(3) + 2
            elems = _decode_entropy_image(
                br, _subsample(xsize, bits), _subsample(h, bits), False)
            transforms.append((1, xsize, bits, elems))
        elif ttype == 2:                  # subtract green
            transforms.append((2, xsize))
        else:                             # color indexing (palette)
            n_colors = br.read(8) + 1
            deltas = _decode_entropy_image(br, n_colors, 1, False)
            palette = []
            prev = 0
            for d in deltas:
                prev = _add_px(prev, d)
                palette.append(prev)
            if n_colors <= 2:
                packed = _subsample(xsize, 3)
            elif n_colors <= 4:
                packed = _subsample(xsize, 2)
            elif n_colors <= 16:
                packed = _subsample(xsize, 1)
            else:
                packed = xsize
            transforms.append((3, xsize, palette))
            xsize = packed

    px = _decode_entropy_image(br, xsize, h, True)

    for t in reversed(transforms):
        if t[0] == 0:
            _inv_predictor(px, t[1], h, t[2], t[3])
        elif t[0] == 1:
            _inv_color_transform(px, t[1], h, t[2], t[3])
        elif t[0] == 2:
            _inv_subtract_green(px)
        else:
            px = _inv_color_index(px, t[1], h, t[2])
    return px


# --- fixture encoder ----------------------------------------------------------


def _uniform_lengths(n: int) -> list[int]:
    """Complete two-level canonical code over n symbols: s = 2^L - n
    symbols of length L-1, the rest length L (Kraft-exact)."""
    if n == 1:
        return [1]
    bl = (n - 1).bit_length()
    s = (1 << bl) - n
    return [bl - 1] * s + [bl] * (n - s)


def _write_code_lengths(bw: _BitsW, lengths: list[int]) -> None:
    """Write a full (non-simple) prefix code: code-length code over the
    (at most two) distinct non-zero lengths, then one flag bit per
    symbol. Mirrors what _read_prefix_code reads."""
    used = sorted({ln for ln in lengths if ln})
    if not used:
        raise WebpFormatError("cannot encode empty code")
    if len(used) == 1:
        cl_syms = [0, used[0]] if used[0] != 0 else [used[0]]
    elif len(used) == 2:
        cl_syms = used
    else:
        raise WebpFormatError("encoder emits at most 2 distinct lengths")
    bw.write(0, 1)                        # not simple
    cl_lengths = [0] * 19
    for s in cl_syms:
        cl_lengths[s] = 1
    num_cl = max(_CL_ORDER.index(s) for s in cl_syms) + 1
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    bw.write(0, 1)                        # no explicit max_symbol
    cl_map = _canonical_code_map(cl_lengths)
    for ln in lengths:
        code, nb = cl_map[ln]             # uniform schemes never emit 0
        bw.write(_rev(code, nb), nb)


def _rev(code: int, nbits: int) -> int:
    """Prefix-code bits are consumed MSB-of-code first by the bit-at-a-
    time reader, while the writer packs LSB-first — reverse here."""
    out = 0
    for _ in range(nbits):
        out = (out << 1) | (code & 1)
        code >>= 1
    return out


def _write_symbol(bw: _BitsW, enc_map: dict, sym: int) -> None:
    code, nb = enc_map[sym]
    bw.write(_rev(code, nb), nb)


def _write_entropy_image(bw: _BitsW, px: list[int], w: int, h: int,
                         main: bool, cache_bits: int = 0,
                         lz77: bool = False,
                         simple_distance: bool = False) -> None:
    """Encode pixels as one entropy-coded image: uniform-length codes,
    optional color cache, optional greedy dist-1 / dist-w LZ77."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if main:
        bw.write(0, 1)                    # no meta prefix groups
    green_alpha = 256 + 24 + cache_size
    g_len = _uniform_lengths(green_alpha)
    c_len = _uniform_lengths(256)
    g_map = _canonical_code_map(g_len)
    c_map = _canonical_code_map(c_len)
    _write_code_lengths(bw, g_len)
    for _ in range(3):                    # red, blue, alpha share lengths
        _write_code_lengths(bw, c_len)
    if simple_distance and not lz77:
        bw.write(1, 1)                    # simple code
        bw.write(0, 1)                    # 1 symbol
        bw.write(0, 1)                    # 1-bit first symbol
        bw.write(0, 1)                    # symbol 0 (never read)
        d_map = None
    else:
        d_len = _uniform_lengths(40)
        d_map = _canonical_code_map(d_len)
        _write_code_lengths(bw, d_len)

    cache = [None] * cache_size
    n = len(px)
    i = 0

    def emit_literal(v: int) -> None:
        if cache_bits:
            slot = (_HASH_MUL * v & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[slot] == v:
                _write_symbol(bw, g_map, 280 + slot)
                return
            cache[slot] = v
        _write_symbol(bw, g_map, (v >> 8) & 0xFF)
        _write_symbol(bw, c_map, (v >> 16) & 0xFF)
        _write_symbol(bw, c_map, v & 0xFF)
        _write_symbol(bw, c_map, (v >> 24) & 0xFF)

    def emit_copy(length: int, dist: int) -> None:
        ls, leb, lex = _prefix_split(length)
        _write_symbol(bw, g_map, 256 + ls)
        bw.write(lex, leb)
        ds, deb, dex = _prefix_split(dist + 120)   # plane-map bypass
        _write_symbol(bw, d_map, ds)
        bw.write(dex, deb)
        if cache_bits:
            for k in range(i, i + length):
                v = px[k - dist]
                slot = (_HASH_MUL * v & 0xFFFFFFFF) >> (32 - cache_bits)
                cache[slot] = v

    while i < n:
        if lz77 and i > 0:
            best_len, best_dist = 0, 0
            for dist in (1, w):
                if dist > i:
                    continue
                m = 0
                while i + m < n and m < 4000 and px[i + m] == px[i + m - dist]:
                    m += 1
                if m > best_len:
                    best_len, best_dist = m, dist
            if best_len >= 3:
                emit_copy(best_len, best_dist)
                i += best_len
                continue
        emit_literal(px[i])
        i += 1


def encode_webp_lossless(width: int, height: int, pixels: bytes,
                         channels: int = 3, *,
                         subtract_green: bool = False,
                         predictor: int | None = None,
                         color_transform: tuple[int, int, int] | None = None,
                         palette: bool = False,
                         cache_bits: int = 0,
                         lz77: bool = False) -> bytes:
    """VP8L fixture: `pixels` is row-major RGB (channels=3, alpha forced
    255) or RGBA (channels=4). Optional real transforms: predictor mode
    0-13 (uniform block image), color transform (g2r, g2b, r2b int8
    values, uniform), subtract-green, palette (requires <= 256 distinct
    colors; exercises sub-byte bundling when <= 16). Exact roundtrip by
    construction — lossless coding end to end."""
    if channels not in (3, 4):
        raise WebpFormatError("encoder takes RGB or RGBA")
    if (width <= 0 or height <= 0 or width > 16384 or height > 16384
            or width * height > MAX_PIXELS):
        raise WebpFormatError(f"bad dims {width}x{height}")
    if len(pixels) != width * height * channels:
        raise WebpFormatError("pixel buffer does not match dims")
    if palette and (subtract_green or predictor is not None
                    or color_transform is not None):
        raise WebpFormatError("palette excludes the other transforms")
    px = []
    for i in range(width * height):
        r = pixels[channels * i]
        g = pixels[channels * i + 1]
        b = pixels[channels * i + 2]
        a = pixels[channels * i + 3] if channels == 4 else 0xFF
        px.append((a << 24) | (r << 16) | (g << 8) | b)

    bw = _BitsW()
    bw.write(0x2F, 8)
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if channels == 4 else 0, 1)
    bw.write(0, 3)                        # version

    xsize = width
    if predictor is not None:
        if not 0 <= predictor <= 13:
            raise WebpFormatError(f"bad predictor mode {predictor}")
        bw.write(1, 1)
        bw.write(0, 2)                    # transform type 0
        bits = 4
        bw.write(bits - 2, 3)
        mw, mh = _subsample(xsize, bits), _subsample(height, bits)
        _write_entropy_image(bw, [0xFF000000 | (predictor << 8)] * (mw * mh),
                             mw, mh, False)
        # forward-predict: residual = pixel - pred (borders: modes 0/1/2)
        res = list(px)
        for y in range(height - 1, -1, -1):
            for x in range(xsize - 1, -1, -1):
                i = y * xsize + x
                if y == 0:
                    pred = 0xFF000000 if x == 0 else px[i - 1]
                elif x == 0:
                    pred = px[i - xsize]
                else:
                    pred = _predict(predictor, px, i, xsize)
                res[i] = _sub_px(px[i], pred)
        px = res
    if color_transform is not None:
        g2r, g2b, r2b = (v & 0xFF for v in color_transform)
        bw.write(1, 1)
        bw.write(1, 2)                    # transform type 1
        bits = 4
        bw.write(bits - 2, 3)
        mw, mh = _subsample(xsize, bits), _subsample(height, bits)
        elem = (r2b << 16) | (g2b << 8) | g2r
        _write_entropy_image(bw, [0xFF000000 | elem] * (mw * mh),
                             mw, mh, False)
        for i, v in enumerate(px):
            green = (v >> 8) & 0xFF
            red = (v >> 16) & 0xFF
            nr = (red - _ct_delta(g2r, green)) & 0xFF
            nb = ((v & 0xFF) - _ct_delta(g2b, green)
                  - _ct_delta(r2b, red)) & 0xFF
            px[i] = (v & 0xFF00FF00) | (nr << 16) | nb
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)                    # transform type 2
        for i, v in enumerate(px):
            g = (v >> 8) & 0xFF
            red = (((v >> 16) & 0xFF) - g) & 0xFF
            blue = ((v & 0xFF) - g) & 0xFF
            px[i] = (v & 0xFF00FF00) | (red << 16) | blue
    if palette:
        colors = sorted(set(px))
        if len(colors) > 256:
            raise WebpFormatError("palette needs <= 256 distinct colors")
        lookup = {c: i for i, c in enumerate(colors)}
        bw.write(1, 1)
        bw.write(3, 2)                    # transform type 3
        bw.write(len(colors) - 1, 8)
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(_sub_px(c, prev))
            prev = c
        _write_entropy_image(bw, deltas, len(colors), 1, False)
        n_colors = len(colors)
        if n_colors <= 2:
            width_bits = 3
        elif n_colors <= 4:
            width_bits = 2
        elif n_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        ppb = 1 << width_bits
        ibits = 8 >> width_bits
        packed_w = _subsample(xsize, width_bits)
        packed = [0] * (packed_w * height)
        for y in range(height):
            for x in range(xsize):
                idx = lookup[px[y * xsize + x]]
                j = y * packed_w + (x >> width_bits)
                packed[j] |= (idx << ((x % ppb) * ibits)) << 8
        px = packed
        xsize = packed_w
    bw.write(0, 1)                        # end of transforms

    _write_entropy_image(bw, px, xsize, height, True,
                         cache_bits=cache_bits, lz77=lz77,
                         simple_distance=not lz77)
    payload = bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
