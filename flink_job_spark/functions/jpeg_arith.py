"""T.81 arithmetic entropy coding (Annex D/E/F/G) for JPEG — the QM-coder.

Closes the last Huffman-walk gap in the JPEG family (VERDICT r5 #5):
SOF9 (extended sequential, arithmetic) and SOF10 (progressive,
arithmetic) frames decode natively on the existing marker/coefficient
infrastructure in functions/jpeg.py — no codec library. Both the decoder
AND the encoder are implemented from the published standard (ITU-T T.81
Annex D state machine, Annex F sequential decision sequences, Annex G
progressive), the same public procedures libjpeg's jcarith/jdarith
realize, so fixtures can be built without any external tool and the
pair is roundtrip-testable: arithmetic-encoding the exact quantized
coefficients of the Huffman twin must decode to bit-identical pixels.

Components:

* ``JPEG_ARITAB`` — Table D.3 (Qe values + next-state machine), plus the
  fixed ~equiprobable state 113 used for AC signs and refinement bits.
* ``ArithEncoder`` / ``ArithDecoder`` — the register machines of D.1/D.2
  (byte-stuffing: 0xFF in the code stream is followed by 0x00; hitting a
  real marker mid-scan legally feeds zero bytes until the scan ends).
* DC/AC per-block decision sequences — sequential (F.1.4/F.2) and the
  four progressive scan kinds (G.1.3/G.2: DC first/refine, AC
  first/refine). Statistics areas: 64 bins per DC table (conditioning
  contexts from the previous diff, categorized by the DAC L/U bounds),
  256 bins per AC table (3 bins per zigzag index + two magnitude-
  category ladders split at Kx).

Statistics and coder registers reset at every scan start and at every
restart marker (T.81 F.1.4.1). All integer arithmetic — bit-exact by
construction, no float anywhere.
"""

from __future__ import annotations

import numpy as np

# --- Table D.3: Qe value and probability estimation state machine ----------
# (qe, next_index_lps, next_index_mps, switch_mps) per state 0..112, plus
# state 113: the FIXED ~0.5 state (never transitions, never switches) used
# for AC sign and refinement-correction decisions.
JPEG_ARITAB: tuple[tuple[int, int, int, int], ...] = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
)

DC_STAT_BINS = 64
AC_STAT_BINS = 256
FIXED_BIN = 113            # state index of the non-adapting ~0.5 state

# DAC defaults when no conditioning segment appears (T.81 Table F.1 notes)
DEFAULT_DC_COND = (0, 1)   # (L, U)
DEFAULT_AC_KX = 5


class _Stats:
    """One statistics area: a bytearray of states, each byte packing
    (MPS << 7) | state_index. A separate single-bin area holds the fixed
    state for sign/correction decisions."""

    __slots__ = ("dc", "ac", "fixed")

    def __init__(self) -> None:
        self.dc: dict[int, bytearray] = {}
        self.ac: dict[int, bytearray] = {}
        self.fixed = bytearray([FIXED_BIN])

    def reset(self) -> None:
        for b in self.dc.values():
            b[:] = bytes(len(b))
        for b in self.ac.values():
            b[:] = bytes(len(b))
        self.fixed[0] = FIXED_BIN

    def need(self, dc_tables: set[int], ac_tables: set[int]) -> None:
        for t in dc_tables:
            self.dc.setdefault(t, bytearray(DC_STAT_BINS))
        for t in ac_tables:
            self.ac.setdefault(t, bytearray(AC_STAT_BINS))


class ArithDecoder:
    """T.81 D.2 register machine over a marker-delimited code segment.
    Bytes feed from `data` starting at `pos`; 0xFF 0x00 unstuffs to 0xFF;
    0xFF + marker stops the byte feed (zeros supply from then on — legal
    in arithmetic coding, the decoder terminates by block count)."""

    __slots__ = ("data", "bpos", "c", "a", "ct", "marker_pos")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.bpos = pos
        self.marker_pos: int | None = None
        self._init_registers()

    def _init_registers(self) -> None:
        self.c = 0
        self.a = 0
        self.ct = -16           # forces two initial byte fetches

    def _byte_in(self) -> int:
        if self.marker_pos is not None:
            return 0
        d = self.data
        if self.bpos >= len(d):
            self.marker_pos = len(d)
            return 0
        b = d[self.bpos]
        self.bpos += 1
        if b != 0xFF:
            return b
        # skip fill 0xFFs, then: 0x00 = stuffed 0xFF data byte, else marker
        while self.bpos < len(d) and d[self.bpos] == 0xFF:
            self.bpos += 1
        if self.bpos >= len(d):
            self.marker_pos = len(d)
            return 0
        if d[self.bpos] == 0x00:
            self.bpos += 1
            return 0xFF
        self.marker_pos = self.bpos - 1     # points at the marker's 0xFF
        return 0

    def decode(self, st: bytearray, i: int) -> int:
        # renormalize + feed (D.2.6)
        while self.a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = ((self.c << 8) | self._byte_in()) & 0xFFFFFFFF
                self.ct += 8
                if self.ct < 0:
                    self.ct += 1
                    if self.ct == 0:
                        self.a = 0x8000   # doubled below -> 0x10000
            self.a <<= 1
        sv = st[i]
        qe, nl, nm, sw = JPEG_ARITAB[sv & 0x7F]
        self.a -= qe
        temp = self.a << self.ct
        if self.c >= temp:
            self.c -= temp
            # conditional LPS exchange
            if self.a < qe:
                self.a = qe
                st[i] = (sv & 0x80) | nm
            else:
                self.a = qe
                st[i] = ((sv & 0x80) ^ (sw << 7)) | nl
                sv ^= 0x80
        elif self.a < 0x8000:
            # conditional MPS exchange
            if self.a < qe:
                st[i] = ((sv & 0x80) ^ (sw << 7)) | nl
                sv ^= 0x80
            else:
                st[i] = (sv & 0x80) | nm
        return sv >> 7

    def restart(self) -> None:
        """Consume the next RSTn marker and re-init the registers (the
        caller resets the statistics)."""
        from flink_job_spark.functions.jpeg import JpegFormatError

        d = self.data
        p = self.marker_pos if self.marker_pos is not None else self.bpos
        while p + 1 < len(d) and not (d[p] == 0xFF and d[p + 1] != 0x00):
            p += 1
        # B.1.1.2: any run of 0xFF fill bytes may precede the marker —
        # advance to the LAST 0xFF before classifying the marker byte
        while p + 1 < len(d) and d[p] == 0xFF and d[p + 1] == 0xFF:
            p += 1
        if p + 1 >= len(d) or not (0xD0 <= d[p + 1] <= 0xD7):
            raise JpegFormatError("expected restart marker")
        self.bpos = p + 2
        self.marker_pos = None
        self._init_registers()

    @property
    def pos(self) -> int:
        """Stream position to resume the marker walk from."""
        return self.marker_pos if self.marker_pos is not None else self.bpos


class ArithEncoder:
    """T.81 D.1 register machine with the standard carry/stacked-0xFF
    byte discipline and 0xFF00 stuffing on output."""

    __slots__ = ("out", "c", "a", "ct", "buffer", "sc", "zc")

    def __init__(self) -> None:
        self.out = bytearray()
        self._init_registers()

    def _init_registers(self) -> None:
        self.c = 0
        self.a = 0x10000
        self.ct = 11
        self.buffer = -1        # empty
        self.sc = 0             # count of stacked (pending) 0xFF bytes
        self.zc = 0             # count of pending 0x00 bytes

    def _emit(self, b: int) -> None:
        self.out.append(b)

    def _emit_pending_zeros(self) -> None:
        while self.zc:
            self._emit(0x00)
            self.zc -= 1

    def encode(self, st: bytearray, i: int, bit: int) -> None:
        sv = st[i]
        qe, nl, nm, sw = JPEG_ARITAB[sv & 0x7F]
        self.a -= qe
        if bit != (sv >> 7):
            # LPS path (with conditional exchange)
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            st[i] = ((sv & 0x80) ^ (sw << 7)) | nl
        else:
            # MPS path
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            st[i] = (sv & 0x80) | nm
        # renormalize + output (D.1.6)
        while True:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                temp = self.c >> 19
                if temp > 0xFF:
                    # carry ripples into the buffered byte and converts
                    # every stacked 0xFF into 0x00
                    if self.buffer >= 0:
                        self._emit_pending_zeros()
                        self._emit(self.buffer + 1)
                        if self.buffer + 1 == 0xFF:
                            self._emit(0x00)
                    self.zc += self.sc
                    self.sc = 0
                    self.buffer = temp & 0xFF
                elif temp == 0xFF:
                    self.sc += 1
                else:
                    if self.buffer == 0:
                        self.zc += 1
                    elif self.buffer >= 0:
                        self._emit_pending_zeros()
                        self._emit(self.buffer)
                    while self.sc:
                        self._emit_pending_zeros()
                        self._emit(0xFF)
                        self._emit(0x00)
                        self.sc -= 1
                    self.buffer = temp & 0xFF
                self.c &= 0x7FFFF
                self.ct += 8
            if self.a >= 0x8000:
                break

    def flush(self) -> bytes:
        """D.1.8 termination; returns the scan's entropy bytes and
        re-inits for a possible next scan/restart segment."""
        temp = (self.a - 1 + self.c) & 0xFFFF0000
        if temp < self.c:
            self.c = temp + 0x8000
        else:
            self.c = temp
        self.c <<= self.ct
        if self.c & 0xF8000000:
            if self.buffer >= 0:
                self._emit_pending_zeros()
                self._emit(self.buffer + 1)
                if self.buffer + 1 == 0xFF:
                    self._emit(0x00)
            self.zc += self.sc
            self.sc = 0
        else:
            if self.buffer == 0:
                self.zc += 1
            elif self.buffer >= 0:
                self._emit_pending_zeros()
                self._emit(self.buffer)
            while self.sc:
                self._emit_pending_zeros()
                self._emit(0xFF)
                self._emit(0x00)
                self.sc -= 1
        if self.c & 0x7FFF800:
            self._emit_pending_zeros()
            b = (self.c >> 19) & 0xFF
            self._emit(b)
            if b == 0xFF:
                self._emit(0x00)
            if self.c & 0x7F800:
                b = (self.c >> 11) & 0xFF
                self._emit(b)
                if b == 0xFF:
                    self._emit(0x00)
        done = bytes(self.out)
        self.out = bytearray()
        self._init_registers()
        return done


# --- DC decision sequences (F.1.4.1 encode / F.2.4.1 decode) ----------------
#
# Per-component running state lives in the caller: last_dc_val[ci] and
# dc_context[ci] (0 zero / 4 small+ / 8 small- / 12 large+ / 16 large-).

def _dc_context_after(m: int, sign: int, lo: int, hi: int) -> int:
    if m < (1 << lo) >> 1:
        return 0
    if m > (1 << hi) >> 1:
        return 12 + sign * 4
    return 4 + sign * 4


def decode_dc(dec: ArithDecoder, st: bytearray, dc_ctx: list[int],
              last_dc: list[int], ci: int, lo: int, hi: int) -> int:
    """Decode one DC diff; returns the new cumulative DC value."""
    from flink_job_spark.functions.jpeg import JpegFormatError

    base = dc_ctx[ci]
    if dec.decode(st, base) == 0:
        dc_ctx[ci] = 0
        return last_dc[ci]
    sign = dec.decode(st, base + 1)
    s = base + 2 + sign
    m = dec.decode(st, s)
    if m:
        s = 20                                  # X1 (Table F.4)
        while dec.decode(st, s):
            m <<= 1
            if m == 0x8000:
                raise JpegFormatError("arith DC magnitude overflow")
            s += 1
    dc_ctx[ci] = _dc_context_after(m, sign, lo, hi)
    v = m
    s += 14                                     # magnitude bit bins
    m >>= 1
    while m:
        if dec.decode(st, s):
            v |= m
        m >>= 1
    v += 1
    if sign:
        v = -v
    last_dc[ci] += v
    return last_dc[ci]


def encode_dc(enc: ArithEncoder, st: bytearray, dc_ctx: list[int],
              last_dc: list[int], ci: int, lo: int, hi: int,
              dc_value: int) -> None:
    base = dc_ctx[ci]
    v = dc_value - last_dc[ci]
    last_dc[ci] = dc_value
    if v == 0:
        enc.encode(st, base, 0)
        dc_ctx[ci] = 0
        return
    enc.encode(st, base, 1)
    if v > 0:
        sign = 0
    else:
        sign = 1
        v = -v
    enc.encode(st, base + 1, sign)
    s = base + 2 + sign
    m = 0
    v -= 1
    if v:
        enc.encode(st, s, 1)
        m = 1
        v2 = v
        s = 20
        v2 >>= 1
        while v2:
            enc.encode(st, s, 1)
            m <<= 1
            s += 1
            v2 >>= 1
    enc.encode(st, s, 0)
    dc_ctx[ci] = _dc_context_after(m, sign, lo, hi)
    s += 14
    m >>= 1
    while m:
        enc.encode(st, s, 1 if (m & v) else 0)
        m >>= 1


# --- AC decision sequences (F.1.4.2 / F.2.4.2), spectral band [ss..se] -------

def decode_ac(dec: ArithDecoder, st: bytearray, fixed: bytearray,
              coef: np.ndarray, ss: int, se: int, kx: int,
              shift: int = 0) -> None:
    """Decode AC coefficients of one block into zigzag array `coef`
    (indices ss..se); `shift` is the progressive point transform Al."""
    from flink_job_spark.functions.jpeg import JpegFormatError

    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if dec.decode(st, base):
            return                              # EOB
        while dec.decode(st, base + 1) == 0:
            base += 3
            k += 1
            if k > se:
                raise JpegFormatError("arith AC run past band end")
        sign = dec.decode(fixed, 0)
        s = base + 2
        m = dec.decode(st, s)
        if m:
            if dec.decode(st, s):
                m <<= 1
                s = 189 if k <= kx else 217
                while dec.decode(st, s):
                    m <<= 1
                    if m == 0x8000:
                        raise JpegFormatError("arith AC magnitude overflow")
                    s += 1
        v = m
        s += 14
        m >>= 1
        while m:
            if dec.decode(st, s):
                v |= m
            m >>= 1
        v += 1
        if sign:
            v = -v
        coef[k] = v << shift
        k += 1


def encode_ac(enc: ArithEncoder, st: bytearray, fixed: bytearray,
              coef: np.ndarray, ss: int, se: int, kx: int,
              shift: int = 0) -> None:
    ke = se
    while ke >= ss:
        v = int(coef[ke])
        if (v if v >= 0 else -v) >> shift:
            break
        ke -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        enc.encode(st, base, 0)                 # not EOB yet
        while True:
            v = int(coef[k])
            sign = 0 if v >= 0 else 1
            v = (v if v >= 0 else -v) >> shift
            if v:
                break
            enc.encode(st, base + 1, 0)
            base += 3
            k += 1
        enc.encode(st, base + 1, 1)
        enc.encode(fixed, 0, sign)
        s = base + 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, s, 1)
            m = 1
            v2 = v
            if v2 >> 1:
                enc.encode(st, s, 1)
                m <<= 1
                s = 189 if k <= kx else 217
                v2 >>= 2
                while v2:
                    enc.encode(st, s, 1)
                    m <<= 1
                    s += 1
                    v2 >>= 1
        enc.encode(st, s, 0)
        s += 14
        m >>= 1
        while m:
            enc.encode(st, s, 1 if (m & v) else 0)
            m >>= 1
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)          # EOB


# --- progressive refinement scans (G.1.3.3 / G.2) ----------------------------

def decode_dc_refine(dec: ArithDecoder, fixed: bytearray,
                     coef: np.ndarray, al: int) -> None:
    if dec.decode(fixed, 0):
        coef[0] |= 1 << al


def encode_dc_refine(enc: ArithEncoder, fixed: bytearray,
                     coef: np.ndarray, al: int) -> None:
    enc.encode(fixed, 0, (int(coef[0]) >> al) & 1)


def decode_ac_refine(dec: ArithDecoder, st: bytearray, fixed: bytearray,
                     coef: np.ndarray, ss: int, se: int, al: int) -> None:
    from flink_job_spark.functions.jpeg import JpegFormatError

    p1 = 1 << al
    m1 = -1 << al
    kex = se
    while kex > 0 and coef[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        base = 3 * (k - 1)
        if k > kex:
            if dec.decode(st, base):
                return
        while True:
            v = int(coef[k])
            if v:                               # correction bit
                if dec.decode(st, base + 2):
                    coef[k] = v + (m1 if v < 0 else p1)
                break
            if dec.decode(st, base + 1):        # newly nonzero
                coef[k] = m1 if dec.decode(fixed, 0) else p1
                break
            base += 3
            k += 1
            if k > se:
                raise JpegFormatError("arith AC refine past band end")
        k += 1


def encode_ac_refine(enc: ArithEncoder, st: bytearray, fixed: bytearray,
                     coef: np.ndarray, ss: int, se: int,
                     ah: int, al: int) -> None:
    def mag(k: int, sh: int) -> int:
        v = int(coef[k])
        return (v if v >= 0 else -v) >> sh

    ke = se
    while ke >= ss and mag(ke, al) == 0:
        ke -= 1
    kex = ke
    while kex >= ss and mag(kex, ah) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        base = 3 * (k - 1)
        if k > kex:
            enc.encode(st, base, 0)
        while True:
            v = int(coef[k])
            sign = 0 if v >= 0 else 1
            m = (v if v >= 0 else -v) >> al
            if m:
                break
            enc.encode(st, base + 1, 0)
            base += 3
            k += 1
        if m == 1:                              # newly nonzero
            enc.encode(st, base + 1, 1)
            enc.encode(fixed, 0, sign)
        else:                                   # correction bit
            enc.encode(st, base + 2, m & 1)
        k += 1
    if k <= se:
        enc.encode(st, 3 * (k - 1), 1)


# --- fixture encoders: SOF9 sequential / SOF10 progressive -------------------
#
# Built on the SAME quantization pipeline as functions/jpeg.encode_jpeg
# (identical einsum/round ops), so the arithmetic file holds the exact
# quantized coefficients of its Huffman twin and both must decode to
# bit-identical pixels — the twin proof tests/test_codec_properties.py
# runs. 4:4:4 only (fixture scope); no DAC segment (decoder defaults
# L=0/U=1, Kx=5 are also what we encode with); no restart intervals.

def _quantize_444(width, height, pixels, channels, quality, precision=8):
    from flink_job_spark.functions.jpeg import (ZIGZAG, _DCT_A, JpegFormatError,
                                                _plane_blocks, _rgb_to_ycbcr,
                                                quant_tables)

    if channels not in (1, 3):
        raise JpegFormatError("arith fixture encoder: 1 or 3 channels")
    if width <= 0 or height <= 0 or width > 65535 or height > 65535:
        raise JpegFormatError(f"bad dims {width}x{height}")
    if precision not in (8, 12):
        raise JpegFormatError(f"unsupported precision {precision}")

    sw = 1 if precision == 8 else 2     # bytes per sample (12-bit: <u2)
    if len(pixels) != width * height * channels * sw:
        raise JpegFormatError("pixel buffer does not match dims")
    qtabs = quant_tables(quality)
    arr = (np.frombuffer(pixels, np.uint8) if precision == 8
           else np.frombuffer(pixels, "<u2")).astype(np.float64).reshape(
        height, width, channels)
    if precision == 12 and arr.max(initial=0.0) > 4095:
        raise JpegFormatError("12-bit sample out of range")
    mid_c = float(1 << (precision - 1))
    if channels == 3:
        ycc = _rgb_to_ycbcr(arr, mid=mid_c)
        planes = [ycc[..., c] for c in range(3)]
        qsel = [0, 1, 1]
        tsels = [0, 1, 1]
    else:
        planes = [arr[..., 0]]
        qsel = [0]
        tsels = [0]
    zz = np.array(ZIGZAG)
    comps_zz = []
    nby = nbx = 0
    mid = float(1 << (precision - 1))
    for plane, qi in zip(planes, qsel):
        blocks, nby, nbx = _plane_blocks(plane, 8)
        f = np.einsum("ux,byxw,wv->byuv", _DCT_A, blocks - mid, _DCT_A.T)
        q = np.round(f / qtabs[qi]).astype(np.int32)
        comps_zz.append(q.reshape(nby, nbx, 64)[:, :, zz].astype(np.int64))
    return qtabs, qsel, tsels, comps_zz, nby, nbx


def _arith_headers(sof_marker, width, height, channels, qtabs, qsel,
                   tsels, precision=8) -> bytes:
    import struct

    from flink_job_spark.functions.jpeg import JPEG_SOI, ZIGZAG

    zz = np.array(ZIGZAG)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(JPEG_SOI)
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00"
               + struct.pack(">HHBB", 1, 1, 0, 0))
    for ti in range(max(qsel) + 1):
        tab = qtabs[ti].reshape(64)[zz]
        out += seg(0xFFDB, bytes([ti]) + bytes(int(v) for v in tab))
    sof = struct.pack(">BHHB", precision, height, width, channels)
    for ci in range(channels):
        sof += bytes([ci + 1, 0x11, qsel[ci]])
    out += seg(sof_marker, sof)
    return bytes(out)


def _sos_seg(comp_ids, tsels, ss, se, ah, al) -> bytes:
    import struct

    body = bytes([len(comp_ids)])
    for cid, t in zip(comp_ids, tsels):
        body += bytes([cid, (t << 4) | t])
    body += bytes([ss, se, (ah << 4) | al])
    return struct.pack(">HH", 0xFFDA, len(body) + 2) + body


def encode_jpeg_arith(width: int, height: int, pixels: bytes,
                      channels: int = 1, quality: int = 50,
                      progressive: bool = False,
                      precision: int = 8) -> bytes:
    """SOF9 (sequential) / SOF10 (progressive) arithmetic-coded fixture.
    Progressive uses the same scan script as the Huffman progressive
    encoder: interleaved DC first (Al=1), per-component AC first
    (Ss=1..63, Al=1), DC refinement, per-component AC refinement —
    each scan its own arithmetic codeword with fresh statistics.
    precision=12 (grayscale only): pixels are little-endian uint16
    samples in 0..4095 — the arithmetic coder is table-free, so 12-bit
    needs no extended Huffman specs."""
    qtabs, qsel, tsels, comps_zz, nby, nbx = _quantize_444(
        width, height, pixels, channels, quality, precision)
    lo, hi = DEFAULT_DC_COND
    kx = DEFAULT_AC_KX
    comp_ids = [ci + 1 for ci in range(channels)]

    def fresh():
        enc = ArithEncoder()
        stats = _Stats()
        stats.need(set(tsels), set(tsels))
        return enc, stats

    out = bytearray(_arith_headers(0xFFCA if progressive else 0xFFC9,
                                   width, height, channels, qtabs, qsel,
                                   tsels, precision))
    if not progressive:
        enc, stats = fresh()
        dc_ctx = [0] * channels
        last_dc = [0] * channels
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(channels):
                    coef = comps_zz[ci][by, bx]
                    t = tsels[ci]
                    encode_dc(enc, stats.dc[t], dc_ctx, last_dc, ci,
                              lo, hi, int(coef[0]))
                    encode_ac(enc, stats.ac[t], stats.fixed, coef,
                              1, 63, kx)
        out += _sos_seg(comp_ids, tsels, 0, 63, 0, 0)
        out += enc.flush()
    else:
        # DC first scan: interleaved, Al=1
        enc, stats = fresh()
        dc_ctx = [0] * channels
        last_dc = [0] * channels
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(channels):
                    encode_dc(enc, stats.dc[tsels[ci]], dc_ctx, last_dc,
                              ci, lo, hi, int(comps_zz[ci][by, bx, 0]) >> 1)
        out += _sos_seg(comp_ids, tsels, 0, 0, 0, 1)
        out += enc.flush()
        # AC first scans: per component, Ss=1..63, Al=1
        for ci in range(channels):
            enc, stats = fresh()
            for by in range(nby):
                for bx in range(nbx):
                    encode_ac(enc, stats.ac[tsels[ci]], stats.fixed,
                              comps_zz[ci][by, bx], 1, 63, kx, 1)
            out += _sos_seg([comp_ids[ci]], [tsels[ci]], 1, 63, 0, 1)
            out += enc.flush()
        # DC refinement: interleaved, Ah=1 Al=0 (fixed bin)
        enc, stats = fresh()
        for by in range(nby):
            for bx in range(nbx):
                for ci in range(channels):
                    encode_dc_refine(enc, stats.fixed,
                                     comps_zz[ci][by, bx], 0)
        out += _sos_seg(comp_ids, tsels, 0, 0, 1, 0)
        out += enc.flush()
        # AC refinement scans: per component, Ah=1 Al=0
        for ci in range(channels):
            enc, stats = fresh()
            for by in range(nby):
                for bx in range(nbx):
                    encode_ac_refine(enc, stats.ac[tsels[ci]], stats.fixed,
                                     comps_zz[ci][by, bx], 1, 63, 1, 0)
            out += _sos_seg([comp_ids[ci]], [tsels[ci]], 1, 63, 1, 0)
            out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out)
