"""Minimal-but-real PDF text extraction (pure Python): build + parse the
subset of ISO 32000 a crawl's text pipeline needs.

Builder (``build_pdf``): valid PDF — catalog → page tree → per-page
content streams (optionally FlateDecode-compressed), Helvetica font,
and EITHER a classic xref table + trailer (1.4) or a PDF 1.5
cross-reference stream (W [1 4 2], FlateDecode + PNG-Up Predictor 12),
optionally with the non-stream dictionaries packed into a /Type /ObjStm
object stream (type-2 entries). Emitting BOTH layouts keeps the
roundtrip twin honest — a parser that silently ignored xref streams
could not pass its own fixtures. Same pattern as the other codec
builders (jpeg.py, gif.py, archive.py).

Parser (``extract_pdf_text``): follows the REAL object graph, not regex
over bytes — ``startxref`` → xref (classic tables, PDF >= 1.5 xref
STREAMS with /W field widths + /Index subsections + FlateDecode
predictors 1/2/10-15, hybrid ``/XRefStm`` trailers, mixed /Prev chains)
→ trailer ``/Root`` → catalog → ``/Pages`` tree walk (recursive
``/Kids``, /Resources inherited per 7.7.3.4) → per-page ``/Contents``
(single ref or array), the filter set real corpora carry (FlateDecode,
legacy LZWDecode with /EarlyChange 0/1, ASCII85/ASCIIHex transport,
RunLengthDecode, chains of them, abbreviated names), type-2 entries
unpacked from /Type /ObjStm object streams (directory cached per
document), indirect ``/Length`` resolution, /ToUnicode CMaps for
subset-font text recovery (codespace/bfchar/bfrange, UTF-16BE incl.
surrogate pairs; fonts without one keep latin-1), then a
content-stream tokenizer that understands
``BT``/``ET`` blocks and the text-showing operators ``Tj``, ``'``, ``"``
and ``TJ`` (kerning numbers skipped), with ``Td``/``TD``/``T*``/``'``/``"``
emitting line breaks. String syntax per spec: balanced parens, ``\\``
escapes (n r t b f ( ) \\), octal codes, line continuations; hex strings
``<...>``. Text bytes default to PDFDocEncoding-adjacent Latin-1 (the
builder emits Latin-1); fonts carrying a /ToUnicode CMap are decoded
through it as described above.

Errors-as-data: every malformed input raises PdfFormatError (never a bare
struct/zlib/ValueError escape — the r4 DQT lesson); bomb guards cap object
count, stream size and recursion depth.

Reference parity note: the reference engine has no document path — this
extends the LLM-pipeline north star the same way the media codecs do.
"""

from __future__ import annotations

import re
import zlib

_MAX_OBJECTS = 100_000
_MAX_STREAM = 64 * 1024 * 1024
_MAX_DEPTH = 32


class PdfFormatError(ValueError):
    """Malformed PDF — becomes a decode_error row."""


class Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):  # pragma: no cover - debug only
        return f"{self.num} {self.gen} R"


class Name(str):
    """A /Name token (distinct from a string literal)."""


# --- object lexer/parser ------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?(\d+\.?\d*|\.\d+)")
_STR_SPECIAL = re.compile(rb"[()\\]")
_WS_COMMENT_RE = re.compile(rb"(?:[\x00\t\n\x0c\r ]+|%[^\r\n]*)+")
_REGULAR_TOKEN_RE = re.compile(rb"[^\x00\t\n\x0c\r ()<>\[\]{}/%]+")


class _Lexer:
    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos

    def _skip_ws(self) -> None:
        m = _WS_COMMENT_RE.match(self.d, self.p)
        if m is not None:
            self.p = m.end()

    def peek_token(self) -> bytes:
        save = self.p
        t = self.next_token()
        self.p = save
        return t

    def next_token(self) -> bytes:
        self._skip_ws()
        d, p, n = self.d, self.p, len(self.d)
        if p >= n:
            raise PdfFormatError("unexpected end of data")
        c = d[p:p + 1]
        if c == b"<":
            if d[p + 1:p + 2] == b"<":
                self.p = p + 2
                return b"<<"
            self.p = p + 1
            return b"<"
        if c == b">":
            if d[p + 1:p + 2] == b">":
                self.p = p + 2
                return b">>"
            self.p = p + 1
            return b">"
        if c in b"[]()/{}":
            self.p = p + 1
            return c
        # regular token: run to whitespace/delimiter (C-speed)
        m = _REGULAR_TOKEN_RE.match(d, p)
        if m is None:
            raise PdfFormatError(f"bad token at {p}")
        self.p = m.end()
        return m.group(0)

    # --- composite values -----------------------------------------------

    def parse_object(self, depth: int = 0):
        if depth > _MAX_DEPTH:
            raise PdfFormatError("object nesting exceeds cap")
        t = self.next_token()
        if t == b"<<":
            out: dict[str, object] = {}
            while True:
                nt = self.next_token()
                if nt == b">>":
                    return out
                if nt != b"/":
                    raise PdfFormatError("dict key must be a name")
                key = self.next_token().decode("latin-1")
                out[key] = self.parse_object(depth + 1)
        if t == b"[":
            arr: list[object] = []
            while True:
                self._skip_ws()
                if self.d[self.p:self.p + 1] == b"]":
                    self.p += 1
                    return arr
                arr.append(self.parse_object(depth + 1))
        if t == b"(":
            return self._parse_string()
        if t == b"<":
            return self._parse_hex_string()
        if t == b"/":
            return Name(self.next_token().decode("latin-1"))
        if t in (b"true", b"false"):
            return t == b"true"
        if t == b"null":
            return None
        if _NUM_RE.fullmatch(t):
            # possible indirect reference: INT INT R
            if b"." not in t:
                save = self.p
                try:
                    t2 = self.next_token()
                    t3 = self.next_token()
                    if t3 == b"R" and _NUM_RE.fullmatch(t2) and b"." not in t2:
                        return Ref(int(t), int(t2))
                except PdfFormatError:
                    pass
                self.p = save
                return int(t)
            return float(t)
        raise PdfFormatError(f"unexpected token {t!r}")

    def _parse_string(self) -> bytes:
        # literal runs are copied as slices between the next special
        # char found by a C-speed regex — no per-char Python appends
        # (the tottime leader in the throughput profile before this)
        d, p, n = self.d, self.p, len(self.d)
        out = bytearray()
        depth = 1
        while p < n:
            m = _STR_SPECIAL.search(d, p)
            if m is None:
                break
            q = m.start()
            out += d[p:q]                 # literal run
            c = d[q]
            p = q + 1
            if c == 0x28:                 # (
                depth += 1
                out.append(c)
            elif c == 0x29:               # )
                depth -= 1
                if depth == 0:
                    self.p = p
                    return bytes(out)
                out.append(c)
            else:                         # backslash escape
                if p >= n:
                    break
                e = d[p]
                if e in b"nrtbf":
                    out += {0x6E: b"\n", 0x72: b"\r", 0x74: b"\t",
                            0x62: b"\b", 0x66: b"\f"}[e]
                    p += 1
                elif e in b"()\\":
                    out.append(e)
                    p += 1
                elif 0x30 <= e <= 0x37:   # up to 3 octal digits
                    q2 = p
                    while q2 < n and q2 - p < 3 and 0x30 <= d[q2] <= 0x37:
                        q2 += 1
                    out.append(int(d[p:q2], 8) & 0xFF)
                    p = q2
                elif e in b"\r\n":        # line continuation
                    p += 1
                    if e == 0x0D and p < n and d[p] == 0x0A:
                        p += 1
                else:                     # unknown escape: char itself
                    out.append(e)
                    p += 1
        raise PdfFormatError("unterminated string literal")

    def _parse_hex_string(self) -> bytes:
        d, p, n = self.d, self.p, len(self.d)
        digits = []
        while p < n:
            c = d[p:p + 1]
            if c == b">":
                self.p = p + 1
                if len(digits) % 2:
                    digits.append("0")    # spec: odd count → trailing 0
                return bytes(int("".join(digits[i:i + 2]), 16)
                             for i in range(0, len(digits), 2))
            if c not in _WS:
                # strict hex only: isalnum() admitted letters like 't'
                # that blew up int(x, 16) with a raw ValueError on
                # fuzzed input (caught by the r7 xref-stream fuzz)
                if c not in b"0123456789abcdefABCDEF":
                    raise PdfFormatError("bad hex string")
                digits.append(c.decode())
            p += 1
        raise PdfFormatError("unterminated hex string")


# --- stream filters ---------------------------------------------------------------


def _inflate(raw: bytes) -> bytes:
    try:
        dec = zlib.decompressobj()
        out = dec.decompress(raw, _MAX_STREAM)
        if dec.unconsumed_tail:
            raise PdfFormatError("stream inflate exceeds cap")
        return out
    except zlib.error as e:
        raise PdfFormatError(f"bad FlateDecode stream: {e}") from e


def _ascii_hex_decode(raw: bytes) -> bytes:
    """ASCIIHexDecode (7.4.2): hex pairs, whitespace ignored, `>` ends
    the stream, an odd trailing digit implies a 0."""
    digits = []
    for b in raw:
        c = chr(b)
        if c == ">":
            break
        if b in _WS:
            continue
        if c not in "0123456789abcdefABCDEF":
            raise PdfFormatError(f"bad ASCIIHex digit {c!r}")
        digits.append(c)
    if len(digits) % 2:
        digits.append("0")
    return bytes(int("".join(digits[i:i + 2]), 16)
                 for i in range(0, len(digits), 2))


def _ascii85_decode(raw: bytes) -> bytes:
    """ASCII85Decode (7.4.3): 5 chars base-85 → 4 bytes, 'z' → 4 zero
    bytes (only between groups), `~>` terminates, a partial final group
    of n chars yields n-1 bytes."""
    out = bytearray()
    group: list[int] = []
    i, n = 0, len(raw)
    while i < n:
        b = raw[i]
        i += 1
        if b in _WS:
            continue
        if b == 0x7E:                             # ~ (expect >)
            break
        if b == 0x7A:                             # z
            if group:
                raise PdfFormatError("'z' inside ASCII85 group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= b <= 0x75:                 # ! .. u
            raise PdfFormatError(f"bad ASCII85 byte {b:#x}")
        group.append(b - 0x21)
        if len(group) == 5:
            v = 0
            for d in group:
                v = v * 85 + d
            if v > 0xFFFFFFFF:
                raise PdfFormatError("ASCII85 group overflows")
            out += v.to_bytes(4, "big")
            group = []
        if len(out) > _MAX_STREAM:
            raise PdfFormatError("ASCII85 output exceeds cap")
    if group:
        if len(group) == 1:
            raise PdfFormatError("lone trailing ASCII85 char")
        k = len(group)
        for d in group:
            if d > 84:
                raise PdfFormatError("bad ASCII85 digit")
        v = 0
        for j in range(5):
            v = v * 85 + (group[j] if j < k else 84)
        if v > 0xFFFFFFFF:
            raise PdfFormatError("ASCII85 group overflows")
        out += v.to_bytes(4, "big")[:k - 1]
    return bytes(out)


def _runlength_decode(raw: bytes) -> bytes:
    """RunLengthDecode (7.4.5): tag 0-127 copies tag+1 literals, tag
    129-255 repeats the next byte 257-tag times, tag 128 is EOD."""
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        tag = raw[i]
        i += 1
        if tag == 128:
            break
        if tag < 128:
            if i + tag + 1 > n:
                raise PdfFormatError("RunLength literal run truncated")
            out += raw[i:i + tag + 1]
            i += tag + 1
        else:
            if i >= n:
                raise PdfFormatError("RunLength repeat truncated")
            out += bytes([raw[i]]) * (257 - tag)
            i += 1
        if len(out) > _MAX_STREAM:
            raise PdfFormatError("RunLength output exceeds cap")
    return bytes(out)


def _lzw_decode(data: bytes, early_change: int) -> bytes:
    """LZWDecode (7.4.4): MSB-first 9..12-bit codes, clear=256, EOD=257
    (the TIFF variant tiff.py implements, but without a known output
    length — PDF streams end at EOD). /EarlyChange 1 (default) widens
    one code early; 0 widens exactly at table capacity."""
    out = bytearray()
    pos = bitbuf = bitlen = 0

    def get(width: int) -> int:
        nonlocal pos, bitbuf, bitlen
        while bitlen < width:
            if pos >= len(data):
                raise PdfFormatError("LZW stream truncated")
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            bitlen += 8
        bitlen -= width
        return (bitbuf >> bitlen) & ((1 << width) - 1)

    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([b]) for b in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        code = get(width)
        if code == 257:                           # EOD
            break
        if code == 256:                           # clear table
            reset()
            continue
        if prev is None:
            if code >= 256:
                raise PdfFormatError("LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):                  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise PdfFormatError("LZW code out of range")
        if len(table) + early_change == (1 << width) - 1 and width < 12:
            width += 1
        out += entry
        if len(out) > _MAX_STREAM:
            raise PdfFormatError("LZW output exceeds cap")
        prev = entry
    return bytes(out)


def _unpredict(data: bytes, parms: dict) -> bytes:
    """Undo a FlateDecode /DecodeParms predictor (7.4.4.4): 1 = none,
    2 = TIFF horizontal differencing, 10-15 = the PNG filter family (the
    per-row tag byte decides the actual filter — xref streams in the wild
    are almost always Predictor 12/Up). 8-bit components only, which is
    what PDF producers emit for xref and content streams."""
    predictor = parms.get("Predictor", 1)
    if not isinstance(predictor, int) or predictor == 1:
        if predictor == 1:
            return data
        raise PdfFormatError("bad /Predictor")
    colors = parms.get("Colors", 1)
    bpc = parms.get("BitsPerComponent", 8)
    columns = parms.get("Columns", 1)
    if not all(isinstance(v, int) and v > 0 for v in (colors, bpc, columns)):
        raise PdfFormatError("bad predictor parameters")
    if bpc != 8:
        raise PdfFormatError(f"unsupported predictor BitsPerComponent {bpc}")
    stride = columns * colors
    if stride <= 0 or stride > _MAX_STREAM:
        raise PdfFormatError("bad predictor row width")
    if predictor == 2:                     # TIFF horizontal differencing
        if len(data) % stride:
            raise PdfFormatError("predictor data is not whole rows")
        out = bytearray(data)
        for r0 in range(0, len(out), stride):
            for i in range(r0 + colors, r0 + stride):
                out[i] = (out[i] + out[i - colors]) & 0xFF
        return bytes(out)
    if 10 <= predictor <= 15:              # PNG family, tag per row
        from flink_job_spark.functions.png import PngFormatError, _unfilter
        if len(data) % (stride + 1):
            raise PdfFormatError("predictor data is not whole rows")
        try:
            return bytes(_unfilter(data, len(data) // (stride + 1),
                                   stride, colors))
        except PngFormatError as e:
            raise PdfFormatError(f"bad PNG predictor row: {e}") from e
    raise PdfFormatError(f"unsupported predictor {predictor}")


# --- document structure ---------------------------------------------------------------

# xref entry kinds: (1, byte_offset) = top-level object,
# (2, objstm_num, index) = compressed object inside an object stream
_XREF_TOPLEVEL = 1
_XREF_IN_OBJSTM = 2


class _Document:
    def __init__(self, data: bytes):
        self.d = data
        self.xref: dict[int, tuple] = {}
        self.trailer: dict[str, object] = {}
        self._objstm_cache: dict[int, tuple[list[tuple[int, int]], bytes,
                                            int]] = {}
        # objects currently being parsed: breaks /Length -> stream ->
        # /Length reference cycles that would otherwise recurse forever
        # (each get_object hop resets resolve()'s depth counter)
        self._parsing: set[int] = set()
        # encryption state: None file key = plaintext document. The key
        # is derived AFTER the xref bootstrap (xref streams are never
        # encrypted, 7.5.8.2, so the bootstrap needs no key).
        self._fkey: bytes | None = None
        self._crypt_aes = False
        self._encrypt_num: int | None = None
        self._parse_xref()
        self._setup_encryption()

    # -- standard security handler (7.6.3) ---------------------------------

    def _setup_encryption(self) -> None:
        """Derive the file key for the standard security handler with the
        EMPTY user password (the owner-password-only files crawls carry).
        RC4 (/V 1 and 2, /R 2 and 3) and AES-128 (/V 4 /R 4 with an
        /AESV2 crypt filter). A non-empty user password, any other
        handler, or malformed structure raises PdfFormatError — the
        errors-as-data row, never a wrong-plaintext decode."""
        enc_ref = self.trailer.get("Encrypt")
        if enc_ref is None:
            return
        from flink_job_spark.functions import pdf_crypt

        if isinstance(enc_ref, Ref):
            self._encrypt_num = enc_ref.num
        enc = self.resolve(enc_ref)
        if not isinstance(enc, dict):
            raise PdfFormatError("bad /Encrypt dict")
        if enc.get("Filter") != "Standard":
            raise PdfFormatError(
                f"unsupported security handler {enc.get('Filter')!r}")
        v, r = enc.get("V"), enc.get("R")
        if v not in (1, 2, 4) or r not in (2, 3, 4):
            raise PdfFormatError(f"unsupported /Encrypt V={v!r} R={r!r}")
        o, u, p = enc.get("O"), enc.get("U"), enc.get("P")
        if (not isinstance(o, bytes) or not isinstance(u, bytes)
                or len(o) < 32 or len(u) < 32 or not isinstance(p, int)):
            raise PdfFormatError("bad /Encrypt O/U/P")
        length = enc.get("Length", 40 if v == 1 else 128 if v == 4 else 40)
        if (not isinstance(length, int) or length % 8
                or not 40 <= length <= 128):
            raise PdfFormatError(f"bad /Encrypt /Length {length!r}")
        aes = False
        if v == 4:
            cf = self.resolve(enc.get("CF"))
            stmf, strf = enc.get("StmF", "Identity"), enc.get(
                "StrF", "Identity")
            if stmf != strf:
                raise PdfFormatError(
                    "split /StmF and /StrF filters unsupported")
            if stmf == "Identity":
                return                     # /V 4 with identity = plaintext
            if not isinstance(cf, dict):
                raise PdfFormatError("missing /CF for /V 4")
            stdcf = self.resolve(cf.get(stmf))
            if not isinstance(stdcf, dict):
                raise PdfFormatError(f"crypt filter {stmf!r} undefined")
            cfm = stdcf.get("CFM")
            if cfm == "AESV2":
                aes = True
            elif cfm != "V2":
                raise PdfFormatError(f"unsupported /CFM {cfm!r}")
        em = enc.get("EncryptMetadata", True)
        if not isinstance(em, bool):
            raise PdfFormatError("bad /EncryptMetadata")
        ids = self.trailer.get("ID")
        id0 = b""
        if isinstance(ids, list) and ids and isinstance(ids[0], bytes):
            id0 = ids[0]
        try:
            fkey = pdf_crypt.file_key(o, p, id0, r, length // 8,
                                      encrypt_metadata=em)
            if not pdf_crypt.check_user_password(fkey, u, id0, r):
                raise PdfFormatError(
                    "encrypted with a non-empty user password")
        except pdf_crypt.PdfCryptError as exc:
            raise PdfFormatError(f"bad encryption: {exc}") from exc
        self._fkey = fkey
        self._crypt_aes = aes

    def _decrypt_strings(self, v, num: int, gen: int):
        """Strings decrypt per object (Algorithm 1); stream bytes are
        handled separately and ObjStm-contained strings are already
        plaintext (7.5.7), so this only runs on top-level objects."""
        from flink_job_spark.functions import pdf_crypt

        if isinstance(v, bytes):
            if not v:
                return v
            try:
                return pdf_crypt.decrypt_object_bytes(
                    self._fkey, num, gen, v, self._crypt_aes)
            except pdf_crypt.PdfCryptError as exc:
                raise PdfFormatError(f"bad encrypted string: {exc}") \
                    from exc
        if isinstance(v, list):
            return [self._decrypt_strings(x, num, gen) for x in v]
        if isinstance(v, dict):
            return {k: (x if k == "__stream__"
                        else self._decrypt_strings(x, num, gen))
                    for k, x in v.items()}
        return v

    # -- xref chain (classic tables, xref streams, hybrid /XRefStm) --------

    def _parse_xref(self) -> None:
        d = self.d
        tail = d[-2048:]
        m = None
        for m in re.finditer(rb"startxref\s+(\d+)", tail):
            pass
        if m is None:
            raise PdfFormatError("startxref not found")
        off = int(m.group(1))
        seen: set[int] = set()
        while True:
            if off in seen:
                raise PdfFormatError("xref loop")
            seen.add(off)
            lex = _Lexer(d, max(0, off))
            if lex.peek_token() == b"xref":
                prev = self._parse_classic_section(lex)
            else:
                prev = self._parse_xref_stream(off)
            if prev is None:
                break
            if not isinstance(prev, int):
                raise PdfFormatError("bad /Prev")
            off = prev
        if len(self.xref) > _MAX_OBJECTS:
            raise PdfFormatError("object count exceeds cap")

    def _parse_classic_section(self, lex: _Lexer):
        """One classic xref table + trailer at lex's position; newest
        section wins, so entries setdefault. Returns /Prev or None."""
        if lex.next_token() != b"xref":
            raise PdfFormatError("classic xref table expected")
        entries: list[tuple[int, tuple]] = []
        while True:
            t = lex.peek_token()
            if t == b"trailer":
                lex.next_token()
                break
            start = lex.next_token()
            count = lex.next_token()
            if not (start.isdigit() and count.isdigit()):
                raise PdfFormatError("bad xref subsection header")
            start_i, count_i = int(start), int(count)
            if count_i > _MAX_OBJECTS:
                raise PdfFormatError("xref subsection exceeds cap")
            for i in range(count_i):
                eoff = lex.next_token()
                lex.next_token()          # generation
                kind = lex.next_token()
                if kind == b"n":
                    if not eoff.isdigit():
                        raise PdfFormatError("bad xref offset")
                    entries.append((start_i + i,
                                    (_XREF_TOPLEVEL, int(eoff))))
                elif kind != b"f":
                    raise PdfFormatError("bad xref entry kind")
        trailer = lex.parse_object()
        if not isinstance(trailer, dict):
            raise PdfFormatError("trailer is not a dict")
        # hybrid file (7.5.8.4): the /XRefStm holds the entries a 1.4
        # parser can't see; within this update level it takes precedence
        # over the classic table, so apply it FIRST (both setdefault)
        xstm = trailer.get("XRefStm")
        if xstm is not None:
            if not isinstance(xstm, int):
                raise PdfFormatError("bad /XRefStm")
            self._parse_xref_stream(xstm)
        for num, entry in entries:
            self.xref.setdefault(num, entry)
        for k, v in trailer.items():
            self.trailer.setdefault(k, v)
        return trailer.get("Prev")

    def _parse_xref_stream(self, off: int):
        """A /Type /XRef cross-reference stream (7.5.8, PDF >= 1.5): W
        field widths, /Index subsection ranges, type-2 entries pointing
        into object streams. Returns /Prev or None."""
        num, obj = self._parse_toplevel_at(off, None)
        if not isinstance(obj, dict) or "__stream__" not in obj:
            raise PdfFormatError("xref stream expected")
        if obj.get("Type") != "XRef":
            raise PdfFormatError("xref stream missing /Type /XRef")
        size = obj.get("Size")
        if not isinstance(size, int) or size < 0 or size > _MAX_OBJECTS:
            raise PdfFormatError("bad xref stream /Size")
        w = obj.get("W")
        if (not isinstance(w, list) or len(w) != 3
                or not all(isinstance(x, int) and 0 <= x <= 8 for x in w)):
            raise PdfFormatError("bad xref stream /W")
        w0, w1, w2 = w
        index = obj.get("Index", [0, size])
        if (not isinstance(index, list) or len(index) % 2
                or not all(isinstance(x, int) and x >= 0 for x in index)):
            raise PdfFormatError("bad xref stream /Index")
        data = obj["__stream__"]
        rowlen = w0 + w1 + w2
        if rowlen == 0:
            raise PdfFormatError("zero-width xref stream rows")
        pos = 0
        for si in range(0, len(index), 2):
            start, count = index[si], index[si + 1]
            if count > _MAX_OBJECTS:
                raise PdfFormatError("xref stream subsection exceeds cap")
            for i in range(count):
                row = data[pos:pos + rowlen]
                if len(row) < rowlen:
                    raise PdfFormatError("xref stream data truncated")
                pos += rowlen
                typ = (int.from_bytes(row[:w0], "big") if w0 else 1)
                f2 = int.from_bytes(row[w0:w0 + w1], "big")
                f3 = int.from_bytes(row[w0 + w1:], "big")
                onum = start + i
                if typ == 1:
                    self.xref.setdefault(onum, (_XREF_TOPLEVEL, f2))
                elif typ == 2:
                    self.xref.setdefault(onum, (_XREF_IN_OBJSTM, f2, f3))
                elif typ != 0:
                    # 7.5.8.3: unknown types refer to the null object —
                    # skipped, not an error (forward compatibility)
                    pass
        for k, v in obj.items():
            if k != "__stream__":
                self.trailer.setdefault(k, v)
        return obj.get("Prev")

    # -- object access -----------------------------------------------------

    def resolve(self, v, depth: int = 0):
        while isinstance(v, Ref):
            if depth > _MAX_DEPTH:
                raise PdfFormatError("reference chain exceeds cap")
            v = self.get_object(v.num)
            depth += 1
        return v

    def get_object(self, num: int):
        entry = self.xref.get(num)
        if entry is None:
            raise PdfFormatError(f"object {num} not in xref")
        if num in self._parsing:
            raise PdfFormatError(f"circular reference through object {num}")
        self._parsing.add(num)
        try:
            if entry[0] == _XREF_IN_OBJSTM:
                return self._objstm_object(entry[1], entry[2], num)
            off = entry[1]
            _, obj = self._parse_toplevel_at(off, num)
            return obj
        finally:
            self._parsing.discard(num)

    def _parse_toplevel_at(self, off: int, want: int | None):
        """Parse `num gen obj ... [stream]` at a byte offset; returns
        (num, obj) with filters applied to any stream body. `want` pins
        the expected object number (None while bootstrapping the xref
        chain, when numbers aren't known yet)."""
        if not isinstance(off, int) or off < 0 or off >= len(self.d):
            raise PdfFormatError(f"object offset {off!r} out of range")
        lex = _Lexer(self.d, off)
        t1, t2, t3 = lex.next_token(), lex.next_token(), lex.next_token()
        if t3 != b"obj" or not t1.isdigit() or not t2.isdigit():
            raise PdfFormatError(f"object header expected at {off}")
        num = int(t1)
        if want is not None and num != want:
            raise PdfFormatError(f"object header mismatch for {want}")
        gen = int(t2)
        obj = lex.parse_object()
        crypt = self._fkey is not None and num != self._encrypt_num
        if crypt:
            obj = self._decrypt_strings(obj, num, gen)
        lex._skip_ws()
        if self.d[lex.p:lex.p + 6] == b"stream":
            if not isinstance(obj, dict):
                raise PdfFormatError("stream without dict")
            p = lex.p + 6
            if self.d[p:p + 2] == b"\r\n":
                p += 2
            elif self.d[p:p + 1] == b"\n":
                p += 1
            length = self.resolve(obj.get("Length"))
            if not isinstance(length, int) or length < 0 or length > _MAX_STREAM:
                raise PdfFormatError("bad stream /Length")
            if p + length > len(self.d):
                raise PdfFormatError("stream overruns file")
            raw = self.d[p:p + length]
            # xref streams are never encrypted (7.5.8.2); metadata
            # streams keep plaintext when /EncryptMetadata false (the
            # only stream type the flag exempts)
            if crypt and obj.get("Type") not in ("XRef", "Metadata"):
                from flink_job_spark.functions import pdf_crypt
                try:
                    raw = pdf_crypt.decrypt_object_bytes(
                        self._fkey, num, gen, raw, self._crypt_aes)
                except pdf_crypt.PdfCryptError as exc:
                    raise PdfFormatError(
                        f"bad encrypted stream: {exc}") from exc
            obj["__stream__"] = self._apply_filters(obj, raw)
        return num, obj

    def _apply_filters(self, obj: dict, raw: bytes) -> bytes:
        filt = self.resolve(obj.get("Filter"))
        if filt is None:
            return raw
        parms = self.resolve(obj.get("DecodeParms", obj.get("DP")))
        filters = filt if isinstance(filt, list) else [filt]
        parms_list = parms if isinstance(parms, list) else [parms]
        for i, f in enumerate(filters):
            f = self.resolve(f)
            p = self.resolve(parms_list[i]) if i < len(parms_list) else None
            if p is not None and not isinstance(p, dict):
                raise PdfFormatError("bad /DecodeParms")
            if f in ("FlateDecode", "Fl"):
                raw = _inflate(raw)
            elif f in ("LZWDecode", "LZW"):
                ec = (p or {}).get("EarlyChange", 1)
                if ec not in (0, 1):
                    raise PdfFormatError("bad /EarlyChange")
                raw = _lzw_decode(raw, ec)
            elif f in ("ASCIIHexDecode", "AHx"):
                raw = _ascii_hex_decode(raw)
            elif f in ("ASCII85Decode", "A85"):
                raw = _ascii85_decode(raw)
            elif f in ("RunLengthDecode", "RL"):
                raw = _runlength_decode(raw)
            else:
                raise PdfFormatError(f"unsupported filter {f}")
            if isinstance(p, dict) and f in ("FlateDecode", "Fl",
                                             "LZWDecode", "LZW"):
                raw = _unpredict(raw, p)
        return raw

    def _objstm_object(self, stm_num: int, idx: int, num: int):
        """Fetch a type-2 (compressed) object out of a /Type /ObjStm
        (7.5.7). The stream parses once per document and caches its
        (objnum, offset) directory."""
        cached = self._objstm_cache.get(stm_num)
        if cached is None:
            entry = self.xref.get(stm_num)
            if entry is None or entry[0] != _XREF_TOPLEVEL:
                # an ObjStm carries a stream, so it can never itself
                # live inside another object stream (7.5.7)
                raise PdfFormatError(f"object stream {stm_num} not "
                                     "top-level")
            _, stm = self._parse_toplevel_at(entry[1], stm_num)
            if (not isinstance(stm, dict) or stm.get("Type") != "ObjStm"
                    or "__stream__" not in stm):
                raise PdfFormatError(f"object {stm_num} is not an ObjStm")
            n = stm.get("N")
            first = stm.get("First")
            if (not isinstance(n, int) or not isinstance(first, int)
                    or n < 0 or n > _MAX_OBJECTS or first < 0):
                raise PdfFormatError("bad ObjStm /N or /First")
            data = stm["__stream__"]
            hdr = _Lexer(data, 0)
            pairs: list[tuple[int, int]] = []
            for _ in range(n):
                tn, to = hdr.next_token(), hdr.next_token()
                if not (tn.isdigit() and to.isdigit()):
                    raise PdfFormatError("bad ObjStm directory")
                pairs.append((int(tn), int(to)))
            cached = (pairs, data, first)
            self._objstm_cache[stm_num] = cached
        pairs, data, first = cached
        if idx >= len(pairs) or pairs[idx][0] != num:
            raise PdfFormatError(f"object {num} not at ObjStm index {idx}")
        off = first + pairs[idx][1]
        if off >= len(data):
            raise PdfFormatError("ObjStm offset out of range")
        return _Lexer(data, off).parse_object()


# --- /ToUnicode CMaps (9.10.3) ----------------------------------------------------------
#
# Real-world PDFs embed subset fonts whose string bytes are arbitrary
# glyph codes — without the font's /ToUnicode CMap the extracted "text"
# is gibberish. Supported: codespace ranges (1- or 2-byte codes),
# bfchar pairs, bfrange with both increment and array destinations,
# UTF-16BE destinations (surrogate pairs included). Fonts without a
# ToUnicode keep the legacy latin-1 byte mapping.

_MAX_CMAP_ENTRIES = 65_536


class _ToUnicode:
    __slots__ = ("width", "chars", "ranges")

    def __init__(self, width: int, chars: dict[int, str],
                 ranges: list[tuple[int, int, object]]) -> None:
        self.width = width
        self.chars = chars
        self.ranges = ranges

    def decode(self, bs: bytes) -> str:
        w = self.width
        out: list[str] = []
        for i in range(0, len(bs) - w + 1, w):
            code = int.from_bytes(bs[i:i + w], "big")
            got = self.chars.get(code)
            if got is None:
                for lo, hi, dst in self.ranges:
                    if lo <= code <= hi:
                        if isinstance(dst, list):
                            got = dst[code - lo]
                        else:                     # increment destination
                            base, blen = dst
                            got = _utf16be((base + code - lo)
                                           .to_bytes(blen, "big"))
                        break
            if got is None:                       # unmapped: keep the code
                got = chr(code) if code < 0x110000 else "�"
            out.append(got)
        return "".join(out)


def _utf16be(b: bytes) -> str:
    try:
        return b.decode("utf-16-be")
    except UnicodeDecodeError as e:
        raise PdfFormatError(f"bad UTF-16 in ToUnicode: {e}") from e


def _parse_tounicode(data: bytes) -> _ToUnicode:
    """Parse the CMap program: only the codespace/bfchar/bfrange
    sections matter; the PostScript scaffolding tokens are skipped."""
    lex = _Lexer(data)
    width = 0
    chars: dict[int, str] = {}
    ranges: list[tuple[int, int, object]] = []
    n_entries = 0

    def bump() -> None:
        nonlocal n_entries
        n_entries += 1
        if n_entries > _MAX_CMAP_ENTRIES:
            raise PdfFormatError("CMap entry count exceeds cap")

    while lex.p < len(data):
        lex._skip_ws()
        if lex.p >= len(data):
            break
        try:
            t = lex.next_token()
        except PdfFormatError:
            break
        if t == b"begincodespacerange":
            while lex.peek_token() != b"endcodespacerange":
                bump()
                lo = lex.parse_object()
                lex.parse_object()        # hi (same width by spec)
                if not isinstance(lo, bytes) or not 1 <= len(lo) <= 2:
                    raise PdfFormatError("bad codespace range")
                width = max(width, len(lo))
            lex.next_token()
        elif t == b"beginbfchar":
            while lex.peek_token() != b"endbfchar":
                bump()
                src = lex.parse_object()
                dst = lex.parse_object()
                if not isinstance(src, bytes) or not isinstance(dst, bytes):
                    raise PdfFormatError("bad bfchar pair")
                width = max(width, len(src))
                chars[int.from_bytes(src, "big")] = _utf16be(dst)
            lex.next_token()
        elif t == b"beginbfrange":
            while lex.peek_token() != b"endbfrange":
                bump()
                lo_b = lex.parse_object()
                hi_b = lex.parse_object()
                dst = lex.parse_object()
                if not isinstance(lo_b, bytes) or not isinstance(hi_b, bytes):
                    raise PdfFormatError("bad bfrange bounds")
                width = max(width, len(lo_b))
                lo = int.from_bytes(lo_b, "big")
                hi = int.from_bytes(hi_b, "big")
                if hi < lo or hi - lo >= _MAX_CMAP_ENTRIES:
                    raise PdfFormatError("bad bfrange extent")
                if isinstance(dst, bytes):
                    ranges.append((lo, hi,
                                   (int.from_bytes(dst, "big"), len(dst))))
                elif isinstance(dst, list):
                    if len(dst) != hi - lo + 1 or not all(
                            isinstance(x, bytes) for x in dst):
                        raise PdfFormatError("bad bfrange array")
                    ranges.append((lo, hi, [_utf16be(x) for x in dst]))
                else:
                    raise PdfFormatError("bad bfrange destination")
            lex.next_token()
    return _ToUnicode(width or 1, chars, ranges)


# --- content-stream text extraction ----------------------------------------------------

_SHOW_OPS = (b"Tj", b"'", b'"')
_NEWLINE_OPS = (b"Td", b"TD", b"T*", b"'", b'"')

# One C-speed scan per content stream: stop only at string starts, hex
# strings, dict-opens, comments, and the nine operators text extraction
# cares about — numbers, names and every other operator are skipped by
# the regex engine, not a Python loop (tools/container_throughput.py
# measured the token-at-a-time walker at 0.4 MB/s; this scanner is the
# fix). Lookarounds keep operator matches off identifier tails and /Names.
_CONTENT_RE = re.compile(
    rb"\(|<<|<|%|/|(?<![A-Za-z0-9*/])(BT|ET|Tj|TJ|Td|TD|T\*|'|\"|Tf)"
    rb"(?![A-Za-z0-9*])")


def _extract_content_text(content: bytes,
                          fonts: dict[str, _ToUnicode] | None = None
                          ) -> list[str]:
    """Walk one content stream; return text chunks (newline markers as
    separate '\\n' entries). Only text inside BT/ET is taken.

    Strings seen since the last recognized operator are the pending
    operands: Tj/'/\" show the last one, TJ shows all of them (its array
    brackets are transparent to the scan). An unrecognized operator
    between a string and its show op would mis-attribute the string —
    per spec that sequence is invalid, and text extractors tolerate it
    the same way.

    `fonts` maps resource names to /ToUnicode decoders; the Tf operator
    (tracked via the last-seen /Name) switches the active decoder.
    Strings under a font with no ToUnicode decode latin-1 as before.
    """
    chunks: list[str] = []
    in_text = False
    pending: list[bytes] = []
    last_name: str | None = None
    cur_font: _ToUnicode | None = None
    pos = 0
    n = len(content)

    def text_of(s: bytes) -> str:
        return cur_font.decode(s) if cur_font else s.decode("latin-1")

    while pos < n:
        m = _CONTENT_RE.search(content, pos)
        if m is None:
            break
        tok = m.group(0)
        pos = m.end()
        if tok == b"(":
            lex = _Lexer(content, pos)
            try:
                pending.append(lex._parse_string())
                pos = lex.p
            except PdfFormatError:
                pass                      # unterminated tail: scan ends
        elif tok == b"<<":
            continue                      # dict open: structural, skip
        elif tok == b"<":
            lex = _Lexer(content, pos)
            try:
                pending.append(lex._parse_hex_string())
                pos = lex.p
            except PdfFormatError:
                pass
        elif tok == b"%":
            nl = content.find(b"\n", pos)
            pos = n if nl < 0 else nl + 1
        elif tok == b"/":
            nm = _REGULAR_TOKEN_RE.match(content, pos)
            if nm is not None:
                last_name = nm.group(0).decode("latin-1")
                pos = nm.end()
        else:                             # one of the ten operators
            op = m.group(1)
            if op == b"Tf":
                if fonts is not None and last_name is not None:
                    cur_font = fonts.get(last_name)
                pending.clear()
                continue
            if op == b"BT":
                # a new text object starts a new line: without this,
                # show ops from adjacent BT blocks (or concatenated
                # /Contents streams) run together with no separator
                if chunks and chunks[-1] != "\n":
                    chunks.append("\n")
                in_text = True
            elif op == b"ET":
                in_text = False
            elif in_text and op in _NEWLINE_OPS:
                if chunks and chunks[-1] != "\n":
                    chunks.append("\n")
            if in_text and op in _SHOW_OPS:
                if pending:
                    chunks.append(text_of(pending[-1]))
            elif in_text and op == b"TJ":
                chunks.extend(text_of(s) for s in pending)
            pending.clear()
    return chunks


def extract_pdf_text(data: bytes) -> dict:
    """Parse the object graph and extract all page text.

    Returns ``{"n_pages": int, "text": str}`` — text is per-page chunks
    joined, line-break operators rendered as ``\\n``, pages separated by
    ``\\n``. Raises PdfFormatError on any malformed input.
    """
    if not data.startswith(b"%PDF-"):
        raise PdfFormatError("missing %PDF header")
    doc = _Document(data)
    root = doc.resolve(doc.trailer.get("Root"))
    if not isinstance(root, dict):
        raise PdfFormatError("missing /Root catalog")
    pages_obj = doc.resolve(root.get("Pages"))
    if not isinstance(pages_obj, dict):
        raise PdfFormatError("missing /Pages")

    page_texts: list[str] = []

    def fonts_of(resources) -> dict[str, _ToUnicode]:
        """Resource /Font entries with a parseable /ToUnicode CMap; a
        broken CMap degrades that font to the latin-1 fallback (the
        standard extractor behavior), never an error row."""
        fonts: dict[str, _ToUnicode] = {}
        res = doc.resolve(resources)
        if not isinstance(res, dict):
            return fonts
        fdict = doc.resolve(res.get("Font"))
        if not isinstance(fdict, dict):
            return fonts
        for name, fref in fdict.items():
            f = doc.resolve(fref)
            if not isinstance(f, dict):
                continue
            tu = doc.resolve(f.get("ToUnicode"))
            if isinstance(tu, dict) and "__stream__" in tu:
                try:
                    fonts[name] = _parse_tounicode(tu["__stream__"])
                except PdfFormatError:
                    pass
        return fonts

    def walk(node: dict, depth: int, inherited_res=None) -> None:
        if depth > _MAX_DEPTH:
            raise PdfFormatError("page tree exceeds depth cap")
        typ = node.get("Type")
        resources = node.get("Resources", inherited_res)  # 7.7.3.4 inherit
        if typ == "Pages" or (typ is None and "Kids" in node):
            kids = doc.resolve(node.get("Kids"))
            if not isinstance(kids, list):
                raise PdfFormatError("bad /Kids")
            if len(kids) > _MAX_OBJECTS:
                raise PdfFormatError("kid count exceeds cap")
            for k in kids:
                kid = doc.resolve(k)
                if not isinstance(kid, dict):
                    raise PdfFormatError("bad page-tree kid")
                walk(kid, depth + 1, resources)
        elif typ == "Page":
            contents = doc.resolve(node.get("Contents"))
            streams: list[bytes] = []
            if contents is None:
                pass
            elif isinstance(contents, dict):
                streams.append(contents.get("__stream__", b""))
            elif isinstance(contents, list):
                for cref in contents:
                    cobj = doc.resolve(cref)
                    if isinstance(cobj, dict):
                        streams.append(cobj.get("__stream__", b""))
            else:
                raise PdfFormatError("bad /Contents")
            # ISO 32000: a /Contents array is one logical stream with
            # whitespace between the parts
            chunks = _extract_content_text(b"\n".join(streams),
                                           fonts_of(resources))
            page_texts.append("".join(chunks).strip("\n"))
        else:
            raise PdfFormatError(f"unexpected page-tree node type {typ!r}")

    walk(pages_obj, 0)
    return {"n_pages": len(page_texts), "text": "\n".join(page_texts)}


# --- builder ---------------------------------------------------------------------------


def _escape_pdf_string(s: str) -> bytes:
    out = bytearray()
    for ch in s.encode("latin-1"):
        if ch in b"()\\":
            out += b"\\" + bytes([ch])
        elif ch in (0x0A,):
            out += b"\\n"
        elif ch in (0x0D,):
            out += b"\\r"
        else:
            out.append(ch)
    return bytes(out)


def _ascii85_encode(raw: bytes) -> bytes:
    """ASCII85 encoder for the builder twin (4 bytes → 5 chars, 'z' for
    zero groups, partial final group, `~>` terminator)."""
    out = bytearray()
    for i in range(0, len(raw), 4):
        chunk = raw[i:i + 4]
        k = len(chunk)
        v = int.from_bytes(chunk + bytes(4 - k), "big")
        if v == 0 and k == 4:
            out.append(0x7A)              # z
            continue
        digits = []
        for _ in range(5):
            digits.append(v % 85)
            v //= 85
        out += bytes(0x21 + d for d in reversed(digits))[:k + 1]
    return bytes(out) + b"~>"


def _png_up_predict(rows: list[bytes]) -> bytes:
    """PNG Up (filter 2) forward-predict fixed-width rows — what real PDF
    producers emit for xref streams (Predictor 12)."""
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for row in rows:
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def build_pdf(pages: list[list[str]], *, compress: bool = False,
              use_tj_array: bool = False, xref_stream: bool = False,
              use_objstm: bool = False, lzw: bool = False,
              ascii85: bool = False, cid_font: bool = False,
              encrypt: str | None = None,
              user_pw: bytes = b"",
              info_title: str | None = None) -> bytes:
    """Build a valid one-generation PDF: one content stream per page;
    each page is a list of text lines (rendered with Td line moves).

    ``compress`` FlateDecodes the content streams; ``use_tj_array`` shows
    each line via a kerned TJ array instead of Tj (split mid-line, with a
    numeric kern element the extractor must skip).

    ``cid_font`` shows all text through a Type0-style font whose string
    bytes are 2-byte glyph codes mapped back via an embedded /ToUnicode
    CMap (the subset-font layout real PDFs ship) — the extractor only
    recovers the text by actually parsing the CMap.

    ``lzw`` LZWDecode-compresses the content streams instead of Flate
    (the pre-Flate legacy filter still common in old corpora);
    ``ascii85`` additionally wraps the (possibly compressed) bytes in
    an ASCII85Decode transport layer, exercising filter CHAINS.

    ``xref_stream`` writes a PDF 1.5 cross-reference STREAM (W [1 2 2],
    FlateDecode + PNG Up Predictor 12 — the layout the majority of
    real-world PDFs use) instead of a classic table. ``use_objstm``
    additionally packs every non-stream object (catalog, page tree, font,
    page dicts) into a /Type /ObjStm object stream referenced by type-2
    entries; it implies ``xref_stream`` since classic tables cannot
    express compressed objects.

    ``encrypt`` applies the standard security handler (7.6.3) with owner
    password ``b"owner-secret"`` and the given ``user_pw`` (empty by
    default — the owner-password-only layout crawls carry): ``"rc4-40"``
    (/V 1 /R 2), ``"rc4-128"`` (/V 2 /R 3 /Length 128) or ``"aesv2"``
    (/V 4 /R 4 with an /AESV2 /StdCF). Stream bytes encrypt after
    filters; O/U land as hex strings; xref streams stay plaintext.
    """
    if use_objstm:
        xref_stream = True

    crypt_aes = False
    fkey = id0 = None
    if encrypt is not None:
        import hashlib

        from flink_job_spark.functions import pdf_crypt

        v, r, bits = {"rc4-40": (1, 2, 40), "rc4-128": (2, 3, 128),
                      "aesv2": (4, 4, 128)}[encrypt]
        crypt_aes = encrypt == "aesv2"
        id0 = hashlib.md5(b"fixture-id" + repr(pages).encode()).digest()
        crypt_p = -44                      # print+copy denied, typical
        crypt_o = pdf_crypt.compute_o(b"owner-secret", user_pw, r,
                                      bits // 8)
        fkey = pdf_crypt.file_key(crypt_o, crypt_p, id0, r, bits // 8,
                                  user_pw=user_pw)
        crypt_u = pdf_crypt.compute_u(fkey, id0, r)

    def enc_stream(num: int, data: bytes) -> bytes:
        if fkey is None:
            return data
        from flink_job_spark.functions import pdf_crypt
        return pdf_crypt.encrypt_object_bytes(fkey, num, 0, data,
                                              crypt_aes)
    objects: dict[int, bytes] = {}
    in_objstm: set[int] = set()
    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, then per page
    # (4+2i page, 5+2i content)
    kids = " ".join(f"{4 + 2 * i} 0 R" for i in range(n_pages))
    objects[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objects[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
                  ).encode()
    objects[3] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    if use_objstm:
        in_objstm.update((1, 2, 3))

    code_of: dict[str, int] = {}
    if cid_font:
        # global charset -> sequential 2-byte codes; /ToUnicode maps back
        charset = sorted({ch for lines in pages for ln in lines
                          for ch in ln})
        code_of = {ch: i + 1 for i, ch in enumerate(charset)}
        tounicode_num = 4 + 2 * n_pages
        font2_num = tounicode_num + 1
        bf = []
        for ch, code in code_of.items():
            dst = ch.encode("utf-16-be").hex()
            bf.append(f"<{code:04x}> <{dst}>")
        # bfchar blocks carry at most 100 entries each (9.10.3)
        blocks = "".join(
            f"{min(100, len(bf) - i)} beginbfchar\n"
            + "\n".join(bf[i:i + 100]) + "\nendbfchar\n"
            for i in range(0, len(bf), 100))
        cmap = ("/CIDInit /ProcSet findresource begin\n"
                "begincmap\n"
                "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
                + blocks + "endcmap\nend").encode("latin-1")
        cmap = enc_stream(tounicode_num, cmap)
        objects[tounicode_num] = (
            b"<< /Length " + str(len(cmap)).encode()
            + b" >>\nstream\n" + cmap + b"\nendstream")
        objects[font2_num] = (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /Fake-Subset "
            f"/Encoding /Identity-H /ToUnicode {tounicode_num} 0 R >>"
            ).encode()
        if use_objstm:
            in_objstm.add(font2_num)      # the CMap stream stays top-level
    for i, lines in enumerate(pages):
        page_num, content_num = 4 + 2 * i, 5 + 2 * i
        fname = b"/F2" if cid_font else b"/F1"
        parts = [b"BT " + fname + b" 12 Tf 72 720 Td"]

        def enc(seg: str) -> bytes:
            if cid_font:
                return b"<" + "".join(f"{code_of[ch]:04x}"
                                      for ch in seg).encode() + b">"
            return b"(" + _escape_pdf_string(seg) + b")"

        for j, line in enumerate(lines):
            if j > 0:
                parts.append(b"0 -14 Td")
            if use_tj_array and len(line) > 1:
                mid = len(line) // 2
                parts.append(b"[" + enc(line[:mid]) + b" -250 "
                             + enc(line[mid:]) + b"] TJ")
            else:
                parts.append(enc(line) + b" Tj")
        parts.append(b"ET")
        content = b" ".join(parts)
        filters: list[bytes] = []
        if lzw:
            from flink_job_spark.functions.tiff import lzw_encode
            content = lzw_encode(content)
            filters.append(b"/LZWDecode")
        elif compress:
            content = zlib.compress(content)
            filters.append(b"/FlateDecode")
        if ascii85:
            content = _ascii85_encode(content)
            # decoding order: transport layer first, then decompression
            filters.insert(0, b"/ASCII85Decode")
        if len(filters) == 1:
            filt = b" /Filter " + filters[0]
        elif filters:
            filt = b" /Filter [" + b" ".join(filters) + b"]"
        else:
            filt = b""
        content = enc_stream(content_num, content)
        objects[content_num] = (
            b"<< /Length " + str(len(content)).encode() + filt
            + b" >>\nstream\n" + content + b"\nendstream")
        f2 = f" /F2 {4 + 2 * n_pages + 1} 0 R" if cid_font else ""
        objects[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R{f2} >> >> "
            f"/Contents {content_num} 0 R >>").encode()
        if use_objstm:
            in_objstm.add(page_num)       # page dicts pack; streams can't

    enc_trailer = b""
    if info_title is not None:
        # a document /Info with a /Title STRING — the value the string
        # decryption path (hex-encoded ciphertext) is exercised through
        info_num = max(objects) + 1
        tb = info_title.encode("latin-1")
        objects[info_num] = (b"<< /Title <"
                             + enc_stream(info_num, tb).hex().encode()
                             + b"> >>")
        enc_trailer += f" /Info {info_num} 0 R".encode()

    enc_num = None
    if encrypt is not None:
        enc_num = max(objects) + 1
        if encrypt == "rc4-40":
            body = b"/V 1 /R 2"
        elif encrypt == "rc4-128":
            body = b"/V 2 /R 3 /Length 128"
        else:
            body = (b"/V 4 /R 4 /Length 128 /CF << /StdCF << /CFM /AESV2 "
                    b"/AuthEvent /DocOpen /Length 16 >> >> "
                    b"/StmF /StdCF /StrF /StdCF")
        objects[enc_num] = (
            b"<< /Filter /Standard " + body
            + f" /P {crypt_p}".encode()
            + b" /O <" + crypt_o.hex().encode() + b">"
            + b" /U <" + crypt_u.hex().encode() + b"> >>")
        idhex = b"<" + id0.hex().encode() + b">"
        enc_trailer += (f" /Encrypt {enc_num} 0 R ".encode()
                        + b"/ID [" + idhex + b" " + idhex + b"]")

    version = b"1.5" if xref_stream else b"1.4"
    out = bytearray(b"%PDF-" + version + b"\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    objstm_pos: dict[int, int] = {}       # obj num -> index inside ObjStm
    objstm_num = max(objects) + 1
    for num in sorted(objects):
        if num in in_objstm:
            continue
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    if use_objstm:
        packed = sorted(in_objstm)
        hdr_parts, bodies, boff = [], [], 0
        for num in packed:
            hdr_parts.append(f"{num} {boff}")
            bodies.append(objects[num])
            boff += len(objects[num]) + 1
        header = (" ".join(hdr_parts)).encode() + b"\n"
        stm_data = enc_stream(objstm_num,
                              zlib.compress(header + b"\n".join(bodies)
                                            + b"\n"))
        offsets[objstm_num] = len(out)
        out += (f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(packed)} "
                f"/First {len(header)} /Length {len(stm_data)} "
                f"/Filter /FlateDecode >>\n").encode()
        out += b"stream\n" + stm_data + b"\nendstream\nendobj\n"
        objstm_pos = {num: i for i, num in enumerate(packed)}

    if not xref_stream:
        xref_off = len(out)
        n_obj = max(objects) + 1
        out += f"xref\n0 {n_obj}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, n_obj):
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        out += (f"trailer\n<< /Size {n_obj} /Root 1 0 R".encode()
                + enc_trailer
                + f" >>\nstartxref\n{xref_off}\n%%EOF\n".encode())
        return bytes(out)

    # PDF 1.5 cross-reference stream: W [1 4 2], PNG Up predictor
    xref_num = (objstm_num + 1) if use_objstm else max(objects) + 1
    xref_off = len(out)
    size = xref_num + 1
    rows = [bytes([0, 0, 0, 0, 0, 0xFF, 0xFF])]    # object 0: free
    for num in range(1, size):
        if num in objstm_pos:
            rows.append(bytes([2]) + objstm_num.to_bytes(4, "big")
                        + objstm_pos[num].to_bytes(2, "big"))
        else:
            off = xref_off if num == xref_num else offsets[num]
            rows.append(bytes([1]) + off.to_bytes(4, "big")
                        + (0).to_bytes(2, "big"))
    xdata = zlib.compress(_png_up_predict(rows))
    out += (f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
            f"/Index [0 {size}] /Root 1 0 R /Length {len(xdata)} "
            f"/Filter /FlateDecode "
            f"/DecodeParms << /Predictor 12 /Columns 7 >>").encode()
    out += enc_trailer + b" >>\n"
    out += b"stream\n" + xdata + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)
