"""PDF text extraction (functions/pdf.py — r5 wave 8): object-graph
parsing, content-stream tokenization, string escapes, corruption totality."""

from __future__ import annotations

import random
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_job_spark.functions.pdf import (
    PdfFormatError,
    _Lexer,
    build_pdf,
    extract_pdf_text,
)

# --- roundtrip -------------------------------------------------------------------


def test_pdf_roundtrip_multipage():
    r = extract_pdf_text(build_pdf(
        [["Hello World", "second line"], ["page two"]]))
    assert r == {"n_pages": 2, "text": "Hello World\nsecond line\npage two"}


def test_pdf_escape_characters():
    lines = ["parens (nested (deep)) ok", "back\\slash and 50% off",
             "newline\nliteral"]
    r = extract_pdf_text(build_pdf([lines]))
    assert r["text"] == "\n".join(lines)


def test_pdf_compressed_and_tj_arrays():
    pages = [["kerned line alpha", "béta çedille"], ["final"]]
    for compress in (False, True):
        for tj in (False, True):
            r = extract_pdf_text(build_pdf(pages, compress=compress,
                                           use_tj_array=tj))
            assert r["text"] == "kerned line alpha\nbéta çedille\nfinal", (
                compress, tj)
            assert r["n_pages"] == 2


def test_pdf_empty_page():
    assert extract_pdf_text(build_pdf([[]])) == {"n_pages": 1, "text": ""}


_LINE_ALPHABET = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=255,
                           blacklist_characters="\x7f"),
    min_size=0, max_size=40)


@given(st.lists(st.lists(_LINE_ALPHABET, max_size=4), min_size=1, max_size=4),
       st.booleans(), st.booleans())
@settings(max_examples=60, deadline=None)
def test_pdf_roundtrip_property(pages, compress, tj):
    r = extract_pdf_text(build_pdf(pages, compress=compress, use_tj_array=tj))
    assert r["n_pages"] == len(pages)
    expect = "\n".join("\n".join(lines).strip("\n") for lines in pages)
    # builder renders each line via a Td move; empty lines still emit the
    # break, matching join semantics after per-page strip
    assert r["text"] == expect


# --- parser hardening ---------------------------------------------------------------


def test_pdf_header_required():
    with pytest.raises(PdfFormatError):
        extract_pdf_text(b"not a pdf at all")


def test_pdf_truncation_totality():
    g = build_pdf([["abc (x) y"], ["z"]], compress=True)
    for cut in range(len(g)):
        try:
            extract_pdf_text(g[:cut])
        except PdfFormatError:
            pass  # the only acceptable exception


def test_pdf_byteflip_totality():
    g = build_pdf([["abc"], ["z z z"]], compress=True, use_tj_array=True)
    rng = random.Random(42)
    for _ in range(4000):
        b = bytearray(g)
        b[rng.randrange(len(g))] ^= 1 << rng.randrange(8)
        try:
            extract_pdf_text(bytes(b))
        except PdfFormatError:
            pass


def test_pdf_stream_length_guards():
    g = bytearray(build_pdf([["abc"]]))
    # blow up /Length far past the file: must raise, not read garbage
    idx = g.find(b"/Length ")
    end = g.find(b" ", idx + 8)
    patched = g[:idx + 8] + b"999999999" + g[end:]
    with pytest.raises(PdfFormatError):
        extract_pdf_text(bytes(patched))


def test_pdf_xref_loop_guard():
    g = build_pdf([["abc"]])
    # append a second trailer whose /Prev points at the same xref → loop
    xref_off = int(g.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0])
    forged = (g.rsplit(b"trailer", 1)[0]
              + b"trailer\n<< /Size 99 /Root 1 0 R /Prev "
              + str(xref_off).encode() + b" >>\nstartxref\n"
              + str(xref_off).encode() + b"\n%%EOF\n")
    with pytest.raises(PdfFormatError):
        extract_pdf_text(forged)


def test_pdf_lexer_string_escapes():
    lx = _Lexer(b"(a\\(b\\)c \\n \\101 \\zz)")
    assert lx.next_token() == b"("
    assert lx._parse_string() == b"a(b)c \n A zz"


def test_pdf_lexer_hex_string_odd_digits():
    lx = _Lexer(b"<414>")
    assert lx.next_token() == b"<"
    assert lx._parse_hex_string() == b"A@"


# --- parser paths the builder never emits (hand-crafted fixtures) -----------------


def _minimal_pdf(objects: dict[int, bytes], root: int = 1) -> bytes:
    """Assemble a one-generation PDF from raw object bodies."""
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_off = len(out)
    n = max(objects) + 1
    out += f"xref\n0 {n}\n".encode() + b"0000000000 65535 f \n"
    for i in range(1, n):
        out += f"{offsets.get(i, 0):010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {n} /Root {root} 0 R >>\n"
            f"startxref\n{xref_off}\n%%EOF\n").encode()
    return bytes(out)


def test_pdf_indirect_length_and_contents_array():
    content1 = b"BT (first) Tj ET"
    content2 = b"BT (second) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        # /Contents as an ARRAY of two streams; first stream's /Length
        # is an INDIRECT reference to object 6
        3: b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>",
        4: (b"<< /Length 6 0 R >>\nstream\n" + content1 + b"\nendstream"),
        5: (b"<< /Length " + str(len(content2)).encode()
            + b" >>\nstream\n" + content2 + b"\nendstream"),
        6: str(len(content1)).encode(),
    }
    r = extract_pdf_text(_minimal_pdf(objs))
    assert r == {"n_pages": 1, "text": "first\nsecond"}


def test_pdf_nested_pages_tree():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R 6 0 R] /Count 2 >>",
        3: b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",   # nested node
        4: b"<< /Type /Page /Parent 3 0 R /Contents 5 0 R >>",
        5: b"<< /Length 14 >>\nstream\nBT (pa) Tj ET\nendstream",
        6: b"<< /Type /Page /Parent 2 0 R /Contents 7 0 R >>",
        7: b"<< /Length 14 >>\nstream\nBT (pb) Tj ET\nendstream",
    }
    r = extract_pdf_text(_minimal_pdf(objs))
    assert r == {"n_pages": 2, "text": "pa\npb"}


def test_pdf_multi_section_xref_prev_chain():
    """An incremental-update layout: the newest xref covers only the
    updated object and /Prev points at the original table."""
    base = _minimal_pdf({
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length 15 >>\nstream\nBT (old) Tj ET\nendstream",
    })
    old_xref_off = int(base.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0])
    upd = bytearray(base)
    new4_off = len(upd)
    upd += (b"4 0 obj\n<< /Length 15 >>\nstream\nBT (new) Tj ET"
            b"\nendstream\nendobj\n")
    new_xref = len(upd)
    upd += (b"xref\n4 1\n" + f"{new4_off:010d} 00000 n \n".encode()
            + b"trailer\n<< /Size 5 /Root 1 0 R /Prev "
            + str(old_xref_off).encode() + b" >>\nstartxref\n"
            + str(new_xref).encode() + b"\n%%EOF\n")
    r = extract_pdf_text(bytes(upd))
    # newest xref section wins for object 4
    assert r == {"n_pages": 1, "text": "new"}


def test_pdf_hex_string_shown():
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length 17 >>\nstream\nBT <414243> Tj ET\nendstream",
    }
    assert extract_pdf_text(_minimal_pdf(objs))["text"] == "ABC"


# --- PDF >= 1.5: cross-reference streams + object streams (r7) --------------------


def _xref_stream_pdf(objects: dict[int, bytes], *, w=(1, 4, 2),
                     predictor=12, index=None, extra_rows=(),
                     root: int = 1, prev: int | None = None,
                     body_prefix: bytes = b"%PDF-1.5\n") -> bytes:
    """Assemble a PDF whose xref is a cross-reference STREAM, with
    controllable /W widths, predictor, and /Index subsections — the
    layouts the builder twin never varies."""
    out = bytearray(body_prefix)
    offsets = {}
    for num in sorted(objects):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objects[num] + b"\nendobj\n"
    xref_num = max(objects) + 1
    xref_off = len(out)
    size = xref_num + 1
    w0, w1, w2 = w

    def row(typ, f2, f3):
        return ((typ.to_bytes(w0, "big") if w0 else b"")
                + f2.to_bytes(w1, "big") + f3.to_bytes(w2, "big"))

    rows = [row(0, 0, 0xFF if w2 else 0)]
    for num in range(1, size):
        off = xref_off if num == xref_num else offsets[num]
        rows.append(row(1, off, 0))
    rows.extend(extra_rows)
    stride = w0 + w1 + w2
    if predictor == 12:
        data = bytearray()
        prev_row = bytes(stride)
        for r in rows:
            data.append(2)
            data += bytes((r[i] - prev_row[i]) & 0xFF
                          for i in range(stride))
            prev_row = r
        parms = f" /DecodeParms << /Predictor 12 /Columns {stride} >>"
    elif predictor == 2:
        data = bytearray()
        for r in rows:
            d = bytearray(r)
            for i in range(stride - 1, 0, -1):
                d[i] = (d[i] - d[i - 1]) & 0xFF
            data += d
        parms = f" /DecodeParms << /Predictor 2 /Columns {stride} >>"
    else:
        data = bytearray(b"".join(rows))
        parms = ""
    xdata = zlib.compress(bytes(data))
    idx = index if index is not None else [0, size]
    idx_s = " ".join(str(v) for v in idx)
    prev_s = f" /Prev {prev}" if prev is not None else ""
    out += (f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} "
            f"/W [{w0} {w1} {w2}] /Index [{idx_s}] /Root {root} 0 R"
            f"{prev_s} /Length {len(xdata)} /Filter /FlateDecode"
            f"{parms} >>\n").encode()
    out += b"stream\n" + xdata + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)


_SIMPLE_OBJS = {
    1: b"<< /Type /Catalog /Pages 2 0 R >>",
    2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
    3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
    4: b"<< /Length 15 >>\nstream\nBT (txt) Tj ET\nendstream",
}


@settings(max_examples=10, deadline=None)
@given(n_pages=st.integers(1, 4), compress=st.booleans(),
       tj=st.booleans(), layout=st.sampled_from(["classic", "xref", "objstm"]))
def test_pdf_all_layouts_roundtrip(n_pages, compress, tj, layout):
    """The three xref layouts (classic table, xref stream, xref stream +
    ObjStm-packed dictionaries) must extract identical text."""
    pages = [[f"page {p} (line) one", f"p{p} \\ two 50%"]
             for p in range(n_pages)]
    blob = build_pdf(pages, compress=compress, use_tj_array=tj,
                     xref_stream=(layout != "classic"),
                     use_objstm=(layout == "objstm"))
    want = "\n".join(f"page {p} (line) one\np{p} \\ two 50%"
                     for p in range(n_pages))
    assert extract_pdf_text(blob) == {"n_pages": n_pages, "text": want}


def test_pdf_xref_stream_w0_zero_defaults_type1():
    """7.5.8.2: W[0] == 0 means the type field is absent and defaults
    to 1 — every row is then (offset, gen)."""
    blob = _xref_stream_pdf(_SIMPLE_OBJS, w=(0, 4, 2), predictor=1)
    assert extract_pdf_text(blob)["text"] == "txt"


def test_pdf_xref_stream_predictors():
    """Predictor 1 (none), 2 (TIFF horizontal) and 12 (PNG Up) all
    reconstruct the same table."""
    for pred in (1, 2, 12):
        blob = _xref_stream_pdf(_SIMPLE_OBJS, predictor=pred)
        assert extract_pdf_text(blob)["text"] == "txt", pred


def test_pdf_xref_stream_multi_subsection_index():
    """/Index with several (start, count) ranges and an unknown row type
    (> 2, forward-compat: treated as null, skipped)."""
    # rows: obj0 free, objs 1..5 per _xref_stream_pdf, one extra row in
    # a second subsection claiming object 7 with unknown type 5
    blob = _xref_stream_pdf(
        _SIMPLE_OBJS, predictor=12,
        index=[0, 6, 7, 1],
        extra_rows=[bytes([5]) + (0).to_bytes(4, "big")
                    + (0).to_bytes(2, "big")])
    assert extract_pdf_text(blob)["text"] == "txt"


def test_pdf_hybrid_xrefstm_takes_precedence():
    """7.5.8.4 hybrid file: a classic table whose trailer carries
    /XRefStm; the stream's entries override the classic ones at the same
    update level (the stream points at the NEW object 4)."""
    base = _minimal_pdf(_SIMPLE_OBJS)
    out = bytearray(base)
    # append a new object 4 and an xref STREAM covering only it
    new4_off = len(out)
    out += (b"4 0 obj\n<< /Length 15 >>\nstream\nBT (new) Tj ET"
            b"\nendstream\nendobj\n")
    xs_num, xs_off = 9, len(out)
    row = bytes([1]) + new4_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
    xdata = zlib.compress(row)
    out += (f"{xs_num} 0 obj\n<< /Type /XRef /Size 10 /W [1 4 2] "
            f"/Index [4 1] /Root 1 0 R /Length {len(xdata)} "
            f"/Filter /FlateDecode >>\n").encode()
    out += b"stream\n" + xdata + b"\nendstream\nendobj\n"
    # classic table at the SAME level listing the OLD object 4, trailer
    # pointing at the xref stream via /XRefStm
    old4 = int(base[base.find(b"xref\n"):].split(b"\n")[5].split()[0])
    xref2 = len(out)
    out += (b"xref\n4 1\n" + f"{old4:010d} 00000 n \n".encode()
            + b"trailer\n<< /Size 10 /Root 1 0 R /XRefStm "
            + str(xs_off).encode() + b" /Prev "
            + str(int(base.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0])
                  ).encode()
            + b" >>\nstartxref\n" + str(xref2).encode() + b"\n%%EOF\n")
    assert extract_pdf_text(bytes(out))["text"] == "new"


def test_pdf_xref_stream_prev_chains_to_classic():
    """An incremental update whose NEW xref is a stream and whose /Prev
    points at the original classic table — the mixed chain real updaters
    produce."""
    base = _minimal_pdf(_SIMPLE_OBJS)
    old_xref = int(base.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0])
    out = bytearray(base)
    new4_off = len(out)
    out += (b"4 0 obj\n<< /Length 15 >>\nstream\nBT (upd) Tj ET"
            b"\nendstream\nendobj\n")
    xs_num, xs_off = 9, len(out)
    rows = bytes([1]) + new4_off.to_bytes(4, "big") + (0).to_bytes(2, "big")
    xdata = zlib.compress(rows)
    out += (f"{xs_num} 0 obj\n<< /Type /XRef /Size 10 /W [1 4 2] "
            f"/Index [4 1] /Root 1 0 R /Prev {old_xref} "
            f"/Length {len(xdata)} /Filter /FlateDecode >>\n").encode()
    out += b"stream\n" + xdata + b"\nendstream\nendobj\n"
    out += f"startxref\n{xs_off}\n%%EOF\n".encode()
    assert extract_pdf_text(bytes(out))["text"] == "upd"


def test_pdf_objstm_faults_are_format_errors():
    """ObjStm corruption: directory index mismatches, non-ObjStm targets
    and bad /N all become PdfFormatError rows."""
    blob = bytearray(build_pdf([["abc"]], use_objstm=True))
    # flip the /Type /ObjStm name so the type check fires
    i = blob.find(b"/ObjStm")
    blob[i:i + 7] = b"/ObjStX"
    with pytest.raises(PdfFormatError):
        extract_pdf_text(bytes(blob))


@settings(max_examples=4, deadline=None)
@given(seed=st.integers(0, 2**31), step=st.integers(5, 23),
       layout=st.sampled_from(["xref", "objstm"]))
def test_pdf_xref_stream_fuzz_stays_format_error(seed, step, layout):
    """Truncation/byte-flip totality over the NEW structures: xref
    streams, predictors, ObjStm directories — PdfFormatError or a
    decode, never a foreign exception."""
    rnd = random.Random(seed)
    blob = build_pdf([["abc (x) y", "z 50%"]], compress=True,
                     xref_stream=True, use_objstm=(layout == "objstm"))
    for cut in range(4, len(blob), step):
        try:
            extract_pdf_text(blob[:cut])
        except PdfFormatError:
            pass
    for i in range(4, len(blob), step):
        bad = blob[:i] + bytes([blob[i] ^ rnd.randrange(1, 256)]) + blob[i + 1:]
        try:
            extract_pdf_text(bad)
        except PdfFormatError:
            pass


# --- r7: the legacy filter set (LZW, ASCII85, ASCIIHex, RunLength) -----------------


@settings(max_examples=6, deadline=None)
@given(lzw=st.booleans(), a85=st.booleans(), compress=st.booleans(),
       layout=st.sampled_from(["classic", "xref", "objstm"]))
def test_pdf_filter_chains_roundtrip(lzw, a85, compress, layout):
    """LZWDecode (the pre-Flate legacy filter), ASCII85 transport and
    their chains across all xref layouts."""
    pages = [["chain (x) \\ test", "tail ~ 85%"]]
    r = extract_pdf_text(build_pdf(
        pages, lzw=lzw, ascii85=a85, compress=compress and not lzw,
        xref_stream=(layout != "classic"), use_objstm=(layout == "objstm")))
    assert r == {"n_pages": 1, "text": "chain (x) \\ test\ntail ~ 85%"}


def _one_stream_pdf(content_raw: bytes, filt: bytes) -> bytes:
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: (b"<< /Length " + str(len(content_raw)).encode() + b" "
            + filt + b" >>\nstream\n" + content_raw + b"\nendstream"),
    }
    return _minimal_pdf(objs)


def test_pdf_asciihex_and_runlength_filters():
    """Hand-crafted paths the builder never emits: ASCIIHexDecode (with
    whitespace, odd trailing digit rule) and RunLengthDecode (literal
    runs, repeats, EOD)."""
    content = b"BT (HX) Tj ET"
    hexed = b" ".join(f"{b:02X}".encode() for b in content) + b" >"
    assert extract_pdf_text(
        _one_stream_pdf(hexed, b"/Filter /ASCIIHexDecode"))["text"] == "HX"

    # RunLength: literal run of the full content + a repeat run
    content2 = b"BT (R"
    tail = b") Tj ET"
    rl = (bytes([len(content2) - 1]) + content2          # literal
          + bytes([257 - 4, ord("r")])                   # 'rrrr'
          + bytes([len(tail) - 1]) + tail + bytes([128]))
    assert extract_pdf_text(
        _one_stream_pdf(rl, b"/Filter /RunLengthDecode"))["text"] == "Rrrrr"

    # abbreviated names (Table 6 short forms) resolve to the same filters
    assert extract_pdf_text(
        _one_stream_pdf(hexed, b"/Filter /AHx"))["text"] == "HX"


def test_pdf_lzw_early_change_zero():
    """/EarlyChange 0 widens codes one step LATER than the TIFF-style
    default — a conforming decoder must honor the parm."""

    def lzw_encode_ec(raw: bytes, early: int) -> bytes:
        out = bytearray()
        bitbuf = bitlen = 0

        def put(code, width):
            nonlocal bitbuf, bitlen
            bitbuf = (bitbuf << width) | code
            bitlen += width
            while bitlen >= 8:
                bitlen -= 8
                out.append((bitbuf >> bitlen) & 0xFF)

        table = {bytes([b]): b for b in range(256)}
        width, nxt = 9, 258
        put(256, width)
        s = b""
        for b in raw:
            t = s + bytes([b])
            if t in table:
                s = t
                continue
            put(table[s], width)
            table[t] = nxt
            nxt += 1
            # encoder widens one code ahead of the decoder's table (the
            # classic LZW lag): decoder at len+1+early == 2^W, encoder
            # at nxt+early == 2^W
            if nxt + early == (1 << width) and width < 12:
                width += 1
            s = bytes([b])
        if s:
            put(table[s], width)
        put(257, width)
        if bitlen:
            out.append((bitbuf << (8 - bitlen)) & 0xFF)
        return bytes(out)

    # long enough to cross the 9->10 bit boundary (need >252 new entries)
    text = " ".join(f"w{i}q{i * 7 % 97}" for i in range(160))
    content = ("BT (" + text + ") Tj ET").encode()
    for early in (0, 1):
        raw = lzw_encode_ec(content, early)
        parms = b"/Filter /LZWDecode /DecodeParms << /EarlyChange " \
            + str(early).encode() + b" >>"
        got = extract_pdf_text(_one_stream_pdf(raw, parms))["text"]
        assert got == text, early


@settings(max_examples=3, deadline=None)
@given(seed=st.integers(0, 2**31), step=st.integers(7, 29))
def test_pdf_filter_fuzz_stays_format_error(seed, step):
    rnd = random.Random(seed)
    blob = build_pdf([["abc (x) y", "z 50%"]], lzw=True, ascii85=True)
    for cut in range(4, len(blob), step):
        try:
            extract_pdf_text(blob[:cut])
        except PdfFormatError:
            pass
    for i in range(4, len(blob), step):
        bad = blob[:i] + bytes([blob[i] ^ rnd.randrange(1, 256)]) + blob[i + 1:]
        try:
            extract_pdf_text(bad)
        except PdfFormatError:
            pass


# --- r7: /ToUnicode CMaps (subset-font text recovery) ------------------------------


@settings(max_examples=6, deadline=None)
@given(compress=st.booleans(), tj=st.booleans(),
       layout=st.sampled_from(["classic", "xref", "objstm"]))
def test_pdf_cid_font_tounicode_roundtrip(compress, tj, layout):
    """Text shown through a Type0-style font as 2-byte glyph codes is
    only recoverable by parsing the embedded /ToUnicode CMap — including
    non-Latin-1 characters and astral-plane emoji (surrogate pairs)."""
    pages = [["Unicode → test © ♚", "ligne deux 🚀"], ["página …"]]
    want = "Unicode → test © ♚\nligne deux 🚀\npágina …"
    r = extract_pdf_text(build_pdf(
        pages, cid_font=True, compress=compress, use_tj_array=tj,
        xref_stream=(layout != "classic"),
        use_objstm=(layout == "objstm")))
    assert r == {"n_pages": 2, "text": want}


def test_pdf_tounicode_bfrange_forms():
    """bfrange increment and array destinations, plus the unmapped-code
    fallback (chr(code)) — unit-level, hand-built CMap."""
    from flink_job_spark.functions.pdf import _parse_tounicode

    cmap = b"""/CIDInit /ProcSet findresource begin
begincmap
1 begincodespacerange
<0000> <ffff>
endcodespacerange
2 beginbfchar
<0001> <0041>
<0002> <D83DDE00>
endbfchar
2 beginbfrange
<0010> <0013> <0061>
<0020> <0021> [<005A> <0079>]
endbfrange
endcmap
end"""
    tu = _parse_tounicode(cmap)
    assert tu.width == 2
    assert tu.decode(bytes.fromhex("0001")) == "A"
    assert tu.decode(bytes.fromhex("0002")) == "\U0001F600"
    # increment range: 0x10..0x13 -> a..d
    assert tu.decode(bytes.fromhex("0010001100120013")) == "abcd"
    # array range
    assert tu.decode(bytes.fromhex("00200021")) == "Zy"
    # unmapped: identity chr fallback
    assert tu.decode(bytes.fromhex("0042")) == "B"


def test_pdf_font_switching_and_broken_cmap_degrades():
    """Tf switches decoders mid-page (F1 latin-1 vs F2 CMap); a broken
    /ToUnicode degrades that font to latin-1 instead of erroring the
    whole document."""
    import zlib as _zlib

    from flink_job_spark.functions.pdf import _parse_tounicode  # noqa: F401

    cmap = (b"begincmap 1 begincodespacerange <0000> <ffff> "
            b"endcodespacerange 1 beginbfchar <0001> <0058> endbfchar "
            b"endcmap")
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 "
           b"/Resources << /Font << /F1 5 0 R /F2 6 0 R >> >> >>",
        # note: resources INHERITED from the Pages node (7.7.3.4)
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: (b"<< /Length 44 >>\nstream\n"
            b"BT /F1 9 Tf (ab) Tj /F2 9 Tf <0001> Tj ET\nendstream"),
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        6: b"<< /Type /Font /Subtype /Type0 /ToUnicode 7 0 R >>",
        7: (b"<< /Length " + str(len(cmap)).encode()
            + b" >>\nstream\n" + cmap + b"\nendstream"),
    }
    assert extract_pdf_text(_minimal_pdf(objs))["text"] == "abX"

    # corrupt the CMap body: F2 falls back to latin-1 ('\x00\x01')
    bad = dict(objs)
    broken = _zlib.compress(b"\xff\xfe not a cmap")
    bad[7] = (b"<< /Length " + str(len(broken)).encode()
              + b" /Filter /FlateDecode >>\nstream\n" + broken
              + b"\nendstream")
    r = extract_pdf_text(_minimal_pdf(bad))
    assert r["text"] == "ab\x00\x01"


def test_pdf_circular_length_reference_is_format_error():
    """Two stream objects whose /Length values reference EACH OTHER's
    objects recurse through get_object with a fresh resolve() depth per
    hop — without the parsing-stack guard this was a RecursionError on
    crafted input, not the errors-as-data PdfFormatError."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>",
        4: b"<< /Length 5 0 R >>\nstream\nBT (x) Tj ET\nendstream",
        5: b"<< /Length 4 0 R >>\nstream\nBT (y) Tj ET\nendstream",
    }
    with pytest.raises(PdfFormatError, match="circular"):
        extract_pdf_text(_minimal_pdf(objs))

    # direct self-reference too
    objs[4] = b"<< /Length 4 0 R >>\nstream\nBT (x) Tj ET\nendstream"
    del objs[5]
    with pytest.raises(PdfFormatError, match="circular"):
        extract_pdf_text(_minimal_pdf(objs))


# --- r8: standard security handler (7.6.3) -----------------------------------


def test_pdf_crypt_known_answer_vectors():
    """AES core against FIPS-197 Appendix C; RC4 against the classic
    public test vector; CBC+PKCS#5 roundtrip at several lengths."""
    from flink_job_spark.functions.pdf_crypt import (_dec_block,
                                                     _enc_block,
                                                     _expand_key,
                                                     aes_cbc_decrypt,
                                                     aes_cbc_encrypt, rc4)

    key = bytes(range(16))
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    w = _expand_key(key)
    ct = _enc_block(w, pt)
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert _dec_block(w, ct) == pt
    assert rc4(b"Key", b"Plaintext").hex() == "bbf316e8d940af0ad3"
    for n in (0, 1, 15, 16, 17, 100):
        data = bytes(range(256))[:n] * 1
        blob = aes_cbc_encrypt(key, bytes(16), data)
        assert len(blob) % 16 == 0 and len(blob) >= 32
        assert aes_cbc_decrypt(key, blob) == data


def test_pdf_encrypted_roundtrips_all_modes_and_layouts():
    """RC4-40 (/V 1 /R 2), RC4-128 (/V 2 /R 3) and AESV2 (/V 4 /R 4)
    with the empty user password roundtrip across every xref layout and
    filter chain — encrypted owner-password-only files extract like
    plaintext ones."""
    from flink_job_spark.functions.pdf import build_pdf, extract_pdf_text

    pages = [["Hello encrypted world", "second line"], ["page two"]]
    want = extract_pdf_text(build_pdf(pages))
    for enc in ("rc4-40", "rc4-128", "aesv2"):
        for kw in ({}, {"compress": True}, {"xref_stream": True},
                   {"use_objstm": True},
                   {"cid_font": True, "compress": True},
                   {"lzw": True, "ascii85": True}):
            assert extract_pdf_text(
                build_pdf(pages, encrypt=enc, **kw)) == want, (enc, kw)


def test_pdf_encrypted_strings_and_user_password():
    """String values decrypt per object (the /Info /Title path); a
    NON-empty user password is the reach boundary — PdfFormatError,
    never a wrong-plaintext decode."""
    import pytest

    from flink_job_spark.functions.pdf import (PdfFormatError, _Document,
                                               build_pdf, extract_pdf_text)

    for enc in ("rc4-40", "rc4-128", "aesv2"):
        doc = _Document(build_pdf([["x"]], encrypt=enc,
                                  info_title="Secret T\xedtle"))
        info = doc.resolve(doc.trailer["Info"])
        assert info["Title"] == "Secret T\xedtle".encode("latin-1"), enc
    # plaintext /Info stays plaintext-readable
    doc = _Document(build_pdf([["x"]], info_title="Plain"))
    assert doc.resolve(doc.trailer["Info"])["Title"] == b"Plain"

    for enc in ("rc4-40", "rc4-128", "aesv2"):
        blob = build_pdf([["x"]], encrypt=enc, user_pw=b"secret")
        with pytest.raises(PdfFormatError, match="user password"):
            extract_pdf_text(blob)


def test_pdf_encrypt_dict_rejections():
    """Precise boundary messages over mutated /Encrypt dicts: foreign
    handlers, unsupported revisions, split StmF/StrF, unknown CFM."""
    import pytest

    from flink_job_spark.functions.pdf import (PdfFormatError,
                                               build_pdf,
                                               extract_pdf_text)

    blob = build_pdf([["x"]], encrypt="aesv2")

    def patched(find: bytes, to: bytes) -> bytes:
        assert find in blob, find
        assert len(find) == len(to)
        return blob.replace(find, to)

    with pytest.raises(PdfFormatError, match="security handler"):
        extract_pdf_text(patched(b"/Filter /Standard", b"/Filter /Standurd"))
    with pytest.raises(PdfFormatError, match="V="):
        extract_pdf_text(patched(b"/V 4 /R 4", b"/V 3 /R 4"))
    with pytest.raises(PdfFormatError, match="V="):
        extract_pdf_text(patched(b"/V 4 /R 4", b"/V 4 /R 6"))
    with pytest.raises(PdfFormatError, match="CFM"):
        extract_pdf_text(patched(b"/CFM /AESV2", b"/CFM /AESV3"))
    with pytest.raises(PdfFormatError, match="StmF"):
        extract_pdf_text(patched(b"/StrF /StdCF", b"/StrF /Ident"))

    rc4blob = build_pdf([["x"]], encrypt="rc4-128")
    assert b"/Length 128" in rc4blob
    with pytest.raises(PdfFormatError, match="Length"):
        extract_pdf_text(rc4blob.replace(b"/Length 128", b"/Length 129"))


def test_pdf_encrypted_corruption_stays_errors_as_data():
    """Byte-flip/truncation totality over an encrypted ObjStm PDF —
    ciphertext corruption surfaces as PdfFormatError rows (bad padding,
    filter failures, parse failures), never a bare error escape."""
    import random

    from flink_job_spark.functions.pdf import (PdfFormatError, build_pdf,
                                               extract_pdf_text)

    blob = build_pdf([["alpha", "beta"], ["gamma"]], encrypt="aesv2",
                     use_objstm=True, compress=True)
    rnd = random.Random(8)
    for cut in range(16, len(blob), 97):
        try:
            extract_pdf_text(blob[:cut])
        except PdfFormatError:
            pass
    for i in range(0, len(blob), 41):
        bad = blob[:i] + bytes([blob[i] ^ rnd.randrange(1, 256)]) \
            + blob[i + 1:]
        try:
            extract_pdf_text(bad)
        except PdfFormatError:
            pass
