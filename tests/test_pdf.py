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
