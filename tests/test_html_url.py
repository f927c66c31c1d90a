"""HTML visible-text extraction + URL canonicalization tests
(functions/html_text.py — r5 wave 6)."""

from __future__ import annotations

import pytest

from flink_job_spark.functions.html_text import (UrlFormatError,
                                                 canonical_url,
                                                 extract_visible_text)


def test_html_extract_full_shape():
    h = """<html><head><title> Doc  7 </title><style>p{color:red}</style>
    <script>var a="<b>not text</b>";</script></head>
    <body><h1>Heading 7</h1><!-- comment --><p>A &amp; B &lt;ok&gt;</p>
    <a href="http://x/1">L0</a> <a href="http://x/2">L1</a>
    <a name="no-href">anchor text</a>
    <noscript>hidden</noscript></body></html>"""
    r = extract_visible_text(h)
    assert r["title"] == "Doc 7"
    assert r["text"] == "Heading 7 A & B <ok> L0 L1 anchor text"
    assert r["n_links"] == 2                   # href-less <a> not counted
    assert r["text_len"] == len(r["text"])


def test_html_nested_skip_subtrees():
    """A style inside a script (or vice versa) must not re-enable text
    until BOTH close — depth-counted skipping."""
    h = "<body>a<script>x<style>y</style>z</script>b</body>"
    assert extract_visible_text(h)["text"] == "a b"


def test_html_entities_and_charrefs():
    r = extract_visible_text("<p>caf&eacute; &#x2713; &amp;&lt;&gt;</p>")
    assert r["text"] == "café ✓ &<>"


def test_html_tag_soup_never_raises():
    for soup in ("<a href='x", "<<<>>>", "</div></div>",
                 "<script>never closed", "&bogus; &#xZZ;", "", "plain"):
        extract_visible_text(soup)            # must not raise
    # unclosed script swallows the rest — documented tolerant behavior
    assert extract_visible_text("<script>x")["text"] == ""


def test_html_title_absent_and_whitespace():
    r = extract_visible_text("<body>  a \n\t b  </body>")
    assert r["title"] is None and r["text"] == "a b"


def test_url_canonical_default_port_and_dots():
    u = canonical_url(
        "HTTP://WWW.Example.COM:80/a/b/../c/./d?utm_source=x&id=5&fbclid=9#f")
    assert u["canonical"] == "http://www.example.com/a/c/d?id=5"
    assert u["scheme"] == "http" and u["port"] is None
    assert u["tld"] == "com" and u["path_depth"] == 3


def test_url_non_default_port_kept():
    u = canonical_url("https://Ex.org:8443/?q=1&utm_medium=m")
    assert u["canonical"] == "https://ex.org:8443/?q=1"
    assert u["port"] == 8443


def test_url_root_dotdot_and_empty_path():
    assert canonical_url("http://h.io/../x")["canonical"] == "http://h.io/x"
    assert canonical_url("http://h.io")["canonical"] == "http://h.io/"
    assert canonical_url("http://h.io/a/..")["canonical"] == "http://h.io/"


def test_url_query_order_and_blank_values():
    u = canonical_url("http://h.io/p?b=2&a=&utm_x=1")
    # param order preserved (reordering would merge distinct URLs), blank
    # values kept
    assert u["canonical"] == "http://h.io/p?b=2&a="


def test_url_errors():
    for bad in ("ftp://x/y", "http:///nopath", "http://bad:por99x/",
                "not a url", "http://"):
        with pytest.raises(UrlFormatError):
            canonical_url(bad)


def test_url_tld_single_label():
    assert canonical_url("http://localhost/x")["tld"] is None


def test_html_title_inside_skipped_subtree_not_leaked():
    """Review-caught (r5): a <title> inside noscript/template leaked into
    the extracted title; skip depth now gates the title collector too."""
    h = ("<head><title>Real</title></head><body>"
         "<noscript><title>hidden</title><a href='x'>h</a>x</noscript>"
         "body</body>")
    r = extract_visible_text(h)
    assert r["title"] == "Real"
    assert r["text"] == "body"
    assert r["n_links"] == 0                   # hidden anchor not counted


# --- main-content extraction (r5 wave 8) -----------------------------------------


def test_main_content_basic_split():
    from flink_job_spark.functions.html_text import extract_main_content
    h = ("<body><nav><a href=/a>Home</a> <a href=/b>About</a></nav>"
         "<p>A real paragraph that is comfortably long enough to keep.</p>"
         "<p>Tiny.</p>"
         "<footer><a href=/p>Privacy</a> <a href=/t>Terms</a></footer>"
         "</body>")
    r = extract_main_content(h)
    assert r["text"] == ("A real paragraph that is comfortably long "
                         "enough to keep.")
    assert r["n_blocks"] == 4 and r["n_content_blocks"] == 1
    assert r["content_chars"] == len(r["text"])


def test_main_content_link_density_rule():
    from flink_job_spark.functions.html_text import extract_main_content
    # long enough, but >50% of its characters are anchor text → boiler
    farm = ('<p><a href=/1>A very long anchor label here</a> and '
            '<a href=/2>another very long anchor label</a> x</p>')
    assert extract_main_content(farm)["n_content_blocks"] == 0
    # same length mostly prose with one short link → content
    prose = ('<p>Plenty of ordinary prose text around '
             '<a href=/1>tiny</a> link in this paragraph.</p>')
    assert extract_main_content(prose)["n_content_blocks"] == 1


def test_main_content_nested_blocks_and_soup():
    from flink_job_spark.functions.html_text import extract_main_content
    # inner blocks finalize independently; unclosed tags flush via finish()
    h = ("<div>outer text that is long enough to be counted as content"
         "<p>inner paragraph also long enough to count as content</p>")
    r = extract_main_content(h)
    assert r["n_content_blocks"] == 2
    for soup in ("", "<p>", "<<<>", "</div></div>", "<a href='x"):
        extract_main_content(soup)            # never raises


def test_main_content_skips_script_subtrees():
    from flink_job_spark.functions.html_text import extract_main_content
    h = ("<p>Visible paragraph long enough to stay in the output.</p>"
         "<script>var x = 'this string is long but must never appear';"
         "</script>")
    r = extract_main_content(h)
    assert "never appear" not in r["text"]
    assert r["n_blocks"] == 1


def test_extract_links_skip_subtrees_and_soup():
    """Link extraction discipline: href-less anchors skipped, anchors inside
    skip subtrees (noscript/script) never leak, nested inline tags keep
    their text, an unclosed <a> is flushed at EOF, and tag soup never
    raises."""
    from flink_job_spark.functions.html_text import extract_links

    html = (
        '<body><a href="http://a.com/1">one</a>'
        '<a name="x"></a>'
        '<a href="http://a.com/2">two <b>bold</b> tail</a>'
        '<noscript><a href="http://spam.example/x">spam</a></noscript>'
        '<script>document.write(\'<a href="http://spam.example/y">s</a>\')'
        "</script>"
        '<a href="/rel">unclosed')
    links = extract_links(html)
    assert [l["href"] for l in links] == [
        "http://a.com/1", "http://a.com/2", "/rel"]
    assert links[1]["anchor"] == "two bold tail"
    assert links[2]["anchor"] == "unclosed"
    # a new <a> before the old one closes flushes the first (soup rule)
    soup = '<a href="http://a.com/p">first<a href="http://a.com/q">second</a>'
    got = extract_links(soup)
    assert [(l["href"], l["anchor"]) for l in got] == [
        ("http://a.com/p", "first"), ("http://a.com/q", "second")]
    # garbage never raises
    assert extract_links("<<<>>><a href=>< broken &#; soup") == []
