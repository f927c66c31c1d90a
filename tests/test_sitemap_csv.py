"""Sitemap parsing + CSV dialect sniffing (r5 wave 8 continued)."""

from __future__ import annotations

import gzip

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_job_spark.functions.crawl_text import CSV_DELIMS, sniff_csv
from flink_job_spark.functions.sitemap import (
    SitemapFormatError,
    build_sitemap,
    parse_sitemap,
)

# --- sitemap ---------------------------------------------------------------------


def test_sitemap_urlset_roundtrip():
    entries = [
        {"loc": "http://a/1", "lastmod": "2026-01-02", "priority": "0.8"},
        {"loc": "http://a/2", "changefreq": "daily"},
    ]
    r = parse_sitemap(build_sitemap(entries))
    assert r["kind"] == "urlset" and len(r["entries"]) == 2
    assert r["entries"][0] == {"loc": "http://a/1", "lastmod": "2026-01-02",
                               "changefreq": None, "priority": "0.8"}


def test_sitemap_index_gzip_and_namespaceless():
    e = [{"loc": "http://a/s1.xml", "lastmod": "2026-01-01"}]
    for gz in (False, True):
        for ns in (False, True):
            r = parse_sitemap(build_sitemap(e, index=True, gzipped=gz,
                                            namespaced=ns))
            assert r["kind"] == "sitemapindex"
            assert r["entries"][0]["loc"] == "http://a/s1.xml"


def test_sitemap_guards():
    with pytest.raises(SitemapFormatError):
        parse_sitemap(b'<!DOCTYPE x [<!ENTITY a "b">]><urlset/>')
    with pytest.raises(SitemapFormatError):
        parse_sitemap(b"<notasitemap/>")
    with pytest.raises(SitemapFormatError):
        parse_sitemap(b"<urlset><url></url></urlset>")      # no <loc>
    with pytest.raises(SitemapFormatError):
        parse_sitemap(
            b"<urlset><url><loc>x</loc><priority>1.5</priority>"
            b"</url></urlset>")                              # out of [0,1]
    with pytest.raises(SitemapFormatError):
        parse_sitemap(b"\x1f\x8bnot gzip")
    with pytest.raises(SitemapFormatError):
        parse_sitemap(b"<urlset><url><loc>")                 # bad XML


def test_sitemap_foreign_extensions_tolerated():
    xml = (b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9" '
           b'xmlns:img="http://x/image"><url><loc>http://a/1</loc>'
           b"<img:image><img:loc>http://a/i.png</img:loc></img:image>"
           b"</url><img:other/></urlset>")
    r = parse_sitemap(xml)
    assert len(r["entries"]) == 1 and r["entries"][0]["loc"] == "http://a/1"


@given(st.binary(max_size=128))
@settings(max_examples=150, deadline=None)
def test_sitemap_errors_as_data(payload):
    try:
        parse_sitemap(payload)
    except SitemapFormatError:
        pass  # the only acceptable exception


# --- csv sniff --------------------------------------------------------------------


def test_csv_sniff_each_delimiter():
    for d in CSV_DELIMS:
        text = d.join(("name", "qty", "note")) + "\n" + \
            d.join((f'"a{d}b"', "1", "x")) + "\n" + \
            d.join(("c", "2", "y"))
        r = sniff_csv(text)
        assert r["delimiter"] == d, (d, r)
        assert r["has_header"] is True
        assert r["n_cols"] == 3 and r["n_rows"] == 2
        assert r["quoted"] is True


def test_csv_sniff_headerless_and_degenerate():
    r = sniff_csv("1,2,3\n4,5,6")
    assert r["has_header"] is False and r["n_rows"] == 2
    assert sniff_csv("")["n_rows"] == 0
    r2 = sniff_csv("plain text\nno delims")
    assert r2["delimiter"] == "," and r2["n_cols"] == 1


def test_csv_sniff_prefers_consistent_delimiter():
    # semicolons appear but inconsistently; commas are consistent
    text = "a,b;x,c\n1,2,3\n4,5;q,6"
    r = sniff_csv(text)
    assert r["delimiter"] == ","


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_csv_sniff_total(text):
    r = sniff_csv(text)
    assert r["delimiter"] in CSV_DELIMS
    assert r["n_rows"] >= 0 and r["n_cols"] >= 0
