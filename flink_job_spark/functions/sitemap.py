"""Sitemap parsing (sitemaps.org protocol): the crawl-seeding stage that
feeds the URL frontier before robots filtering (crawl_text.parse_robots)
and fetch.

``parse_sitemap`` handles both document kinds — ``<urlset>`` (leaf
sitemaps: loc / lastmod / changefreq / priority per URL) and
``<sitemapindex>`` (loc / lastmod per child sitemap) — plus the gzipped
transport form (.xml.gz) with a bounded-inflate bomb cap. XML parsing is
stdlib ElementTree with two spec-backed guards: the sitemaps protocol
never uses DTDs, so any ``<!DOCTYPE``/``<!ENTITY`` is rejected outright
(kills entity-expansion bombs before the parser sees them), and entry
counts are capped at the protocol's own 50 000 limit. Namespace handling
is tolerant: elements are matched by local name, so the canonical
``http://www.sitemaps.org/schemas/sitemap/0.9`` namespace, a missing
namespace, or a prefixed one all parse.

Every malformed input raises SitemapFormatError — errors-as-data at the
operator layer, same contract as warc.py / mp4.py.
"""

from __future__ import annotations

import gzip
import xml.etree.ElementTree as ET

_MAX_INPUT = 64 * 1024 * 1024       # 50 MB uncompressed per spec, rounded up
_MAX_ENTRIES = 50_000               # protocol limit


class SitemapFormatError(ValueError):
    """Malformed sitemap — becomes a decode_error row."""


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(data: bytes) -> dict:
    """Parse one sitemap payload (plain or gzipped XML).

    Returns ``{"kind": "urlset"|"sitemapindex", "entries": [...]}``;
    each entry is ``{"loc", "lastmod", "changefreq", "priority"}`` with
    absent fields None (index entries never carry changefreq/priority).
    """
    if data[:2] == b"\x1f\x8b":
        try:
            dec = gzip.decompress(data)
        except (OSError, EOFError) as e:
            raise SitemapFormatError(f"bad gzip transport: {e}") from e
        data = dec
    if len(data) > _MAX_INPUT:
        raise SitemapFormatError("sitemap exceeds size cap")
    # scan the WHOLE payload, not a 4 KB head: a DOCTYPE is legal anywhere
    # before the root element, so leading comments could smuggle an
    # entity-expansion bomb past a head-limited scan (review-caught r5
    # w11; the size cap above bounds the substring search)
    if b"<!DOCTYPE" in data or b"<!ENTITY" in data:
        raise SitemapFormatError("DTD not allowed in sitemaps")
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        raise SitemapFormatError(f"bad XML: {e}") from e

    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise SitemapFormatError(f"unexpected root element {kind!r}")
    child_name = "url" if kind == "urlset" else "sitemap"

    entries: list[dict] = []
    for el in root:
        if _local(el.tag) != child_name:
            continue                       # tolerate foreign extensions
        if len(entries) >= _MAX_ENTRIES:
            raise SitemapFormatError("entry count exceeds protocol cap")
        entry = {"loc": None, "lastmod": None,
                 "changefreq": None, "priority": None}
        for f in el:
            name = _local(f.tag)
            if name in entry and f.text is not None:
                entry[name] = f.text.strip()
        if not entry["loc"]:
            raise SitemapFormatError(f"<{child_name}> without <loc>")
        if entry["priority"] is not None:
            try:
                p = float(entry["priority"])
            except ValueError as e:
                raise SitemapFormatError(
                    f"bad priority {entry['priority']!r}") from e
            if not 0.0 <= p <= 1.0:
                raise SitemapFormatError(f"priority {p} out of [0,1]")
        entries.append(entry)
    return {"kind": kind, "entries": entries}


def build_sitemap(entries: list[dict], *, index: bool = False,
                  gzipped: bool = False, namespaced: bool = True) -> bytes:
    """Twin builder for the roundtrip proof: writes a spec-shaped
    urlset/sitemapindex, optionally gzipped, optionally without the
    canonical namespace (both forms exist in the wild)."""
    kind = "sitemapindex" if index else "urlset"
    child = "sitemap" if index else "url"
    ns = (' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
          if namespaced else "")
    parts = ['<?xml version="1.0" encoding="UTF-8"?>', f"<{kind}{ns}>"]
    for e in entries:
        parts.append(f"  <{child}>")
        for field in ("loc", "lastmod", "changefreq", "priority"):
            v = e.get(field)
            if v is not None:
                parts.append(f"    <{field}>{v}</{field}>")
        parts.append(f"  </{child}>")
    parts.append(f"</{kind}>")
    raw = "\n".join(parts).encode("utf-8")
    return gzip.compress(raw, 6) if gzipped else raw
