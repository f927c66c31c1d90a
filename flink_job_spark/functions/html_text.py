"""HTML visible-text extraction + URL canonicalization — the crawl→text
stage between the WARC walk (functions/warc.py) and the text-quality /
dedup families (queries/text.py, queries/dedup.py).

- ``extract_visible_text``: stdlib html.parser based — drops
  script/style/template/noscript subtrees and comments, decodes
  entities (convert_charrefs), records the <title>, counts <a href>
  anchors, and normalizes whitespace (chunks stripped, single-space
  joined) — the canonical text shape quality scoring and shingle-based
  dedup expect. Malformed HTML cannot raise: html.parser is a tolerant
  state machine by design (that's why real pipelines use the same
  grammar), so errors-as-data here means "garbage in, best-effort text
  out", mirroring how a crawl treats tag soup.
- ``canonical_url``: RFC 3986 normalization a URL-level dedup needs —
  lowercase scheme/host, default-port strip, dot-segment resolution
  (remove_dot_segments), fragment drop, tracking-param strip (utm_*,
  fbclid, gclid), empty-path → "/". Malformed URLs raise
  UrlFormatError → decode_error rows.

Scale: both are pure per-row functions run inside Arrow-batched
mapInPandas — no shuffle, no library beyond the stdlib.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import parse_qsl, urlencode, urlsplit


class UrlFormatError(ValueError):
    """Malformed URL — becomes a decode_error row."""


_SKIP_SUBTREES = {"script", "style", "template", "noscript"}
_TRACKING_PREFIXES = ("utm_",)
_TRACKING_EXACT = {"fbclid", "gclid", "msclkid"}
_DEFAULT_PORTS = {"http": 80, "https": 443}


class _VisibleText(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.title_parts: list[str] = []
        self.n_links = 0
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
        elif self._skip_depth:
            return                             # whole subtree is dropped
        elif tag == "title":
            self._in_title = True
        elif tag == "a" and any(k == "href" and v for k, v in attrs):
            self.n_links += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._skip_depth:
            return                             # incl. a <title> inside one
        if self._in_title:
            self.title_parts.append(data)
            return
        s = data.strip()
        if s:
            self.chunks.append(" ".join(s.split()))


def extract_visible_text(html: str) -> dict:
    """→ {title, text, n_links, text_len}. Never raises on tag soup."""
    p = _VisibleText()
    p.feed(html)
    p.close()
    text = " ".join(p.chunks)
    title = " ".join("".join(p.title_parts).split())
    return {"title": title or None, "text": text, "n_links": p.n_links,
            "text_len": len(text)}


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "..":
            if out and out[-1]:
                out.pop()
            # ".." at root: drop (per the RFC's output-buffer behavior)
        elif seg != ".":
            out.append(seg)
    norm = "/".join(out)
    if path.startswith("/") and not norm.startswith("/"):
        norm = "/" + norm
    if path.endswith(("/.", "/..")) and not norm.endswith("/"):
        norm += "/"
    return norm


def canonical_url(url: str) -> dict:
    """→ {scheme, host, tld, port, path_depth, canonical}."""
    try:
        parts = urlsplit(url)
    except ValueError as exc:
        raise UrlFormatError(f"unparseable URL: {exc}") from exc
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        raise UrlFormatError(f"unsupported scheme {parts.scheme!r}")
    host = (parts.hostname or "").lower().rstrip(".")
    if not host:
        raise UrlFormatError("no host")
    try:
        port = parts.port                      # raises on non-numeric
    except ValueError as exc:
        raise UrlFormatError(f"bad port: {exc}") from exc
    if port == _DEFAULT_PORTS.get(scheme):
        port = None
    path = _remove_dot_segments(parts.path) or "/"
    if not path.startswith("/"):
        path = "/" + path
    query = [(k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
             if not k.startswith(_TRACKING_PREFIXES)
             and k not in _TRACKING_EXACT]
    qs = urlencode(query)
    netloc = host if port is None else f"{host}:{port}"
    canonical = f"{scheme}://{netloc}{path}" + (f"?{qs}" if qs else "")
    labels = host.split(".")
    tld = labels[-1] if len(labels) > 1 and labels[-1] else None
    path_depth = sum(1 for s in path.split("/") if s)
    return {"scheme": scheme, "host": host, "tld": tld, "port": port,
            "path_depth": path_depth, "canonical": canonical}
