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


class _LinkExtractor(HTMLParser):
    """Collects (href, anchor-text) pairs; skip-subtree discipline matches
    _VisibleText (an <a> inside <noscript>/<script>/... never leaks). Tag
    soup cannot raise; an unclosed <a> is flushed at the next anchor or at
    EOF (best-effort, how tolerant browsers treat it)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.links: list[tuple[str, str]] = []
        self._skip_depth = 0
        self._href: str | None = None
        self._anchor_chunks: list[str] = []

    def _flush(self) -> None:
        if self._href is not None:
            text = " ".join(" ".join(self._anchor_chunks).split())
            self.links.append((self._href, text))
        self._href, self._anchor_chunks = None, []

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
        elif self._skip_depth:
            return
        elif tag == "a":
            self._flush()
            href = next((v for k, v in attrs if k == "href" and v), None)
            self._href = href

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "a" and not self._skip_depth:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth or self._href is None:
            return
        self._anchor_chunks.append(data)


def extract_links(html: str) -> list[dict]:
    """→ [{href, anchor}] in document order; href-less anchors are skipped,
    anchors inside skip subtrees never leak. Never raises on tag soup."""
    p = _LinkExtractor()
    p.feed(html)
    p.close()
    p._flush()
    return [{"href": h, "anchor": a} for h, a in p.links]


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


# --- main-content extraction (link-density boilerplate removal) ------------------

_BLOCK_TAGS = {
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "td", "th",
    "article", "section", "header", "footer", "nav", "aside",
    "blockquote", "pre",
}
MAIN_MIN_CHARS = 25          # a content block must carry real text…
MAIN_MAX_LINK_DENSITY = 0.5  # …and not be mostly anchor text


class _BlockText(HTMLParser):
    """Segment the document into block-level text chunks, tracking how
    many characters of each block sit inside <a> anchors — the signal
    the readability-style content/boilerplate split keys on."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int]] = []   # (normalized text, link chars)
        self._stack: list[list] = [[[], 0]]       # [chunks, link_chars] frames
        self._skip_depth = 0
        self._link_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
        elif self._skip_depth:
            return
        elif tag in _BLOCK_TAGS:
            self._stack.append([[], 0])
        elif tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES and self._skip_depth:
            self._skip_depth -= 1
        elif self._skip_depth:
            return
        elif tag in _BLOCK_TAGS and len(self._stack) > 1:
            chunks, link_chars = self._stack.pop()
            text = " ".join(" ".join(c.split()) for c in chunks if c.strip())
            if text:
                self.blocks.append((text, link_chars))
        elif tag == "a" and self._link_depth:
            self._link_depth -= 1

    def handle_data(self, data):
        if self._skip_depth:
            return
        s = " ".join(data.split())
        if not s:
            return
        frame = self._stack[-1]
        frame[0].append(data)
        if self._link_depth:
            frame[1] += len(s)

    def finish(self) -> None:
        # unclosed blocks + top-level stray text flush in document order
        while len(self._stack) > 1:
            chunks, link_chars = self._stack.pop()
            text = " ".join(" ".join(c.split()) for c in chunks if c.strip())
            if text:
                self.blocks.append((text, link_chars))
        chunks, link_chars = self._stack[0]
        text = " ".join(" ".join(c.split()) for c in chunks if c.strip())
        if text:
            self.blocks.append((text, link_chars))


def extract_main_content(html: str) -> dict:
    """Readability-style boilerplate removal, deterministic policy: a
    block is CONTENT when it carries >= MAIN_MIN_CHARS characters and
    its link density (anchor chars / chars) is <= MAIN_MAX_LINK_DENSITY
    — navs, footers and link farms fail the density leg, button labels
    and timestamps fail the length leg. Returns the content blocks
    joined in document order plus the block-level accounting.

    → {text, n_blocks, n_content_blocks, content_chars, boiler_chars}.
    Never raises on tag soup (same tolerant grammar as
    extract_visible_text).
    """
    p = _BlockText()
    p.feed(html)
    p.close()
    p.finish()
    content, n_content, content_chars, boiler_chars = [], 0, 0, 0
    for text, link_chars in p.blocks:
        if (len(text) >= MAIN_MIN_CHARS
                and 2 * link_chars <= len(text)):
            content.append(text)
            n_content += 1
            content_chars += len(text)
        else:
            boiler_chars += len(text)
    return {"text": " ".join(content), "n_blocks": len(p.blocks),
            "n_content_blocks": n_content, "content_chars": content_chars,
            "boiler_chars": boiler_chars}
