"""WARC (ISO 28500 / WARC/1.0) record walk — the web-crawl file format.

LLM training corpora start life as WARC: every Common-Crawl-style dump
is a sequence of records (warcinfo / request / response / metadata),
each a CRLF header block (WARC-Type, WARC-Target-URI, Content-Length, …)
plus a Content-Length-sized payload, usually stored gzip-per-record
(multi-member gzip, readable with stdlib zlib wbits=31). A 100 TB text
pipeline's first stage is exactly this walk: split records, read types
and URIs, hand response payloads to the text side. Parsed natively here
— header grammar + stdlib zlib, no crawl library.

Contract: same errors-as-data shape as the other container modules —
malformed structure raises WarcFormatError (→ ``decode_error`` rows),
gzip members are decompression-bomb-capped (the same guard family as
png.py:26), header line counts are capped, and every Content-Length is
bounds-checked before slicing.
"""

from __future__ import annotations

import zlib


class WarcFormatError(ValueError):
    """Malformed WARC structure — becomes a decode_error row."""


_MAX_MEMBER_BYTES = 1 << 26       # 64 MiB per gzip member: bomb guard
_MAX_HEADER_LINES = 256
_MAX_RECORDS = 1 << 20


def _gunzip_members(data: bytes) -> bytes:
    """Concatenate all members of a multi-member gzip stream, capped.

    Feeds each decompressobj bounded chunks from a memoryview instead of
    the whole remaining buffer: ``unused_data`` after a member then holds
    at most one chunk, not a copy of everything behind it — the naive
    whole-buffer loop is O(members x remaining) bytes of memcpy
    (measured 1 MB/s on a 16k-record Common-Crawl-shaped file; this walk
    measures ~150+ MB/s, tools/container_throughput.py)."""
    out = []
    mv = memoryview(data)
    pos = 0
    CHUNK = 1 << 16
    while pos + 2 <= len(data) and data[pos] == 0x1F and data[pos + 1] == 0x8B:
        o = zlib.decompressobj(wbits=31)
        produced = 0
        fed = 0
        while not o.eof:
            chunk = mv[pos + fed:pos + fed + CHUNK]
            if not len(chunk):
                raise WarcFormatError("gzip member truncated")
            try:
                piece = o.decompress(chunk, _MAX_MEMBER_BYTES + 1 - produced)
            except zlib.error as exc:
                raise WarcFormatError(f"bad gzip member: {exc}") from exc
            produced += len(piece)
            if produced > _MAX_MEMBER_BYTES:
                raise WarcFormatError(
                    "gzip member exceeds the 64 MiB cap")
            out.append(piece)
            fed += len(chunk)
        pos += fed - len(o.unused_data)
    if pos != len(data):
        raise WarcFormatError("trailing bytes after the last gzip member")
    return b"".join(out)


def warc_records(data: bytes):
    """Yield (headers: dict[str,str] lower-cased keys, payload: bytes)
    per record. Accepts plain or gzip-per-record input."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = 0
    while pos < len(data):
        # skip inter-record CRLFs
        while data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(data):
            break
        n += 1
        if n > _MAX_RECORDS:
            raise WarcFormatError("record count exceeds cap")
        end = data.find(b"\r\n\r\n", pos)
        if end < 0:
            raise WarcFormatError("unterminated record header")
        lines = data[pos:end].split(b"\r\n")
        if len(lines) > _MAX_HEADER_LINES:
            raise WarcFormatError("header line count exceeds cap")
        if not lines[0].startswith(b"WARC/"):
            raise WarcFormatError(f"bad version line {lines[0][:20]!r}")
        headers: dict[str, str] = {"__version__":
                                   lines[0].decode("latin-1")}
        for ln in lines[1:]:
            k, sep, v = ln.partition(b":")
            if not sep:
                raise WarcFormatError(f"bad header line {ln[:40]!r}")
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
        try:
            clen = int(headers["content-length"])
        except KeyError:
            raise WarcFormatError("missing Content-Length") from None
        except ValueError:
            raise WarcFormatError("non-integer Content-Length") from None
        if clen < 0 or end + 4 + clen > len(data):
            raise WarcFormatError("Content-Length overruns file")
        yield headers, data[end + 4:end + 4 + clen]
        pos = end + 4 + clen


def warc_stats(data: bytes) -> dict:
    """One triage pass: record count, per-type counts, the first
    response's target URI, and total payload bytes."""
    n = n_response = n_request = n_warcinfo = 0
    payload_bytes = 0
    uri = None
    for headers, payload in warc_records(data):
        n += 1
        t = headers.get("warc-type", "")
        if t == "response":
            n_response += 1
            if uri is None:
                uri = headers.get("warc-target-uri")
        elif t == "request":
            n_request += 1
        elif t == "warcinfo":
            n_warcinfo += 1
        payload_bytes += len(payload)
    if n == 0:
        raise WarcFormatError("no WARC records")
    return {"n_records": n, "n_response": n_response,
            "n_request": n_request, "n_warcinfo": n_warcinfo,
            "uri": uri, "payload_bytes": payload_bytes}


_HTTP_MAX_HEADERS = 256


def http_response_meta(payload: bytes) -> dict:
    """Parse an HTTP/1.x response message (the payload of a WARC
    ``response`` record, RFC 9112 §4): status line, CRLF header block,
    body. Returns status / reason / lowercased media type / charset
    parameter / declared Content-Length / Location / body. The first
    occurrence of a repeated header wins (the field-line rule proxies
    choose); header count is capped like the WARC walk."""
    end = payload.find(b"\r\n\r\n")
    if end < 0:
        raise WarcFormatError("unterminated HTTP header block")
    lines = payload[:end].split(b"\r\n")
    if len(lines) > _HTTP_MAX_HEADERS:
        raise WarcFormatError("HTTP header count exceeds cap")
    parts = lines[0].split(b" ", 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise WarcFormatError(f"bad HTTP status line {lines[0][:40]!r}")
    try:
        status = int(parts[1])
    except ValueError:
        raise WarcFormatError("non-integer HTTP status") from None
    if not 100 <= status <= 599:
        raise WarcFormatError(f"implausible HTTP status {status}")
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        k, sep, v = ln.partition(b":")
        if not sep:
            raise WarcFormatError(f"bad HTTP header line {ln[:40]!r}")
        headers.setdefault(k.strip().lower().decode("latin-1"),
                           v.strip().decode("latin-1"))
    media_type = charset = None
    ctype = headers.get("content-type")
    if ctype is not None:
        mt, _, params = ctype.partition(";")
        media_type = mt.strip().lower()
        for p in params.split(";"):
            pk, psep, pv = p.partition("=")
            if psep and pk.strip().lower() == "charset":
                charset = pv.strip().strip('"').lower()
                break
    clen = None
    if "content-length" in headers:
        try:
            clen = int(headers["content-length"])
        except ValueError:
            raise WarcFormatError(
                "non-integer HTTP Content-Length") from None
        if clen < 0:
            raise WarcFormatError("negative HTTP Content-Length")
    return {"status": status,
            "reason": (parts[2].decode("latin-1") if len(parts) > 2
                       else ""),
            "media_type": media_type, "charset": charset,
            "content_length": clen, "location": headers.get("location"),
            "body": payload[end + 4:]}


def warc_http_chain(data: bytes) -> dict:
    """Redirect-chain summary over a WARC's ``response`` records in
    record order — the first filter every crawl pipeline applies.
    Leading 3xx responses carrying a Location count as hops; the first
    non-redirect response is the final document. Responses after the
    final one (re-crawls in the same file) are ignored."""
    n_hops = 0
    first_status = redirect_to = None
    final = None
    for headers, payload in warc_records(data):
        if headers.get("warc-type") != "response":
            continue
        m = http_response_meta(payload)
        if first_status is None:
            first_status = m["status"]
            if 300 <= m["status"] < 400:
                redirect_to = m["location"]
        if final is None and 300 <= m["status"] < 400 and m["location"]:
            n_hops += 1
            continue
        if final is None:
            final = m
    if first_status is None:
        raise WarcFormatError("no response records")
    if final is None:
        raise WarcFormatError("redirect chain without a final response")
    return {"n_hops": n_hops, "first_status": first_status,
            "redirect_to": redirect_to, "final_status": final["status"],
            "media_type": final["media_type"], "charset": final["charset"],
            "content_length": final["content_length"]}


# --------------------------------------------------------------------------
# builder (fixture/test side)
# --------------------------------------------------------------------------

def build_http_response(status: int, reason: str,
                        headers: list[tuple[str, str]],
                        body: bytes) -> bytes:
    out = [f"HTTP/1.1 {status} {reason}".encode("latin-1")]
    out += [f"{k}: {v}".encode("latin-1") for k, v in headers]
    return b"\r\n".join(out) + b"\r\n\r\n" + body


def build_record(rtype: str, payload: bytes, uri: str | None = None,
                 rid: str = "<urn:uuid:0>") -> bytes:
    hdrs = [b"WARC/1.0",
            f"WARC-Type: {rtype}".encode(),
            f"WARC-Record-ID: {rid}".encode(),
            b"WARC-Date: 2026-08-15T00:00:00Z"]
    if uri is not None:
        hdrs.append(f"WARC-Target-URI: {uri}".encode())
    hdrs.append(f"Content-Length: {len(payload)}".encode())
    return b"\r\n".join(hdrs) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def build_warc(records: list[tuple[str, bytes, str | None]],
               gzip_per_record: bool = False) -> bytes:
    """records = [(type, payload, uri)]; gzip_per_record emits one gzip
    member per record, the Common-Crawl layout."""
    blobs = [build_record(t, p, u) for t, p, u in records]
    if not gzip_per_record:
        return b"".join(blobs)
    out = bytearray()
    for b in blobs:
        co = zlib.compressobj(wbits=31)
        out += co.compress(b) + co.flush()
    return bytes(out)
