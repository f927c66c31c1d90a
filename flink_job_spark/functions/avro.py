"""Avro Object Container Files (the Apache Avro 1.11 spec) — the
interchange format training pipelines actually exchange (VERDICT r7 #5).

Spark's own `avro` data source is an external jar this environment
doesn't ship, so the format is implemented natively, like the media
codecs: the OCF framing (``Obj\\x01`` magic, metadata map with
``avro.schema``/``avro.codec``, 16-byte sync marker, per-block
count+size framing) and the binary record encoding (zigzag varints for
int/long, length-prefixed string/bytes, IEEE little-endian double,
1-byte boolean, union-index prefix). Codecs: ``null`` and ``deflate``
(RAW deflate per the spec — no zlib header, wbits=-15).

Scope (documented): record schemas over the primitive types
null / boolean / int / long / double / string / bytes and 2-branch
``["null", primitive]`` unions — the shape tabular interchange uses.
Nested records/arrays/maps/enums/fixed/logical-types are out of scope
and rejected with precise messages. Schema resolution (reader != writer
schema) is out of scope: the reader decodes with the writer schema, the
guarantee a same-schema roundtrip needs.

Contract: malformed input raises AvroFormatError (errors-as-data);
block counts/sizes are bomb-capped; deflate output is capped like the
WARC gzip walk.
"""

from __future__ import annotations

import json
import struct
import zlib

_MAGIC = b"Obj\x01"
_MAX_BLOCK_BYTES = 1 << 26          # 64 MiB decompressed per block
_MAX_BLOCK_COUNT = 1 << 24
_MAX_FIELDS = 1024
_PRIMITIVES = ("boolean", "int", "long", "double", "string", "bytes",
               "null")


class AvroFormatError(ValueError):
    """Malformed Avro structure — becomes a decode_error row."""


# --- binary encoding primitives -------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    u &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class _Reader:
    __slots__ = ("d", "p")

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos

    def long(self) -> int:
        u = shift = 0
        d, p, n = self.d, self.p, len(self.d)
        while True:
            if p >= n:
                raise AvroFormatError("truncated varint")
            b = d[p]
            p += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise AvroFormatError("varint exceeds 64 bits")
        self.p = p
        return (u >> 1) ^ -(u & 1)

    def raw(self, n: int) -> bytes:
        if n < 0 or self.p + n > len(self.d):
            raise AvroFormatError("truncated data")
        out = self.d[self.p:self.p + n]
        self.p += n
        return out

    def bytes_(self) -> bytes:
        return self.raw(self.long())

    def value(self, typ: str):
        if typ == "null":
            return None
        if typ == "boolean":
            b = self.raw(1)[0]
            if b > 1:
                raise AvroFormatError(f"bad boolean byte {b}")
            return b == 1
        if typ in ("int", "long"):
            v = self.long()
            if typ == "int" and not -(1 << 31) <= v < (1 << 31):
                raise AvroFormatError("int value out of 32-bit range")
            return v
        if typ == "double":
            return struct.unpack("<d", self.raw(8))[0]
        if typ == "string":
            raw = self.bytes_()
            try:
                return raw.decode("utf-8")
            except UnicodeDecodeError as exc:
                raise AvroFormatError(f"bad utf-8 string: {exc}") from exc
        if typ == "bytes":
            return self.bytes_()
        raise AvroFormatError(f"unsupported type {typ!r}")


def _encode_value(out: bytearray, typ: str, v) -> None:
    if typ == "null":
        if v is not None:
            raise AvroFormatError("non-null value for null type")
        return
    if typ == "boolean":
        out.append(1 if v else 0)
    elif typ in ("int", "long"):
        out += _zigzag_encode(int(v))
    elif typ == "double":
        out += struct.pack("<d", float(v))
    elif typ == "string":
        raw = v.encode("utf-8")
        out += _zigzag_encode(len(raw))
        out += raw
    elif typ == "bytes":
        out += _zigzag_encode(len(v))
        out += v
    else:
        raise AvroFormatError(f"unsupported type {typ!r}")


# --- schema handling -------------------------------------------------------------


def _field_types(schema: dict) -> list[tuple[str, str, bool]]:
    """Validate a record schema in this module's scope; returns
    (name, primitive type, nullable) per field."""
    if not isinstance(schema, dict) or schema.get("type") != "record":
        raise AvroFormatError("schema is not a record")
    fields = schema.get("fields")
    if not isinstance(fields, list) or not fields:
        raise AvroFormatError("record schema without fields")
    if len(fields) > _MAX_FIELDS:
        raise AvroFormatError("field count exceeds cap")
    out = []
    for f in fields:
        if not isinstance(f, dict) or "name" not in f or "type" not in f:
            raise AvroFormatError("bad field entry")
        t = f["type"]
        nullable = False
        if isinstance(t, list):
            if (len(t) != 2 or t[0] != "null"
                    or not isinstance(t[1], str)):
                raise AvroFormatError(
                    f"only [null, primitive] unions supported, got {t!r}")
            t, nullable = t[1], True
        if t not in _PRIMITIVES:
            raise AvroFormatError(f"unsupported field type {t!r}")
        out.append((f["name"], t, nullable))
    return out


def make_schema(name: str,
                fields: list[tuple[str, str, bool]]) -> dict:
    """Compose a record schema dict from (name, primitive, nullable)."""
    return {"type": "record", "name": name, "fields": [
        {"name": n, "type": (["null", t] if nullable else t)}
        for n, t, nullable in fields]}


# --- object container file --------------------------------------------------------


def write_ocf(schema: dict, rows: list[tuple], *,
              codec: str = "deflate", rows_per_block: int = 4096,
              sync: bytes = b"\x00fjs-avro-sync\x00\x01") -> bytes:
    """Serialize rows (tuples in field order; None only in nullable
    fields) into an OCF. The sync marker is caller-fixed so fixtures are
    deterministic — uniqueness only matters for split recovery."""
    if codec not in ("null", "deflate"):
        raise AvroFormatError(f"unsupported codec {codec!r}")
    if len(sync) != 16:
        raise AvroFormatError("sync marker must be 16 bytes")
    ftypes = _field_types(schema)
    meta = [("avro.schema", json.dumps(schema).encode("utf-8")),
            ("avro.codec", codec.encode())]
    out = bytearray(_MAGIC)
    out += _zigzag_encode(len(meta))
    for k, v in meta:
        kb = k.encode()
        out += _zigzag_encode(len(kb)) + kb
        out += _zigzag_encode(len(v)) + v
    out += _zigzag_encode(0)            # end of metadata map
    out += sync
    for start in range(0, len(rows), rows_per_block):
        chunk = rows[start:start + rows_per_block]
        body = bytearray()
        for row in chunk:
            if len(row) != len(ftypes):
                raise AvroFormatError("row width does not match schema")
            for (name, t, nullable), v in zip(ftypes, row):
                if nullable:
                    if v is None:
                        body += _zigzag_encode(0)
                        continue
                    body += _zigzag_encode(1)
                elif v is None:
                    raise AvroFormatError(
                        f"null in non-nullable field {name}")
                _encode_value(body, t, v)
        blob = (zlib.compress(bytes(body))[2:-4] if codec == "deflate"
                else bytes(body))
        out += _zigzag_encode(len(chunk))
        out += _zigzag_encode(len(blob))
        out += blob
        out += sync
    return bytes(out)


def read_ocf(data: bytes) -> tuple[dict, list[tuple]]:
    """Decode an OCF produced by this module or any spec-conforming
    writer whose schema fits the documented scope."""
    if data[:4] != _MAGIC:
        raise AvroFormatError("not an Avro object container file")
    r = _Reader(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        count = r.long()
        if count == 0:
            break
        if count < 0:
            # spec: negative block count is followed by a byte size
            count = -count
            r.long()
        if count > _MAX_BLOCK_COUNT or len(meta) + count > 4096:
            raise AvroFormatError("metadata entry count exceeds cap")
        for _ in range(count):
            k = r.bytes_()
            meta[k.decode("utf-8", "replace")] = r.bytes_()
    if "avro.schema" not in meta:
        raise AvroFormatError("missing avro.schema")
    try:
        schema = json.loads(meta["avro.schema"])
    except ValueError as exc:
        raise AvroFormatError(f"bad schema JSON: {exc}") from exc
    codec = meta.get("avro.codec", b"null").decode("latin-1")
    if codec not in ("null", "deflate"):
        raise AvroFormatError(f"unsupported codec {codec!r}")
    ftypes = _field_types(schema)
    sync = r.raw(16)
    rows: list[tuple] = []
    while r.p < len(r.d):
        count = r.long()
        size = r.long()
        if not 0 <= count <= _MAX_BLOCK_COUNT:
            raise AvroFormatError(f"bad block count {count}")
        blob = r.raw(size)
        if codec == "deflate":
            try:
                o = zlib.decompressobj(wbits=-15)
                body = o.decompress(blob, _MAX_BLOCK_BYTES + 1)
                if o.unconsumed_tail:
                    raise AvroFormatError("block exceeds the 64 MiB cap")
                body += o.flush()
            except zlib.error as exc:
                raise AvroFormatError(f"bad deflate block: {exc}") from exc
        else:
            body = blob
        if len(body) > _MAX_BLOCK_BYTES:
            raise AvroFormatError("block exceeds the 64 MiB cap")
        br = _Reader(body)
        for _ in range(count):
            row = []
            for name, t, nullable in ftypes:
                if nullable:
                    idx = br.long()
                    if idx == 0:
                        row.append(None)
                        continue
                    if idx != 1:
                        raise AvroFormatError(f"bad union index {idx}")
                row.append(br.value(t))
            rows.append(tuple(row))
        if br.p != len(body):
            raise AvroFormatError("trailing bytes in block")
        if r.raw(16) != sync:
            raise AvroFormatError("sync marker mismatch")
        if len(rows) > _MAX_BLOCK_COUNT:
            raise AvroFormatError("row count exceeds cap")
    return schema, rows
