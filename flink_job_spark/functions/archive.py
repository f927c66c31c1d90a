"""ZIP central-directory + TAR (ustar) header walks — archive triage.

Document datasets arrive as archives: ZIP bundles (office formats are
themselves ZIPs) and TARs (academic dumps, model checkpoints). The
triage pass a 100 TB ingest runs first is the member inventory — names,
sizes, compression methods — which lives in fixed struct layouts:

- ZIP (APPNOTE.TXT): the End-Of-Central-Directory record (PK\\x05\\x06,
  scanned from the tail through the max 64 KiB comment), then the
  central directory entries (PK\\x01\\x02: method, CRC, compressed /
  uncompressed sizes, name). The CD walk never touches member data —
  exactly why ZIP readers scale.
- TAR (POSIX ustar): 512-byte headers with octal size fields, data
  rounded up to block size, two zero blocks at the end.

Errors raise ArchiveFormatError → ``decode_error`` rows; entry counts
are capped (bomb guard), every offset/size is bounds-checked, and the
declared-vs-actual uncompressed ratio is NOT trusted (nothing here
inflates member data — inventory only).
"""

from __future__ import annotations

import struct
import zlib


class ArchiveFormatError(ValueError):
    """Malformed ZIP/TAR structure — becomes a decode_error row."""


_MAX_ENTRIES = 1 << 20


# --------------------------------------------------------------------------
# ZIP
# --------------------------------------------------------------------------

def zip_stats(data: bytes) -> dict:
    """Walk the central directory → n_entries, first member name,
    stored/deflated counts, total compressed/uncompressed bytes."""
    # EOCD: last 22..22+65535 bytes; scan backwards for PK\x05\x06
    tail = data[-(22 + 0xFFFF):] if len(data) > 22 + 0xFFFF else data
    at = tail.rfind(b"PK\x05\x06")
    if at < 0:
        raise ArchiveFormatError("no EOCD record (not a ZIP)")
    eocd = tail[at:]
    if len(eocd) < 22:
        raise ArchiveFormatError("truncated EOCD")
    n_entries, cd_size, cd_off = struct.unpack("<HII", eocd[10:20])
    if n_entries > _MAX_ENTRIES:
        raise ArchiveFormatError("entry count exceeds cap")
    if cd_off + cd_size > len(data):
        raise ArchiveFormatError("central directory out of range")
    pos = cd_off
    first_name = None
    n_stored = n_deflated = 0
    comp_bytes = uncomp_bytes = 0
    for _ in range(n_entries):
        if data[pos:pos + 4] != b"PK\x01\x02":
            raise ArchiveFormatError("bad central-directory signature")
        if pos + 46 > len(data):
            raise ArchiveFormatError("truncated central-directory entry")
        method, = struct.unpack("<H", data[pos + 10:pos + 12])
        csize, usize = struct.unpack("<II", data[pos + 20:pos + 28])
        nlen, xlen, clen = struct.unpack("<HHH", data[pos + 28:pos + 34])
        if pos + 46 + nlen > len(data):
            raise ArchiveFormatError("entry name out of range")
        name = data[pos + 46:pos + 46 + nlen].decode("utf-8", "replace")
        if first_name is None:
            first_name = name
        if method == 0:
            n_stored += 1
        elif method == 8:
            n_deflated += 1
        comp_bytes += csize
        uncomp_bytes += usize
        pos += 46 + nlen + xlen + clen
    return {"n_entries": n_entries, "first_name": first_name,
            "n_stored": n_stored, "n_deflated": n_deflated,
            "comp_bytes": comp_bytes, "uncomp_bytes": uncomp_bytes}


def build_zip(members: list[tuple[str, bytes]], deflate: bool = False
              ) -> bytes:
    """Minimal-but-real ZIP: local headers + data, central directory,
    EOCD. ``deflate`` compresses members (method 8), else stored."""
    out = bytearray()
    cd = bytearray()
    for name, payload in members:
        nb = name.encode("utf-8")
        crc = zlib.crc32(payload) & 0xFFFFFFFF
        if deflate:
            co = zlib.compressobj(wbits=-15)
            blob = co.compress(payload) + co.flush()
            method = 8
        else:
            blob = payload
            method = 0
        off = len(out)
        common = struct.pack("<HHHHHIII", 20, 0, method, 0, 0, crc,
                             len(blob), len(payload))
        out += b"PK\x03\x04" + common + struct.pack("<HH", len(nb), 0) \
            + nb + blob
        cd += (b"PK\x01\x02" + struct.pack("<H", 20) + common
               + struct.pack("<HHHHHII", len(nb), 0, 0, 0, 0, 0, off) + nb)
    cd_off = len(out)
    out += cd
    out += (b"PK\x05\x06" + bytes(4)
            + struct.pack("<HHIIH", len(members), len(members), len(cd),
                          cd_off, 0))
    return bytes(out)


# --------------------------------------------------------------------------
# TAR (ustar)
# --------------------------------------------------------------------------

def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as exc:
        raise ArchiveFormatError(f"bad octal field {field!r}") from exc


def tar_stats(data: bytes) -> dict:
    """Walk 512-byte ustar headers → n_members, first name, total
    member bytes. Stops at the terminating zero block; a truncated tail
    after >=1 complete member degrades to the members seen."""
    pos = 0
    n = 0
    first_name = None
    total = 0
    while pos + 512 <= len(data):
        blk = data[pos:pos + 512]
        if blk == bytes(512):
            break                              # end-of-archive marker
        if blk[257:262] != b"ustar":
            raise ArchiveFormatError("bad ustar magic")
        # verify the header checksum (field treated as spaces)
        stored = _octal(blk[148:156])
        calc = sum(blk[:148]) + 8 * 32 + sum(blk[156:])
        if stored != calc:
            raise ArchiveFormatError("tar header checksum mismatch")
        size = _octal(blk[124:136])
        name = blk[:100].split(b"\x00")[0].decode("utf-8", "replace")
        n += 1
        if n > _MAX_ENTRIES:
            raise ArchiveFormatError("member count exceeds cap")
        if first_name is None:
            first_name = name
        total += size
        pos += 512 + (size + 511) // 512 * 512
        if pos > len(data):
            break                              # truncated final member
    if n == 0:
        raise ArchiveFormatError("no tar members")
    return {"n_members": n, "first_name": first_name,
            "member_bytes": total}


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """Minimal-but-real ustar archive."""
    out = bytearray()
    for name, payload in members:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ArchiveFormatError("name too long for ustar")
        hdr = bytearray(512)
        hdr[0:len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{len(payload):011o}\x00".encode()
        hdr[136:148] = b"00000000000\x00"
        hdr[148:156] = b" " * 8                # checksum placeholder
        hdr[156] = ord("0")                    # regular file
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = f"{chk:06o}\x00 ".encode()
        out += hdr + payload
        if len(payload) % 512:
            out += bytes(512 - len(payload) % 512)
    out += bytes(1024)                         # two zero blocks
    return bytes(out)
