"""FLAC STREAMINFO + Ogg page-walk (Vorbis/Opus) container metadata.

Completes the audio-container triage family (functions/mp3.py): the
remaining two formats a crawl actually contains are FLAC (lossless
archives) and Ogg (Vorbis music, Opus speech — the voice-dataset
workhorse). Both expose duration/rate/channels in fixed struct layouts:

- FLAC (xiph.org format spec): "fLaC" magic, then metadata blocks
  [last<<7|type, u24 length]; STREAMINFO (type 0, 34 bytes) packs
  sample rate (20 bits), channels-1 (3), bits-per-sample-1 (5) and
  total samples (36) into one 8-byte bitfield → exact duration.
- Ogg (RFC 3533): "OggS" pages with a little-endian u64 granule
  position, stream serial, and a segment table; the FIRST packet
  identifies the codec ("\\x01vorbis" → u32 LE rate + u8 channels,
  "OpusHead" → u8 channels + u16 pre-skip, granules fixed at 48 kHz);
  duration = last page's granule (minus Opus pre-skip) / rate.

Decode of the audio itself stays the documented adapter boundary —
identical split to MP3 (native metadata, adapter PCM). Errors raise
AudioFormatError → ``decode_error`` rows; the page walk is bomb-guarded
(page count cap, segment-table bounds), truncated tails degrade to the
pages seen, like every real reader.

Reference parity: per-row skip-never-crash ingestion (mis_initial_job
FirebirdToIcebergJob mis:530-586) extended to the audio-container
surface.
"""

from __future__ import annotations

import struct


class AudioFormatError(ValueError):
    """Malformed FLAC/Ogg structure — becomes a decode_error row."""


_MAX_OGG_PAGES = 1 << 20          # ~64 GB of maximal pages: bomb guard


# --------------------------------------------------------------------------
# FLAC
# --------------------------------------------------------------------------

def flac_meta(data: bytes) -> dict:
    """Parse the STREAMINFO block → sample_rate, channels,
    bits_per_sample, total_samples, duration_ms (exact integer floor)."""
    if data[:4] != b"fLaC":
        raise AudioFormatError("not a FLAC stream")
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise AudioFormatError("truncated metadata block header")
        hdr = data[pos]
        btype, last = hdr & 0x7F, hdr & 0x80
        (blen,) = struct.unpack(">I", b"\x00" + data[pos + 1:pos + 4])
        body = data[pos + 4:pos + 4 + blen]
        if len(body) != blen:
            raise AudioFormatError("truncated metadata block")
        if btype == 0:                         # STREAMINFO
            if blen < 34:
                raise AudioFormatError("short STREAMINFO")
            packed = int.from_bytes(body[10:18], "big")
            sr = packed >> 44
            ch = ((packed >> 41) & 0x7) + 1
            bps = ((packed >> 36) & 0x1F) + 1
            total = packed & ((1 << 36) - 1)
            if sr == 0:
                raise AudioFormatError("STREAMINFO sample rate 0")
            return {"sample_rate": sr, "channels": ch,
                    "bits_per_sample": bps, "total_samples": total,
                    "duration_ms": total * 1000 // sr}
        if last:
            break
        pos += 4 + blen
    raise AudioFormatError("no STREAMINFO block")


def build_flac(sample_rate: int, channels: int, total_samples: int,
               bits_per_sample: int = 16) -> bytes:
    """Minimal-but-real FLAC header: fLaC + STREAMINFO (marked last)."""
    if not (1 <= channels <= 8 and 4 <= bits_per_sample <= 32
            and 0 < sample_rate < (1 << 20) and total_samples < (1 << 36)):
        raise AudioFormatError("STREAMINFO field out of range")
    packed = ((sample_rate << 44) | ((channels - 1) << 41)
              | ((bits_per_sample - 1) << 36) | total_samples)
    body = bytes(10) + packed.to_bytes(8, "big") + bytes(16)   # md5 zeroed
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:] + body


# --------------------------------------------------------------------------
# Ogg (Vorbis / Opus)
# --------------------------------------------------------------------------

def ogg_meta(data: bytes) -> dict:
    """Walk Ogg pages of the FIRST stream → codec ('vorbis'/'opus'),
    sample_rate, channels, duration_ms (exact integer from the last
    granule; Opus granules run at 48 kHz minus pre-skip). A truncated
    tail degrades to the pages seen."""
    if data[:4] != b"OggS":
        raise AudioFormatError("not an Ogg stream")
    pos = 0
    serial = None
    codec = None
    sr = ch = None
    pre_skip = 0
    last_granule = 0
    pages = 0
    while pos + 27 <= len(data):
        if data[pos:pos + 4] != b"OggS":
            break                              # junk after good pages
        pages += 1
        if pages > _MAX_OGG_PAGES:
            raise AudioFormatError("page count exceeds cap")
        if data[pos + 4] != 0:
            raise AudioFormatError(f"bad Ogg version {data[pos + 4]}")
        granule, pserial = struct.unpack("<qI", data[pos + 6:pos + 18])
        nsegs = data[pos + 26]
        seg_table = data[pos + 27:pos + 27 + nsegs]
        if len(seg_table) != nsegs:
            raise AudioFormatError("truncated segment table")
        body_len = sum(seg_table)
        body = data[pos + 27 + nsegs:pos + 27 + nsegs + body_len]
        if len(body) != body_len:
            break                              # truncated final page
        if serial is None:
            serial = pserial
        if pserial == serial:
            if codec is None:
                if body[:7] == b"\x01vorbis":
                    if len(body) < 16:
                        raise AudioFormatError("short Vorbis id header")
                    codec = "vorbis"
                    ch = body[11]
                    (sr,) = struct.unpack("<I", body[12:16])
                elif body[:8] == b"OpusHead":
                    if len(body) < 12:
                        raise AudioFormatError("short OpusHead")
                    codec = "opus"
                    ch = body[9]
                    (pre_skip,) = struct.unpack("<H", body[10:12])
                    sr = 48000                 # granules always at 48 kHz
                else:
                    raise AudioFormatError("unknown Ogg codec")
                if not sr or not ch:
                    raise AudioFormatError("bad id header rate/channels")
            if granule >= 0:
                last_granule = max(last_granule, granule)
        pos += 27 + nsegs + body_len
    if codec is None:
        raise AudioFormatError("no identification header")
    samples = max(0, last_granule - (pre_skip if codec == "opus" else 0))
    return {"codec": codec, "sample_rate": sr, "channels": ch,
            "duration_ms": samples * 1000 // sr}


def _ogg_page(serial: int, seq: int, granule: int, body: bytes,
              header_type: int = 0) -> bytes:
    if len(body) > 255 * 255:
        raise AudioFormatError("single-page body too long")
    nfull, rem = divmod(len(body), 255)
    segs = bytes([255] * nfull + [rem])
    return (b"OggS\x00" + bytes([header_type])
            + struct.pack("<qIII", granule, serial, seq, 0)
            + bytes([len(segs)]) + segs + body)


def build_ogg(codec: str, sample_rate: int, channels: int,
              total_samples: int, serial: int = 1) -> bytes:
    """Minimal-but-real Ogg: id-header page (BOS) + one data page whose
    granule encodes the stream length (+ pre-skip 0 for Opus)."""
    if codec == "vorbis":
        idh = (b"\x01vorbis" + struct.pack("<I", 0) + bytes([channels])
               + struct.pack("<I", sample_rate) + bytes(12))
    elif codec == "opus":
        idh = (b"OpusHead\x01" + bytes([channels]) + struct.pack("<H", 0)
               + struct.pack("<I", sample_rate) + bytes(3))
        sample_rate = 48000                    # granule clock
    else:
        raise AudioFormatError(f"unknown codec {codec!r}")
    p0 = _ogg_page(serial, 0, 0, idh, header_type=0x02)        # BOS
    p1 = _ogg_page(serial, 1, total_samples, b"\x00" * 16,
                   header_type=0x04)                            # EOS
    return p0 + p1
