"""G.711 companded WAV decode (mu-law fmt 7, A-law fmt 6) — pure stdlib.

Telephony/call-center corpora store 8 kHz audio as 8-bit companded samples;
the stdlib ``wave`` module refuses anything but PCM, so these files would
degrade to decode errors. The expansion tables are the ITU G.711 piecewise-
linear formulas in their classic Sun/CCITT integer form (ulaw2linear /
alaw2linear): every stored byte maps to a 16-bit linear sample, bit-exactly
reproducible in SQL (the oracle rebuilds the same formula with integer bit
ops), so RMS over the decoded stream is engine-exact — squares are integers
and their sums stay far below 2^53.

The RIFF walk here is deliberately minimal: fmt + data chunks only, every
read bounds-checked, malformed files raise G711FormatError (errors-as-data
at the operator layer, the repo-wide codec contract).
"""

from __future__ import annotations

import struct


class G711FormatError(ValueError):
    pass


def _ulaw2lin(b: int) -> int:
    u = ~b & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return 0x84 - t if u & 0x80 else t - 0x84


def _alaw2lin(b: int) -> int:
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


ULAW2LIN = [_ulaw2lin(b) for b in range(256)]
ALAW2LIN = [_alaw2lin(b) for b in range(256)]

WAVE_FORMAT_ALAW = 6
WAVE_FORMAT_MULAW = 7


def parse_wav_chunks(data: bytes) -> tuple[tuple[int, int, int, int], bytes]:
    """((audio_format, channels, sample_rate, bits_per_sample), data_bytes)
    from a RIFF/WAVE container — fmt and data chunks only, bounds-checked."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise G711FormatError("not a RIFF/WAVE file")
    fmt = None
    body = None
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        chunk = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            if len(chunk) < 16:
                raise G711FormatError("truncated fmt chunk")
            afmt, ch, sr = struct.unpack("<HHI", chunk[:8])
            bits = struct.unpack("<H", chunk[14:16])[0]
            fmt = (afmt, ch, sr, bits)
        elif tag == b"data":
            if len(chunk) < size:
                raise G711FormatError("truncated data chunk")
            body = chunk
        pos += 8 + size + (size & 1)  # chunks pad to even offsets
    if fmt is None:
        raise G711FormatError("missing fmt chunk")
    if body is None:
        raise G711FormatError("missing data chunk")
    return fmt, body


_MAX_SAMPLES = 64_000_000   # ~2 hours of 8 kHz audio; bounds the int list


def decode_g711(data: bytes) -> tuple[int, int, int, list[int]]:
    """(sample_rate, channels, n_frames, 16-bit samples) for a mu-law or
    A-law WAV. Raises G711FormatError on anything else."""
    (afmt, ch, sr, bits), body = parse_wav_chunks(data)
    if len(body) > _MAX_SAMPLES:
        raise G711FormatError("sample count exceeds cap")
    if afmt not in (WAVE_FORMAT_ALAW, WAVE_FORMAT_MULAW):
        raise G711FormatError(f"not a G.711 format tag ({afmt})")
    if bits != 8:
        raise G711FormatError(f"G.711 requires 8-bit samples, got {bits}")
    if ch < 1 or sr < 1:
        raise G711FormatError("bad fmt fields")
    table = ULAW2LIN if afmt == WAVE_FORMAT_MULAW else ALAW2LIN
    samples = [table[b] for b in body]
    return sr, ch, len(samples) // ch, samples


def encode_g711_wav(sample_rate: int, channels: int, payload: bytes,
                    mulaw: bool = True) -> bytes:
    """Wrap raw companded bytes in a minimal RIFF/WAVE container (fmt tag
    7 for mu-law, 6 for A-law) — fixture builder for tests and oracle keys."""
    afmt = WAVE_FORMAT_MULAW if mulaw else WAVE_FORMAT_ALAW
    byte_rate = sample_rate * channels
    fmt = struct.pack("<HHIIHH", afmt, channels, sample_rate,
                      byte_rate, channels, 8)
    body = payload + (b"\x00" if len(payload) & 1 else b"")
    riff = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + body)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
