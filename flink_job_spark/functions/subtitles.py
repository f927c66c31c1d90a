"""SRT / WebVTT subtitle parsing — the transcript side of video training
pairs (video->caption alignment reads these before any frame is decoded).

Pure-text grammars, parsed strictly enough to be SQL-reproducible:

- SRT: blank-line-separated cues of ``index / HH:MM:SS,mmm --> HH:MM:SS,mmm
  / text lines``; indices are not trusted (real files renumber badly).
- WebVTT: the ``WEBVTT`` magic, optional cue identifiers, ``HH:MM:SS.mmm``
  (dot, not comma) timestamps with optional cue settings after the range,
  NOTE/STYLE/REGION blocks skipped.

Both return the same cue tuples (start_ms, end_ms, text-with-newlines-
joined-by-space). Malformed cues raise SubtitleFormatError (errors-as-data
at the operator layer); caps bound cue count and payload size.
"""

from __future__ import annotations

import re

_MAX_BYTES = 16 * 1024 * 1024
_MAX_CUES = 500_000

# hours: 2-or-more digits — WebVTT explicitly allows >99h recordings
# ("hours" is 2+ digits in the spec grammar); SRT files in the wild do too
_SRT_TS = re.compile(r"^(\d{2,}):(\d{2}):(\d{2})[,.](\d{3})$")
_ARROW = re.compile(r"\s*-->\s*")


class SubtitleFormatError(ValueError):
    pass


def _ts_ms(tok: str) -> int:
    m = _SRT_TS.match(tok)
    if not m:
        # VTT allows MM:SS.mmm (no hours)
        m2 = re.match(r"^(\d{2}):(\d{2})\.(\d{3})$", tok)
        if not m2:
            raise SubtitleFormatError(f"bad timestamp {tok!r}")
        mm, ss, ms = (int(g) for g in m2.groups())
        return (mm * 60 + ss) * 1000 + ms
    hh, mm, ss, ms = (int(g) for g in m.groups())
    if mm >= 60 or ss >= 60:
        raise SubtitleFormatError(f"bad timestamp {tok!r}")
    return ((hh * 60 + mm) * 60 + ss) * 1000 + ms


def _parse_blocks(text: str) -> list[list[str]]:
    blocks: list[list[str]] = []
    cur: list[str] = []
    for line in text.split("\n"):
        line = line.rstrip("\r")
        if line.strip() == "":
            if cur:
                blocks.append(cur)
                cur = []
        else:
            cur.append(line)
    if cur:
        blocks.append(cur)
    return blocks


def parse_srt(data: bytes) -> list[tuple[int, int, str]]:
    """[(start_ms, end_ms, text)] in file order."""
    if len(data) > _MAX_BYTES:
        raise SubtitleFormatError("subtitle file exceeds size cap")
    text = data.decode("utf-8-sig", errors="replace")
    cues: list[tuple[int, int, str]] = []
    for block in _parse_blocks(text):
        # first line may be the numeric index — skip it if so
        lines = block
        if lines and lines[0].strip().isdigit():
            lines = lines[1:]
        if not lines or "-->" not in lines[0]:
            raise SubtitleFormatError(f"cue missing timing line: {block[:2]}")
        parts = _ARROW.split(lines[0].strip())
        if len(parts) != 2:
            raise SubtitleFormatError(f"bad timing line {lines[0]!r}")
        start, end = _ts_ms(parts[0]), _ts_ms(parts[1])
        if end < start:
            raise SubtitleFormatError("cue ends before it starts")
        cues.append((start, end, " ".join(s.strip() for s in lines[1:])))
        if len(cues) > _MAX_CUES:
            raise SubtitleFormatError("cue count exceeds cap")
    return cues


def parse_vtt(data: bytes) -> list[tuple[int, int, str]]:
    """[(start_ms, end_ms, text)] — WEBVTT magic required; NOTE/STYLE/
    REGION blocks and cue settings handled."""
    if len(data) > _MAX_BYTES:
        raise SubtitleFormatError("subtitle file exceeds size cap")
    text = data.decode("utf-8-sig", errors="replace")
    blocks = _parse_blocks(text)
    if not blocks or not blocks[0][0].startswith("WEBVTT"):
        raise SubtitleFormatError("missing WEBVTT magic")
    cues: list[tuple[int, int, str]] = []
    # the spec requires a blank line after the header block, so cues never
    # share it; any extra header-block lines are metadata (Kind:, Language:)
    for block in blocks[1:]:
        lines = [ln for ln in block if ln.strip()]
        if not lines:
            continue
        if lines[0].split()[0] in ("NOTE", "STYLE", "REGION"):
            continue
        if "-->" not in lines[0]:
            lines = lines[1:]          # cue identifier line
        if not lines or "-->" not in lines[0]:
            raise SubtitleFormatError(f"cue missing timing line: {block[:2]}")
        timing = lines[0].strip()
        parts = _ARROW.split(timing)
        if len(parts) != 2:
            raise SubtitleFormatError(f"bad timing line {timing!r}")
        end_tok = parts[1].split()[0]  # strip cue settings (align: etc.)
        start, end = _ts_ms(parts[0]), _ts_ms(end_tok)
        if end < start:
            raise SubtitleFormatError("cue ends before it starts")
        cues.append((start, end, " ".join(s.strip() for s in lines[1:])))
        if len(cues) > _MAX_CUES:
            raise SubtitleFormatError("cue count exceeds cap")
    return cues
