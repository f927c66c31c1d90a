"""SVG metadata extraction (stdlib ElementTree) — the vector-image triage
pass a crawl runs before deciding whether to rasterize.

Metadata only, never rasterization: intrinsic size (width/height
attributes in px or pt, falling back to the viewBox), element census
(paths / basic shapes / text nodes) and the has_script flag (inline
script makes an SVG active content — the security triage bit). Same
defensive posture as functions/sitemap.py: any ``<!DOCTYPE``/``<!ENTITY``
is rejected outright (entity-expansion bombs die before the parser runs),
plus size and element-count caps. pt converts at the CSS 96/72 ratio with
integer math (4/3 — exact when the pt value is divisible by 3, else
floor, documented).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

_MAX_BYTES = 8 * 1024 * 1024
_MAX_ELEMENTS = 100_000

_SHAPES = {"rect", "circle", "ellipse", "line", "polygon", "polyline"}
_LEN_RE = re.compile(r"^\s*(\d+)\s*(px|pt)?\s*$")


class SvgFormatError(ValueError):
    pass


def _localname(tag: object) -> str:
    if not isinstance(tag, str):
        return ""                        # comments / PIs
    return tag.rsplit("}", 1)[-1]


def _length_px(value: str | None) -> int | None:
    """'120' / '120px' -> 120; '90pt' -> 120 (x4/3, floor); else None."""
    if not value:
        return None
    m = _LEN_RE.match(value)
    if not m:
        return None                      # percentages, ems, calc() ...
    n = int(m.group(1))
    return n * 4 // 3 if m.group(2) == "pt" else n


def svg_meta(data: bytes) -> dict:
    """{width_px, height_px, n_paths, n_shapes, n_text, has_script} —
    width/height fall back to the viewBox box when the attributes are
    absent or non-absolute."""
    if len(data) > _MAX_BYTES:
        raise SvgFormatError(f"SVG exceeds {_MAX_BYTES} bytes")
    # scan the WHOLE payload: a DOCTYPE is legal anywhere before the root
    # element, so a head-limited scan is bypassable with 4 KB of leading
    # comments (review-caught r5 w11; substring search is ~GB/s, the size
    # cap above bounds it)
    if b"<!DOCTYPE" in data or b"<!ENTITY" in data:
        raise SvgFormatError("DTD not allowed in SVG triage")
    try:
        root = ET.fromstring(data)
    except ET.ParseError as e:
        raise SvgFormatError(f"bad XML: {e}") from e
    if _localname(root.tag) != "svg":
        raise SvgFormatError(f"root element is {_localname(root.tag)!r}")

    width = _length_px(root.get("width"))
    height = _length_px(root.get("height"))
    if width is None or height is None:
        vb = (root.get("viewBox") or "").replace(",", " ").split()
        if len(vb) == 4:
            try:
                if width is None:
                    width = int(float(vb[2]))
                if height is None:
                    height = int(float(vb[3]))
            except ValueError:
                pass

    n_paths = n_shapes = n_text = 0
    has_script = False
    count = 0
    for el in root.iter():
        count += 1
        if count > _MAX_ELEMENTS:
            raise SvgFormatError("element count exceeds cap")
        name = _localname(el.tag)
        if name == "path":
            n_paths += 1
        elif name in _SHAPES:
            n_shapes += 1
        elif name == "text":
            n_text += 1
        elif name == "script":
            has_script = True
    return {"width_px": width, "height_px": height, "n_paths": n_paths,
            "n_shapes": n_shapes, "n_text": n_text,
            "has_script": has_script}
