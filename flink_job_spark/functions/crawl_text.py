"""Crawl→corpus text plumbing: charset sniffing, Unicode normalization /
mojibake repair, robots.txt parsing, registrable-domain extraction.

These are the remaining per-document stages between the WARC record walk
(functions/warc.py) / HTML extraction (functions/html_text.py) and the
text-quality / dedup families — the layers every 100 TB crawl ingest runs
before a single token is counted:

- ``sniff_decode``: payload bytes → (charset, text). BOM-first detection
  (UTF-32 before UTF-16 — their BOMs share a prefix), strict-UTF-8
  validation for unmarked payloads, CP-1252 as the final fallback (it is
  a total function over bytes once the five unassigned code points fall
  back to their Latin-1 identities, so decoding CANNOT fail — the
  errors-as-data property this layer owes the pipeline).
- ``normalize_text``: the canonical cleanup policy — repair whole-string
  CP-1252-in-UTF-8 mojibake ("Ã©" → "é") when the repair round-trip is
  loss-free AND strictly reduces the mojibake signature, then NFC,
  then strip zero-widths, map NBSP→space, drop C0/C1 controls (except
  \n\t which count as whitespace), collapse whitespace runs.
- ``parse_robots`` / ``robots_like_pattern``: RFC 9309 — group selection
  by user-agent token (specific group wins over ``*``), Allow/Disallow
  path rules with ``*`` wildcards and the ``$`` end anchor, longest-rule
  precedence with Allow winning ties, empty-pattern rules ignored,
  ``crawl-delay`` captured (nonstandard but ubiquitous). Rules are
  emitted as data (pattern, SQL LIKE translation, specificity length) so
  the match itself runs as a relational join in the engine, not Python.
- ``registrable_domain``: public-suffix-list matching (longest known
  suffix wins, unknown TLD falls back to the last label), returning the
  (one label + suffix) registrable domain crawl-level grouping keys on.

Scale: every function here is per-row / per-small-string, run inside
Arrow-batched mapInPandas or (robots match, PSL match) expressed as a
broadcast equi-join so the heavy side never shuffles.
"""

from __future__ import annotations

import codecs
import re
import unicodedata

# --- charset sniffing ----------------------------------------------------------

# CP-1252 leaves five bytes unassigned; real-world decoders (WHATWG
# windows-1252) map them through to the Latin-1 C1 controls so decode is
# total. A registered codec error handler keeps the whole decode at
# C speed — Python runs only at the (rare) unassigned bytes. Measured by
# tools/container_throughput.py: a str.translate remap ran at 6 MB/s
# (per-char dict probes); this path decodes at latin-1-class speed.


def _c1_passthrough(err: UnicodeError):
    if isinstance(err, UnicodeDecodeError):
        return (err.object[err.start:err.end].decode("latin-1"), err.end)
    raise err


codecs.register_error("flinkjob_c1_passthrough", _c1_passthrough)

_BOMS = (  # order matters: UTF-32 BOMs contain the UTF-16 ones as a prefix
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
)


def decode_cp1252_total(payload: bytes) -> str:
    """Total windows-1252 decode — unassigned bytes keep their Latin-1
    identity, so this never raises (the WHATWG behavior). C-speed via
    the registered error handler; no per-byte Python loop."""
    return payload.decode("cp1252", "flinkjob_c1_passthrough")


def sniff_decode(payload: bytes) -> dict:
    """Detect the charset of ``payload`` and decode it.

    Returns ``{"charset", "had_bom", "text"}``. Detection order: BOM →
    strict UTF-8 (reported as ``ascii`` when no byte ≥ 0x80) → CP-1252
    fallback. Total: never raises on any byte string.
    """
    for bom, enc in _BOMS:
        if payload.startswith(bom):
            body = payload[len(bom):]
            try:
                return {"charset": enc, "had_bom": True,
                        "text": body.decode(enc)}
            except UnicodeDecodeError:
                # lying BOM: fall through to content sniffing on the
                # full payload (BOM bytes kept — they are data now)
                break
    try:
        text = payload.decode("utf-8")
        charset = "ascii" if payload.isascii() else "utf-8"
        return {"charset": charset, "had_bom": False, "text": text}
    except UnicodeDecodeError:
        return {"charset": "cp1252", "had_bom": False,
                "text": decode_cp1252_total(payload)}


# --- Unicode normalization + mojibake repair ------------------------------------

# Characters whose presence strongly suggests CP-1252-decoded UTF-8:
# Ã/Â lead bytes of 2-byte Latin sequences, â€¦ smart-punct triples,
# the C1-control pass-throughs.
_MOJIBAKE_RE = re.compile("[\u00c2\u00c3\u0080-\u009f]|\u00e2\u20ac")
_ZERO_WIDTH_RE = re.compile("[\u200b\u200c\u200d\ufeff]")
_CONTROL_RE = re.compile("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f\u0080-\u009f]")
_WS_RE = re.compile(r"\s+")


def _mojibake_score(s: str) -> int:
    return len(_MOJIBAKE_RE.findall(s))


def repair_mojibake(s: str) -> tuple[str, bool]:
    """Undo one round of CP-1252-in-UTF-8 mojibake if — and only if —
    the whole string re-encodes to CP-1252 losslessly, the resulting
    bytes are valid UTF-8, and the repair strictly lowers the mojibake
    signature count. Conservative by design: a string that fails any
    leg is returned unchanged (ftfy's "don't make it worse" rule)."""
    before = _mojibake_score(s)
    if not before:
        return s, False
    try:
        raw = s.encode("cp1252")
    except UnicodeEncodeError:
        try:  # C1 pass-throughs from decode_cp1252_total aren't cp1252
            raw = s.encode("latin-1")
        except UnicodeEncodeError:
            return s, False
    try:
        fixed = raw.decode("utf-8")
    except UnicodeDecodeError:
        return s, False
    if _mojibake_score(fixed) < before:
        return fixed, True
    return s, False


def normalize_text(s: str) -> dict:
    """The canonical text-normalization policy (see module docstring).

    Returns ``{"text", "fixed_mojibake", "changed"}`` where ``changed``
    covers ANY difference from the input. The pipeline runs to a
    FIXPOINT (bounded): control/zero-width cleanup can expose a
    mojibake string the first whole-string repair declined (Hypothesis
    found "\u00c2\u00a1" behind an unencodable control char), so one pass is not
    idempotent by itself. The repair's strict score decrease bounds the
    loop; 4 iterations is already unreachable in practice.
    """
    out, did_fix = s, False
    for _ in range(4):
        fixed, fixed_now = repair_mojibake(out)
        did_fix = did_fix or fixed_now
        nxt = unicodedata.normalize("NFC", fixed)
        nxt = _ZERO_WIDTH_RE.sub("", nxt)
        nxt = nxt.replace("\u00a0", " ")
        nxt = _CONTROL_RE.sub("", nxt)
        nxt = _WS_RE.sub(" ", nxt).strip()
        if nxt == out:
            break
        out = nxt
    return {"text": out, "fixed_mojibake": did_fix, "changed": out != s}


# --- robots.txt -----------------------------------------------------------------

class RobotsRule:
    """One Allow/Disallow rule: raw pattern + its SQL LIKE translation +
    RFC 9309 specificity (pattern octet length, longest wins)."""

    __slots__ = ("allow", "pattern", "like_pattern", "specificity")

    def __init__(self, allow: bool, pattern: str):
        self.allow = allow
        self.pattern = pattern
        self.like_pattern = robots_like_pattern(pattern)
        self.specificity = len(pattern)


def robots_like_pattern(pattern: str) -> str:
    """Translate a robots path pattern to a SQL LIKE pattern (escape
    char ``\\``): ``*`` → ``%``, trailing ``$`` anchors the end
    (otherwise a trailing ``%`` makes it a prefix match), LIKE
    metacharacters in the literal part escaped."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    out = []
    for ch in body:
        if ch == "*":
            out.append("%")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    if not anchored:
        out.append("%")
    return "".join(out)


def _match_like(path: str, like_pattern: str) -> bool:
    """Reference implementation of the LIKE translation (tests + driver
    fallbacks); the engine runs the same pattern via SQL LIKE."""
    rx = []
    i = 0
    while i < len(like_pattern):
        ch = like_pattern[i]
        if ch == "\\" and i + 1 < len(like_pattern):
            rx.append(re.escape(like_pattern[i + 1]))
            i += 2
            continue
        if ch == "%":
            rx.append(".*")
        elif ch == "_":
            rx.append(".")
        else:
            rx.append(re.escape(ch))
        i += 1
    return re.fullmatch("".join(rx), path, flags=re.S) is not None


def parse_robots(text: str, agent: str = "sparkbot") -> dict:
    """Parse robots.txt per RFC 9309 group semantics.

    Group selection: the group whose ``User-agent`` token is the longest
    case-insensitive prefix of ``agent`` wins; else the ``*`` group;
    else no rules (everything allowed). Consecutive User-agent lines
    share one group. Empty-pattern rules are ignored. Unparseable lines
    are skipped (errors-as-data: tag soup in, best-effort policy out).

    Returns ``{"rules": [RobotsRule...], "crawl_delay": float|None}``.
    """
    groups: list[dict] = []
    cur: dict | None = None
    last_was_agent = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line:
            last_was_agent = False
            continue
        if ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not last_was_agent:
                cur = {"agents": [], "rules": [], "crawl_delay": None}
                groups.append(cur)
            cur["agents"].append(value.lower())
            last_was_agent = True
            continue
        last_was_agent = False
        if cur is None:
            continue  # rule before any User-agent line: ignored
        if key in ("allow", "disallow"):
            if value:
                cur["rules"].append(RobotsRule(key == "allow", value))
            # empty pattern → rule ignored (classic "Disallow:" = allow all)
        elif key == "crawl-delay":
            try:
                cur["crawl_delay"] = float(value)
            except ValueError:
                pass

    agent_l = agent.lower()
    best, best_len = None, -1
    star = None
    for g in groups:
        for a in g["agents"]:
            if a == "*":
                star = star or g
            elif agent_l.startswith(a) and len(a) > best_len:
                best, best_len = g, len(a)
    chosen = best or star
    if chosen is None:
        return {"rules": [], "crawl_delay": None}
    return {"rules": chosen["rules"], "crawl_delay": chosen["crawl_delay"]}


def robots_decide(path: str, rules: list[RobotsRule]) -> tuple[bool, str | None]:
    """Longest-match decision: most specific matching rule wins, Allow
    wins ties, no match → allowed. Returns (allowed, matched_pattern)."""
    best: RobotsRule | None = None
    for r in rules:
        if not _match_like(path, r.like_pattern):
            continue
        if (best is None or r.specificity > best.specificity
                or (r.specificity == best.specificity and r.allow
                    and not best.allow)):
            best = r
    if best is None:
        return True, None
    return best.allow, best.pattern


# --- registrable domain (public-suffix matching) ---------------------------------

# Embedded PSL subset: enough to exercise 1-, 2- and 3-label suffixes.
# A production deployment swaps in the full publicsuffix.org list — the
# matching algorithm (longest known suffix wins) is the PSL algorithm.
PUBLIC_SUFFIXES = (
    "com", "org", "net", "io", "edu", "gov", "info", "biz",
    "co.uk", "org.uk", "ac.uk", "com.au", "net.au", "co.jp", "com.br",
    "github.io", "s3.amazonaws.com", "blogspot.com",
)


def registrable_domain(host: str) -> dict:
    """PSL longest-suffix match → registrable domain (one label + the
    public suffix). Unknown TLD: the last label is treated as the
    suffix (PSL's implicit ``*`` rule). A host that IS a public suffix
    has no registrable domain (returns the host itself, flagged)."""
    labels = host.lower().rstrip(".").split(".")
    suffix = labels[-1]
    for take in (3, 2, 1):
        if len(labels) >= take:
            cand = ".".join(labels[-take:])
            if cand in PUBLIC_SUFFIXES:
                suffix = cand
                break
    n_suffix = suffix.count(".") + 1
    if len(labels) <= n_suffix:
        return {"domain": host.lower(), "suffix": suffix, "is_suffix": True}
    domain = ".".join(labels[-(n_suffix + 1):])
    return {"domain": domain, "suffix": suffix, "is_suffix": False}


# --- CSV dialect sniffing ---------------------------------------------------------

CSV_DELIMS = (",", ";", "\t", "|")


def sniff_csv(text: str, max_lines: int = 100) -> dict:
    """Detect the delimiter / header of a CSV payload (the ingest step
    before spark.read.csv can be pointed at a 100 TB drop of unlabeled
    exports).

    Policy (deterministic, documented):
    - delimiter: the candidate in ``CSV_DELIMS`` for which every sampled
      line parses (stdlib csv, quotechar ``"``) to the SAME field count
      > 1; among consistent candidates the one with the most fields
      wins, ties broken by CSV_DELIMS order. No consistent candidate →
      ``,``.
    - has_header: first row has no numeric-looking field AND at least
      one column is numeric in every data row.
    - quoted: any sampled field required quote parsing.

    Returns {"delimiter", "has_header", "n_cols", "n_rows", "quoted"};
    n_rows counts data rows (header excluded when detected). Total:
    never raises on any string.
    """
    import csv as _csv
    import io as _io

    lines = [ln for ln in text.splitlines() if ln.strip() != ""]
    sample = lines[:max_lines]
    if not sample:
        return {"delimiter": ",", "has_header": False,
                "n_cols": 0, "n_rows": 0, "quoted": False}

    def parse(delim: str) -> list[list[str]] | None:
        try:
            return list(_csv.reader(_io.StringIO("\n".join(sample)),
                                    delimiter=delim, quotechar='"'))
        except _csv.Error:
            return None

    best, best_cols = None, 0
    parsed_rows: list[list[str]] = []
    for delim in CSV_DELIMS:
        rows = parse(delim)
        if not rows:
            continue
        counts = {len(r) for r in rows}
        if len(counts) == 1 and counts.pop() > 1:
            ncols = len(rows[0])
            if ncols > best_cols:
                best, best_cols, parsed_rows = delim, ncols, rows
    if best is None:
        best, parsed_rows = ",", parse(",") or [[ln] for ln in sample]
        best_cols = max((len(r) for r in parsed_rows), default=0)

    def numeric(s: str) -> bool:
        try:
            float(s)
            return True
        except ValueError:
            return False

    has_header = False
    if len(parsed_rows) >= 2:
        head, data = parsed_rows[0], parsed_rows[1:]
        if not any(numeric(f) for f in head):
            n = min(len(r) for r in parsed_rows)
            has_header = any(
                all(numeric(r[c]) for r in data if len(r) > c)
                for c in range(n))
    quoted = any('"' in ln for ln in sample)
    n_rows = len(lines) - (1 if has_header else 0)
    return {"delimiter": best, "has_header": has_header,
            "n_cols": best_cols, "n_rows": n_rows, "quoted": quoted}


# --- sentence segmentation ---------------------------------------------------------

_ABBREVIATIONS = {
    "dr", "mr", "mrs", "ms", "prof", "sr", "jr", "st", "no", "fig",
    "vs", "etc", "e.g", "i.e", "al", "inc", "ltd", "co", "corp",
    "jan", "feb", "mar", "apr", "jun", "jul", "aug", "sep", "sept",
    "oct", "nov", "dec", "approx", "dept", "est", "min", "max",
}
_SENT_END_RE = re.compile(r"[.!?]+")


def split_sentences(text: str) -> list[str]:
    """Rule-based sentence segmentation (the chunking granularity
    training-pair construction wants).

    Policy (deterministic, documented): a ``.``/``!``/``?`` run ends a
    sentence when the NEXT non-space character starts like a sentence
    (uppercase letter, digit, or an opening quote/paren) AND, for ``.``
    only, the token before it is not an abbreviation (embedded list),
    not a single-letter initial ("J. Smith"), and not a number's
    decimal point ("3.14"). Whitespace is normalized per sentence.
    Total: never raises; empty/whitespace input → [].
    """
    s = text.strip()
    if not s:
        return []
    out: list[str] = []
    start = 0
    for m in _SENT_END_RE.finditer(s):
        end = m.end()
        if end < len(s) and not s[end].isspace():
            continue                       # mid-token punctuation (3.14…)
        # find the next non-space char; EOF always ends a sentence
        j = end
        while j < len(s) and s[j].isspace():
            j += 1
        if j < len(s) and not (s[j].isupper() or s[j].isdigit()
                               or s[j] in "\"'(«“‘"):
            continue                       # next token not sentence-shaped
        if m.group(0) == ".":
            before = s[start:m.start()].rsplit(None, 1)
            token = before[-1] if before else ""
            token_l = token.lower().lstrip("(\"'«“‘")
            if token_l in _ABBREVIATIONS or f"{token_l}." in _ABBREVIATIONS:
                continue                   # "Dr." / "No." / "Fig."
            if len(token) == 1 and token.isupper():
                continue                   # initials: "J. Smith"
        sent = " ".join(s[start:end].split())
        if sent:
            out.append(sent)
        start = j
    tail = " ".join(s[start:].split())
    if tail:
        out.append(tail)
    return out
