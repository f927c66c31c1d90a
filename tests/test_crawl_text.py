"""Crawl→corpus helpers (functions/crawl_text.py — r5 wave 8): charset
sniffing, mojibake repair / normalization, robots.txt parsing and the
registrable-domain PSL match."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_job_spark.functions.crawl_text import (
    PUBLIC_SUFFIXES,
    _match_like,
    decode_cp1252_total,
    normalize_text,
    parse_robots,
    registrable_domain,
    repair_mojibake,
    robots_decide,
    robots_like_pattern,
    sniff_decode,
)

# --- charset sniffing ----------------------------------------------------------


def test_sniff_boms():
    assert sniff_decode(b"\xef\xbb\xbfhi")["charset"] == "utf-8"
    assert sniff_decode(b"\xef\xbb\xbfhi")["had_bom"] is True
    r16 = sniff_decode(b"\xff\xfe" + "ab".encode("utf-16-le"))
    assert (r16["charset"], r16["text"]) == ("utf-16-le", "ab")
    r16b = sniff_decode(b"\xfe\xff" + "ab".encode("utf-16-be"))
    assert (r16b["charset"], r16b["text"]) == ("utf-16-be", "ab")
    # UTF-32-LE BOM starts with the UTF-16-LE BOM bytes — must win
    r32 = sniff_decode(b"\xff\xfe\x00\x00" + "a".encode("utf-32-le"))
    assert (r32["charset"], r32["text"]) == ("utf-32-le", "a")


def test_sniff_ascii_vs_utf8_vs_cp1252():
    assert sniff_decode(b"plain")["charset"] == "ascii"
    assert sniff_decode("café".encode())["charset"] == "utf-8"
    r = sniff_decode("smart ’".encode("cp1252"))
    assert r["charset"] == "cp1252" and r["text"] == "smart ’"


def test_sniff_lying_bom_falls_through():
    # UTF-16-LE BOM followed by an odd byte count that can't be UTF-16:
    # content sniffing takes over on the FULL payload (BOM kept as data).
    r = sniff_decode(b"\xff\xfeabc")
    assert r["had_bom"] in (False, True)  # decoded somehow, never raises
    assert isinstance(r["text"], str)


@given(st.binary(max_size=256))
@settings(max_examples=200, deadline=None)
def test_sniff_total_never_raises(payload):
    r = sniff_decode(payload)
    assert isinstance(r["text"], str)
    assert r["charset"] in ("ascii", "utf-8", "cp1252", "utf-16-le",
                            "utf-16-be", "utf-32-le", "utf-32-be")


def test_cp1252_total_unassigned_bytes():
    # 0x81, 0x8D, 0x8F, 0x90, 0x9D are unassigned in cp1252 —
    # WHATWG behavior keeps their Latin-1 identity
    assert decode_cp1252_total(bytes([0x81, 0x90])) == "\x81\x90"
    assert decode_cp1252_total(b"\x92") == "’"


# --- normalization / mojibake ----------------------------------------------------


def test_repair_mojibake_roundtrip():
    clean = "café — naïve ’quote’"
    moji = clean.encode("utf-8").decode("cp1252")
    fixed, did = repair_mojibake(moji)
    assert did and fixed == clean


def test_repair_mojibake_conservative():
    # A genuine French sentence with Ã as real text must NOT be "repaired"
    # when the repair doesn't decode as UTF-8
    s = "Ã tout à l'heure"
    fixed, did = repair_mojibake(s)
    assert fixed == s and not did
    # no mojibake signature at all → untouched fast path
    assert repair_mojibake("plain")[1] is False


def test_normalize_nfd_zero_width_nbsp_controls():
    r = normalize_text("ze\u0301ro\u200b 5\u00a0end")
    assert r["text"] == "zéro 5 end" and r["changed"]
    r2 = normalize_text("ctl\x07 a\t\n  b\x1f")
    assert r2["text"] == "ctl a b"
    r3 = normalize_text("already clean")
    assert r3["text"] == "already clean" and not r3["changed"]


@given(st.text(max_size=120))
@settings(max_examples=200, deadline=None)
def test_normalize_total_and_idempotent(s):
    r = normalize_text(s)
    assert isinstance(r["text"], str)
    again = normalize_text(r["text"])
    # normalization is idempotent on its own output (mojibake repair is
    # gated on a strict score decrease, so it can't oscillate)
    assert again["text"] == r["text"]


# --- robots.txt -------------------------------------------------------------------


ROBOTS = """# policy
User-agent: googlebot
Disallow: /

User-agent: *
Crawl-delay: 2
Disallow: /private
Allow: /private/ok
Disallow: /*.zip$
Allow:
"""


def test_robots_group_selection_skips_decoy():
    r = parse_robots(ROBOTS, agent="sparkbot")
    assert [x.pattern for x in r["rules"]] == [
        "/private", "/private/ok", "/*.zip$"]
    assert r["crawl_delay"] == 2.0
    g = parse_robots(ROBOTS, agent="googlebot")
    assert [x.pattern for x in g["rules"]] == ["/"]


def test_robots_decisions():
    rules = parse_robots(ROBOTS)["rules"]
    assert robots_decide("/public/x", rules) == (True, None)
    assert robots_decide("/private/x", rules) == (False, "/private")
    assert robots_decide("/private/ok/y", rules) == (True, "/private/ok")
    assert robots_decide("/files/a.zip", rules) == (False, "/*.zip$")
    assert robots_decide("/files/a.zipx", rules) == (True, None)  # $ anchor


def test_robots_allow_wins_tie():
    txt = "User-agent: *\nDisallow: /a/b\nAllow: /a/c\n"
    rules = parse_robots(txt)["rules"]
    # equal-length rules on a path matching both can't exist with
    # distinct prefixes; construct a real tie via wildcards
    txt2 = "User-agent: *\nDisallow: /x*\nAllow: /x*\n"
    rules2 = parse_robots(txt2)["rules"]
    assert robots_decide("/xyz", rules2)[0] is True


def test_robots_shared_agent_lines_and_garbage():
    txt = ("User-agent: a\nUser-agent: b\nDisallow: /q\n"
           "not a directive\nDisallow\n: odd\n")
    ra = parse_robots(txt, agent="a")
    rb = parse_robots(txt, agent="b")
    assert [x.pattern for x in ra["rules"]] == ["/q"]
    assert [x.pattern for x in rb["rules"]] == ["/q"]
    # no matching group and no * group → everything allowed
    rc = parse_robots(txt, agent="c")
    assert rc["rules"] == [] and robots_decide("/q", rc["rules"])[0]


def test_robots_like_translation_escapes():
    assert robots_like_pattern("/a*b$") == "/a%b"
    assert robots_like_pattern("/a") == "/a%"
    assert robots_like_pattern("/50%_off") == "/50\\%\\_off%"
    assert _match_like("/50%_off/x", robots_like_pattern("/50%_off"))
    assert not _match_like("/50Xoff/x", robots_like_pattern("/50%_off"))


@given(st.text(alphabet="/ab*$%_", min_size=1, max_size=12),
       st.text(alphabet="/ab%_x.", max_size=16))
@settings(max_examples=300, deadline=None)
def test_robots_like_matches_python_semantics(pattern, path):
    """The LIKE translation agrees with a direct wildcard interpreter."""
    import re as _re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(_re.escape(p) for p in body.split("*"))
    if not anchored:
        rx += ".*"
    expect = _re.fullmatch(rx, path, flags=_re.S) is not None
    got = _match_like(path, robots_like_pattern(pattern))
    assert got == expect


# --- registrable domain ------------------------------------------------------------


def test_registrable_domain_depths():
    assert registrable_domain("www.blog.co.uk")["domain"] == "blog.co.uk"
    assert registrable_domain("a.b.site.com")["domain"] == "site.com"
    assert registrable_domain("cdn.app.github.io")["domain"] == "app.github.io"
    assert registrable_domain("x.Y.s3.amazonaws.com")["domain"] == "y.s3.amazonaws.com"
    assert registrable_domain("plain.org") == {
        "domain": "plain.org", "suffix": "org", "is_suffix": False}


def test_registrable_domain_unknown_and_suffix_host():
    r = registrable_domain("naked.internal")
    assert r["domain"] == "naked.internal" and r["suffix"] == "internal"
    r2 = registrable_domain("co.uk")
    assert r2["is_suffix"] is True and r2["domain"] == "co.uk"
    r3 = registrable_domain("com")
    assert r3["is_suffix"] is True


def test_registrable_domain_trailing_dot_and_case():
    assert registrable_domain("WWW.Site.COM.")["domain"] == "site.com"


def test_public_suffix_list_shape():
    # every multi-label suffix's parent labels are plausible; list stays
    # lowercase and dot-separated (the PSL invariants the matcher assumes)
    for s in PUBLIC_SUFFIXES:
        assert s == s.lower() and not s.startswith(".") and not s.endswith(".")


# --- sentence segmentation (r5 wave 9) ---------------------------------------------


def test_sentence_split_guards():
    from flink_job_spark.functions.crawl_text import split_sentences
    t = ("Dr. Smith met Mr. Jones at the 3.14 mile marker 7. They "
         "arrived e.g. at noon! Was it No. 4 on Fig. 2? Yes. "
         "J. K. Rowling wrote it.")
    s = split_sentences(t)
    assert len(s) == 5
    assert s[0].endswith("marker 7.")
    assert s[1] == "They arrived e.g. at noon!"
    assert s[2] == "Was it No. 4 on Fig. 2?"
    assert s[3] == "Yes."
    assert s[4] == "J. K. Rowling wrote it."


def test_sentence_split_edges():
    from flink_job_spark.functions.crawl_text import split_sentences
    assert split_sentences("") == []
    assert split_sentences("   \n\t ") == []
    assert split_sentences("No terminator here") == ["No terminator here"]
    # lowercase continuation does not split ("etc. and so on")
    assert split_sentences("First bit etc. and more. Second.") == [
        "First bit etc. and more.", "Second."]
    # quote/paren sentence starts DO split
    assert split_sentences('Quote test. "Inner start" follows?') == [
        "Quote test.", '"Inner start" follows?']
    # ellipsis run followed by uppercase splits once
    assert split_sentences("Wait... Then go.") == ["Wait...", "Then go."]


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_sentence_split_total_and_lossless_words(text):
    from flink_job_spark.functions.crawl_text import split_sentences
    sents = split_sentences(text)
    # totality + conservation: the concatenated sentences contain exactly
    # the input's whitespace-normalized content
    assert " ".join(" ".join(sents).split()) == " ".join(text.split())
