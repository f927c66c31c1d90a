"""Text-analysis expression builders for the LLM-data-pipeline operators.

Everything is built-in Column expressions (JVM-side, codegen-able) — no Python
UDFs. Each Spark builder has a DuckDB-SQL twin (suffix ``_duck``) used by the
differential oracle harness; the pairs are kept adjacent so they stay in sync.

Regexes are restricted to the common Java-regex ∩ RE2 subset
(char classes, \\b, \\S, alternation — no backrefs, no lookaround).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- normalization: lower, non-alnum runs → single space, trim ---------------
#
# Script-aware (r6): "words" in space-delimited scripts are the space-split
# tokens, but no-space scripts (CJK ideographs + kana + Thai) have no word
# separators at all — under the old rule their text normalized to EMPTY and
# every downstream word operator (shingles, token counts, Gopher rules, BPE)
# silently saw zero-word documents. The fallback segmenter treats each
# no-space-script codepoint as its own token (the standard degradation used
# by large-scale corpus pipelines when no dictionary segmenter ships):
#   * Latin/digits: unchanged — lowercased, non-alnum runs → one space.
#   * CJK ideographs (U+3400-4DBF ext-A, U+4E00-9FFF), Hiragana/Katakana
#     (U+3040-30FF), Thai (U+0E00-0E7F): kept, one token per codepoint.
#   * Hangul is NOT in the list: Korean text uses spaces.
# Both engines see the same literal codepoint ranges (Java regex ∩ RE2),
# so the Spark builder and the DuckDB twin stay bit-identical; pure-ASCII
# text takes the exact same path as before (the extra pass is a no-op).

_NOSPACE_RANGES = "㐀-䶿一-鿿぀-ヿ฀-๿"
NORM_RE = f"[^a-z0-9{_NOSPACE_RANGES}]+"
_NOSPACE_CHAR = f"([{_NOSPACE_RANGES}])"


def norm_text(col: str | Column = "text") -> Column:
    c = col if isinstance(col, Column) else F.col(col)
    spaced = F.regexp_replace(F.lower(c), _NOSPACE_CHAR, " $1 ")
    return F.trim(F.regexp_replace(spaced, NORM_RE, " "))


def norm_text_duck(col: str = "text") -> str:
    spaced = f"regexp_replace(lower({col}), '{_NOSPACE_CHAR}', ' \\1 ', 'g')"
    return f"trim(regexp_replace({spaced}, '{NORM_RE}', ' ', 'g'))"


def words(col: str = "text") -> Column:
    return F.split(norm_text(col), " ")


def words_duck(col: str = "text") -> str:
    return f"string_split({norm_text_duck(col)}, ' ')"


# --- word k-shingles ----------------------------------------------------------
# k consecutive words joined by ' '; fewer than k words → single shingle of all
# words (degenerate but non-empty, keeps downstream set ops total).
#
# CJK bigram merge (r7): per-codepoint tokens make shingle units LOW-ENTROPY
# for no-space scripts — shingling characters is like shingling English
# letters, so unrelated CJK docs share far too many shingles and LSH
# precision collapses (ADVICE r6 #6; codepoint bigrams are the standard
# practice for Chinese dedup). Before shingling, runs of no-space-script
# codepoints merge into OVERLAPPING BIGRAMS (run "abcd" → ab bc cd; a lone
# codepoint stays itself); space-script words and `words()`-based counts
# are untouched. Both engine twins apply the identical merge.

# no-space-script membership as INTEGER codepoint compares on the first
# char (these tokens are single codepoints by construction) — regex
# probes here tripled the hot dedup keys' wall time; ascii()/ord() stay
# in codegen / vectorized C
_NS_CP = ((0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0x3040, 0x30FF),
          (0x0E00, 0x0E7F))


def _ns_pred(expr: str, fn: str) -> str:
    """(`fn`(expr) falls in a no-space range) as a boolean SQL expr;
    NULL stays NULL (out-of-bounds probes), matching both engines."""
    cp = f"{fn}({expr})"
    ors = " OR ".join(f"({cp} >= {lo} AND {cp} <= {hi})"
                      for lo, hi in _NS_CP)
    return f"({ors})"


def shingle_tokens(words_col: str) -> str:
    """Spark SQL sub-expression: `words_col` with runs of no-space-script
    codepoint tokens merged into overlapping bigrams. try_element_at is
    1-based and NULL out of bounds (ANSI-safe), mirroring DuckDB list
    indexing."""
    w = words_col

    def ns(idx: str) -> str:
        return _ns_pred(f"try_element_at({w}, {idx})", "ascii")

    return (
        f"filter(transform(sequence(1, size({w})), i -> "
        f"CASE WHEN NOT {ns('i')} "
        f"THEN try_element_at({w}, i) "
        f"WHEN {ns('i + 1')} "
        f"THEN concat(try_element_at({w}, i), try_element_at({w}, i + 1)) "
        f"WHEN i > 1 AND {ns('i - 1')} "
        f"THEN CAST(NULL AS STRING) ELSE try_element_at({w}, i) END), "
        f"x -> x IS NOT NULL)"
    )


def shingle_tokens_duck(words_sql: str) -> str:
    w = words_sql

    def ns(idx: str) -> str:
        return _ns_pred(f"{w}[{idx}]", "ord")

    return (
        f"list_filter(list_transform(range(1, len({w}) + 1), i -> "
        f"CASE WHEN NOT {ns('i')} "
        f"THEN {w}[i] "
        f"WHEN {ns('i + 1')} "
        f"THEN concat({w}[i], {w}[i + 1]) "
        f"WHEN i > 1 AND {ns('i - 1')} "
        f"THEN NULL ELSE {w}[i] END), x -> x IS NOT NULL)"
    )


def word_shingles(words_col: str, k: int = 3,
                  premerged: bool = False) -> Column:
    """k-shingles over the bigram-merged token array. The shingle
    expression references its input THREE times (sequence bound, slice,
    size), so hot callers should materialize :func:`shingle_tokens` as
    its own projection column first and pass ``premerged=True`` — the
    merge then runs once per row instead of three times (measured 5.7x
    on q_dedup_minhash_lsh at sf0.1 before this split)."""
    s = words_col if premerged else shingle_tokens(words_col)
    return F.expr(
        f"transform(sequence(1, greatest(size({s}) - {k - 1}, 1)), "
        f"i -> concat_ws(' ', slice({s}, i, {k})))"
    )


def word_shingles_duck(words_sql: str, k: int = 3,
                       premerged: bool = False) -> str:
    s = words_sql if premerged else shingle_tokens_duck(words_sql)
    return (
        f"list_transform(range(1, greatest(len({s}) - {k - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({s}, i, i + {k - 1}), ' '))"
    )


# --- token counting -----------------------------------------------------------
# whitespace tokens + a BPE-ish pre-tokenizer (letter runs | single digits |
# single punctuation), the shape GPT-2-style tokenizers use before merges.

BPE_RE = "[a-z]+|[0-9]|[^a-z0-9 ]"


def ws_token_count(col: str = "text") -> Column:
    return F.regexp_count(F.col(col), F.lit(r"\S+")).cast("long")


def ws_token_count_duck(col: str = "text") -> str:
    return f"CAST(len(regexp_extract_all({col}, '\\S+')) AS BIGINT)"


def bpe_token_count(col: str = "text") -> Column:
    return F.regexp_count(F.lower(F.col(col)), F.lit(BPE_RE)).cast("long")


def bpe_token_count_duck(col: str = "text") -> str:
    return f"CAST(len(regexp_extract_all(lower({col}), '{BPE_RE}')) AS BIGINT)"


# --- quality metrics ----------------------------------------------------------

STOPWORDS_EN = ["the", "and", "of", "to", "in", "a", "is", "that", "it", "for"]


def _count_re(col: Column, pattern: str) -> Column:
    return F.regexp_count(col, F.lit(pattern)).cast("long")


def quality_columns(col: str = "text") -> dict[str, Column]:
    """length / alpha / punct / stopword ratios + a fixed-weight quality score.

    All ratios are double divisions of exact integer counts computed in the
    same operation order as the DuckDB twin → bit-identical results.
    """
    t = F.col(col)
    n_chars = F.length(t).cast("long")
    alpha = _count_re(t, "[a-zA-Z]")
    digit = _count_re(t, "[0-9]")
    space = _count_re(t, r"\s")
    punct = n_chars - alpha - digit - space
    n_words = _count_re(t, r"\S+")
    stop = _count_re(F.lower(t), r"\b(" + "|".join(STOPWORDS_EN) + r")\b")
    alpha_ratio = alpha.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    punct_ratio = punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    stop_ratio = stop.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    mean_word_len = alpha.cast("double") / F.greatest(n_words, F.lit(1)).cast("double")
    score = (
        F.least(n_chars.cast("double") / F.lit(500.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(stop_ratio * F.lit(4.0), F.lit(1.0)) * F.lit(0.3)
        + alpha_ratio * F.lit(0.3)
    )
    return {
        "n_chars": n_chars, "n_words": n_words.cast("long"),
        "alpha_ratio": alpha_ratio, "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio, "mean_word_len": mean_word_len,
        "quality_score": score,
    }


def quality_columns_duck(col: str = "text") -> dict[str, str]:
    n_chars = f"CAST(length({col}) AS BIGINT)"
    alpha = f"CAST(len(regexp_extract_all({col}, '[a-zA-Z]')) AS BIGINT)"
    digit = f"CAST(len(regexp_extract_all({col}, '[0-9]')) AS BIGINT)"
    space = f"CAST(len(regexp_extract_all({col}, '\\s')) AS BIGINT)"
    n_words = f"CAST(len(regexp_extract_all({col}, '\\S+')) AS BIGINT)"
    stop = (f"CAST(len(regexp_extract_all(lower({col}), "
            f"'\\b({'|'.join(STOPWORDS_EN)})\\b')) AS BIGINT)")
    punct = f"({n_chars} - {alpha} - {digit} - {space})"
    alpha_ratio = f"(CAST({alpha} AS DOUBLE) / CAST(greatest({n_chars}, 1) AS DOUBLE))"
    punct_ratio = f"(CAST({punct} AS DOUBLE) / CAST(greatest({n_chars}, 1) AS DOUBLE))"
    stop_ratio = f"(CAST({stop} AS DOUBLE) / CAST(greatest({n_words}, 1) AS DOUBLE))"
    mean_word_len = f"(CAST({alpha} AS DOUBLE) / CAST(greatest({n_words}, 1) AS DOUBLE))"
    score = (f"(least(CAST({n_chars} AS DOUBLE) / 500.0, 1.0) * 0.4"
             f" + least({stop_ratio} * 4.0, 1.0) * 0.3"
             f" + {alpha_ratio} * 0.3)")
    return {
        "n_chars": n_chars, "n_words": n_words,
        "alpha_ratio": alpha_ratio, "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio, "mean_word_len": mean_word_len,
        "quality_score": score,
    }


# --- language ID (n-gram/stopword heuristic) -----------------------------------

LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|in|is|that|it)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein)\b",
    "fr": r"\b(le|les|et|est|une|dans|pour|que)\b",
    "es": r"\b(el|los|y|es|un|una|como|por)\b",
}
CJK_RE = r"[\x{4e00}-\x{9fff}]"
LANG_ORDER = ["en", "de", "fr", "es", "zh"]  # deterministic tie-break priority


def lang_hit_columns(col: str = "text") -> dict[str, Column]:
    low = F.lower(F.col(col))
    hits = {f"{lang}_hits": _count_re(low, pat) for lang, pat in LANG_MARKERS.items()}
    hits["zh_hits"] = _count_re(F.col(col), CJK_RE)
    return hits


def lang_hit_columns_duck(col: str = "text") -> dict[str, str]:
    out = {f"{lang}_hits": f"CAST(len(regexp_extract_all(lower({col}), '{pat}')) AS BIGINT)"
           for lang, pat in LANG_MARKERS.items()}
    out["zh_hits"] = f"CAST(len(regexp_extract_all({col}, '{CJK_RE}')) AS BIGINT)"
    return out


def pred_lang(hits: dict[str, Column]) -> Column:
    """argmax over language hit counts, first-listed wins ties; all-zero → 'und'."""
    best = F.greatest(*[hits[f"{l}_hits"] for l in LANG_ORDER])
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when((best > 0) & (hits[f"{lang}_hits"] == best), lang).otherwise(expr)
    return expr


def pred_lang_duck(hits: dict[str, str]) -> str:
    best = "greatest(" + ", ".join(hits[f"{l}_hits"] for l in LANG_ORDER) + ")"
    whens = "".join(
        f" WHEN {best} > 0 AND {hits[f'{lang}_hits']} = {best} THEN '{lang}'"
        for lang in LANG_ORDER
    )
    return f"CASE{whens} ELSE 'und' END"


# --- document fingerprinting ----------------------------------------------------
# fp_md5: hash of the normalized text (exact-dup key).
# fp_minshingle: min MD5 over rolling char 8-grams of the normalized text — a
# winnowing-style rolling-hash fingerprint (global-min variant) robust to
# local edits.

FP_K = 8


def fingerprint_columns(norm_col: str) -> dict[str, Column]:
    """Fingerprints over an ALREADY-normalized text column.

    Callers must project :func:`norm_text` into ``norm_col`` first — binding
    the normalization to an attribute guarantees the regex pass runs once per
    row; inlining it into the shingle lambda would re-run it once per shingle
    (one full-document regex scan per character position).
    """
    n = F.col(norm_col)
    return {
        "fp_md5": F.md5(n),
        "fp_minshingle": F.array_min(
            F.transform(
                F.transform(
                    F.sequence(F.lit(1), F.greatest(F.length(n) - (FP_K - 1), F.lit(1))),
                    lambda i: n.substr(i, F.lit(FP_K)),
                ),
                F.md5,
            )
        ),
    }


def fingerprint_columns_duck(col: str = "text") -> dict[str, str]:
    norm = norm_text_duck(col)
    return {
        "fp_md5": f"md5({norm})",
        "fp_minshingle": (
            f"list_aggregate(list_transform("
            f"range(1, greatest(length({norm}) - {FP_K - 1}, 1) + 1), "
            f"i -> md5({norm}[i:i+{FP_K - 1}])), 'min')"
        ),
    }
