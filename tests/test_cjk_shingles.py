"""CJK bigram shingling (r7): no-space-script runs merge into overlapping
codepoint bigrams before word-shingling, so LSH units regain entropy —
per-codepoint units made unrelated CJK docs look similar (ADVICE r6 #6)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from flink_job_spark.functions.text import (
    shingle_tokens,
    word_shingles,
    words,
)

# a compressed model of Zipfian hanzi reuse (the top ~10 function
# characters cover ~25% of real Chinese text): few distinct codepoints,
# heavy repetition — the regime where per-codepoint shingle units
# collide across unrelated documents
_HANZI = "的一是在不了有和"


def _jaccard(spark, a: str, b: str, shingler) -> float:
    df = spark.createDataFrame([(0, a), (1, b)], "doc_id long, text string")
    sh = (df.select("doc_id", words("text").alias("ws"))
            .select("doc_id",
                    F.explode(F.array_distinct(shingler("ws"))).alias("s")))
    rows = sh.collect()
    sa = {r["s"] for r in rows if r["doc_id"] == 0}
    sb = {r["s"] for r in rows if r["doc_id"] == 1}
    return len(sa & sb) / len(sa | sb)


def _unigram_shingles(ws, k: int = 3):
    """The pre-r7 shingler: k consecutive tokens, NO bigram merge."""
    return F.expr(
        f"transform(sequence(1, greatest(size({ws}) - {k - 1}, 1)), "
        f"i -> concat_ws(' ', slice({ws}, i, {k})))")


def _bigram_shingles(ws, k: int = 3):
    return word_shingles(ws, k)


def test_cjk_bigram_shingles_improve_lsh_precision(spark):
    """UNRELATED docs drawn from the same small hanzi vocabulary must
    look much less similar under bigram-merged shingles than under the
    old per-codepoint units, while a TRUE near-dup pair stays clearly
    above any LSH threshold — precision improves, recall holds."""
    rnd = random.Random(42)
    a = "".join(rnd.choice(_HANZI) for _ in range(400))
    b = "".join(rnd.choice(_HANZI) for _ in range(400))    # unrelated
    # true near-dup: a with 8 scattered substitutions
    chars = list(a)
    for pos in rnd.sample(range(len(chars)), 8):
        chars[pos] = rnd.choice(_HANZI)
    a_dup = "".join(chars)

    j_unrelated_old = _jaccard(spark, a, b, _unigram_shingles)
    j_unrelated_new = _jaccard(spark, a, b, _bigram_shingles)
    j_dup_new = _jaccard(spark, a, a_dup, _bigram_shingles)

    # the r6 problem, reproduced: per-codepoint units inflate similarity
    assert j_unrelated_old > 0.25, j_unrelated_old
    # the fix: bigram units push unrelated docs well below LSH range
    assert j_unrelated_new < j_unrelated_old / 2, (j_unrelated_new,
                                                   j_unrelated_old)
    # recall holds: true near-dups stay high
    assert j_dup_new > 0.5, j_dup_new


def test_shingle_tokens_merge_rules(spark):
    """The merge is exactly: no-space runs → overlapping bigrams, lone
    codepoints stay, space-script words untouched, mixed text stable."""
    cases = [
        ("abc def", ["abc", "def"]),
        ("中文字", ["中文", "文字"]),
        ("中", ["中"]),
        ("x 中 y", ["x", "中", "y"]),
        ("hi 中文 yo", ["hi", "中文", "yo"]),
        ("日本語のテキスト", ["日本", "本語", "語の", "のテ", "テキ",
                              "キス", "スト"]),
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string")
    got = (df.select(words("text").alias("ws"))
             .select(F.expr(shingle_tokens("ws")).alias("t")).collect())
    for (txt, want), row in zip(cases, got):
        assert list(row["t"]) == want, (txt, list(row["t"]), want)
