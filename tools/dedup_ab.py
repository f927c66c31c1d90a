"""MinHash-LSH dedup scale A/B evidence (VERDICT r3 item 1, dedup half).

q_dedup_minhash_lsh is the LLM-pipeline headline operator; this harness
measures its scale claims instead of asserting them. A synthetic corpus
10-100x the bench documents table (sf0.1 has 3k docs; default scales 30k /
100k / 300k) is materialized to parquet with PLANTED near-duplicates: every
doc with id % 10 == 1 is a copy of id-1 with 2 of its 40 words replaced
(shingle Jaccard ~= 0.73, above the 0.5 verify threshold; planted recall at
the MinHash(8)/4-band setting is ~1-(1-J^2)^4 ~= 0.95 in expectation).

Per scale, against the SHIPPED pipeline (queries.dedup.minhash_lsh_pairs,
imported not reimplemented):

- **candidate count vs all-pairs**: the banded bucket join's candidate set
  vs n(n-1)/2 — the number that explains why LSH exists (all-pairs at 300k
  docs is 4.5e10 comparisons; nothing materializes that).
- **wall-clock + linearity**: full pipeline (shingle -> 8 minhash lanes ->
  4-band bucket join -> exact-Jaccard verify on candidates only).
- **recall vs planted pairs**: verified output ∩ planted (d-1, d) pairs.
- **exact inverted-index baseline** (the q_ngram_jaccard plan shape:
  capped-shingle self-join candidates -> exact verify) at the same scales:
  on THIS corpus (near-unique shingles) its candidate set is small and the
  honest result is that exact is competitive — the LSH win appears in the
  candidate-count column and on corpora with hot shingles, where the exact
  join's Sum(df^2) blows up (bounded only by the doc-freq cap; see
  tests/test_dedup_cap.py for that measured behavior).

Usage:  python tools/dedup_ab.py          # one JSON line per cell
Env:    DEDUP_AB_SIZES=30000,100000,300000  DEDUP_AB_DIR=/tmp/dedup_ab
Results recorded in BASELINE.md ("Dedup A/B evidence"). Run in isolation.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_job_spark.queries.dedup import (  # noqa: E402
    SHINGLE_MAX_DOC_FREQ,
    _verified_pairs,
    cap_shingles,
    doc_shingles,
    minhash_lsh_pairs,
)
from flink_job_spark.session import get_spark, unpersist_all  # noqa: E402

SIZES = [int(s) for s in os.environ.get(
    "DEDUP_AB_SIZES", "30000,100000,300000").split(",")]
N_WORDS = 40
VOCAB = 200_000
PERTURB = (3, 17)      # word positions replaced in planted near-dups


def materialize(spark, base: str) -> dict[int, str]:
    """Hash-derived words (never LCG — lattice trap); text is 40 words, and
    id % 10 == 1 docs copy id-1 with two words replaced."""
    paths = {}
    for n in SIZES:
        p = f"{base}/docs_{n}"
        paths[n] = p
        if os.path.exists(f"{p}/_SUCCESS"):
            continue
        perturbed = ", ".join(str(j) for j in PERTURB)
        word = (f"CASE WHEN id % 10 = 1 AND j IN ({perturbed}) "
                f"THEN concat('w', pmod(xxhash64(id * 64 + j + 1000000), {VOCAB})) "
                f"ELSE concat('w', pmod(xxhash64((id - CASE WHEN id % 10 = 1 "
                f"THEN 1 ELSE 0 END) * 64 + j), {VOCAB})) END")
        (spark.range(n)
              .select(F.col("id").alias("doc_id"),
                      F.expr(f"array_join(transform(sequence(0, {N_WORDS - 1}), "
                             f"j -> {word}), ' ')").alias("text"))
              .write.mode("overwrite").parquet(p))
    return paths


def planted(spark, n):
    return (spark.range(n).filter("id % 10 = 1")
            .select((F.col("id") - 1).alias("d1"), F.col("id").alias("d2")))


ZIPF_N = int(os.environ.get("DEDUP_AB_ZIPF_N", "30000"))


def materialize_zipf(spark, base: str) -> str:
    """Hot-shingle corpus: word ids drawn u^4-skewed (the top word covers
    ~5% of ALL positions, so three-hot-word shingles repeat across a large
    share of the corpus). This is the distribution real text has and the
    one that blows up an inverted-index self-join's Sum(df^2) — the shape
    the doc-freq cap and LSH exist for."""
    p = f"{base}/docs_zipf_{ZIPF_N}"
    if os.path.exists(f"{p}/_SUCCESS"):
        return p
    u = (f"(CAST(pmod(xxhash64((id - CASE WHEN id % 10 = 1 THEN 1 ELSE 0 END)"
         f" * 64 + j), 1000003) AS DOUBLE) / 1000003.0)")
    word = (f"CASE WHEN id % 10 = 1 AND j IN (3, 17) "
            f"THEN concat('w', pmod(xxhash64(id * 64 + j + 1000000), {VOCAB})) "
            f"ELSE concat('w', CAST(floor(pow({u}, 4.0) * {VOCAB}) AS BIGINT)) "
            f"END")
    (spark.range(ZIPF_N)
          .select(F.col("id").alias("doc_id"),
                  F.expr(f"array_join(transform(sequence(0, {N_WORDS - 1}), "
                         f"j -> {word}), ' ')").alias("text"))
          .write.mode("overwrite").parquet(p))
    return p


BOILER_N = int(os.environ.get("DEDUP_AB_BOILER_N", "10000"))


def materialize_boiler(spark, base: str) -> str:
    """Boilerplate-phrase corpus: each doc is 13 three-word phrases drawn
    from a pool sized so each phrase appears in ~50 docs (df just UNDER the
    doc-freq cap). Phrase-aligned shingles then have df~50 each, so the
    exact inverted-index join materializes ~Sum(C(50,2)) candidate pairs —
    the blow-up shared headers/licence blocks cause on real corpora —
    while banded LSH emits 4 bucket rows per doc regardless."""
    p = f"{base}/docs_boiler_{BOILER_N}"
    if os.path.exists(f"{p}/_SUCCESS"):
        return p
    pool = max(100, 13 * BOILER_N // 50)
    phrase = (f"pmod(xxhash64((id - CASE WHEN id % 10 = 1 THEN 1 ELSE 0 END)"
              f" * 16 + CAST(j / 3 AS BIGINT)), {pool})")
    word = (f"CASE WHEN id % 10 = 1 AND j IN (3, 17) "
            f"THEN concat('w', pmod(xxhash64(id * 64 + j + 1000000), {VOCAB})) "
            f"ELSE concat('p', {phrase}, '_', pmod(j, 3)) END")
    n_words = 39           # 13 aligned phrases
    (spark.range(BOILER_N)
          .select(F.col("id").alias("doc_id"),
                  F.expr(f"array_join(transform(sequence(0, {n_words - 1}), "
                         f"j -> {word}), ' ')").alias("text"))
          .write.mode("overwrite").parquet(p))
    return p


def main() -> None:
    spark = get_spark("dedup-ab",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    base = os.environ.get("DEDUP_AB_DIR", "/tmp/dedup_ab")
    os.makedirs(base, exist_ok=True)
    paths = materialize(spark, base)

    for n in SIZES:
        docs = spark.read.parquet(paths[n])
        want = planted(spark, n)
        n_planted = want.count()

        # LSH pipeline: time the verified-pairs action, then count the
        # candidate frame (a second action over the same lazily-shared plan)
        unpersist_all(spark)
        stats: dict = {}
        t0 = time.perf_counter()
        verified = minhash_lsh_pairs(docs, stats=stats).persist()
        n_verified = verified.count()
        t_lsh = round(time.perf_counter() - t0, 2)
        n_cand = stats["candidates"].count()
        hit = verified.join(want, ["d1", "d2"]).count()
        all_pairs = n * (n - 1) // 2
        print(json.dumps({
            "variant": f"lsh_{n}", "sec": t_lsh, "n_docs": n,
            "candidates": n_cand, "all_pairs": all_pairs,
            "candidate_reduction": round(all_pairs / max(1, n_cand)),
            "verified_pairs": n_verified, "planted": n_planted,
            "planted_recall": round(hit / max(1, n_planted), 4),
        }), flush=True)
        verified.unpersist()

        # exact inverted-index baseline (q_ngram_jaccard plan shape)
        unpersist_all(spark)
        t0 = time.perf_counter()
        sh = doc_shingles(docs).persist()
        shc = cap_shingles(sh, SHINGLE_MAX_DOC_FREQ)
        a = shc.select(F.col("doc_id").alias("d1"), "s")
        b = shc.select(F.col("doc_id").alias("d2"), "s")
        cand = (a.join(b, "s").filter(F.col("d1") < F.col("d2"))
                 .select("d1", "d2").distinct())
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
        ex = _verified_pairs(cand, sh, sizes).persist()
        n_exact = ex.count()
        t_exact = round(time.perf_counter() - t0, 2)
        hit_e = ex.join(want, ["d1", "d2"]).count()
        n_cand_e = cand.count()
        print(json.dumps({
            "variant": f"exact_invindex_{n}", "sec": t_exact, "n_docs": n,
            "candidates": n_cand_e, "verified_pairs": n_exact,
            "planted_recall": round(hit_e / max(1, n_planted), 4),
        }), flush=True)
        ex.unpersist()

    # Hot-shingle corpora: where candidate generation strategy matters.
    # zipf: a few SUPER-hot shingles — the doc-freq cap defuses both plans.
    # boilerplate: many MID-frequency phrase shingles (df just under the
    # cap) — the exact join's Sum(df^2) explodes while LSH's 4 bucket rows
    # per doc stay bounded. This is the real-corpus shape (shared phrases,
    # headers, licence blocks) that makes banded LSH the scale path.
    for corpus, path in [("zipf", materialize_zipf(spark, base)),
                         ("boiler", materialize_boiler(spark, base))]:
        run_hot_cell(spark, corpus, path)

    spark.stop()


def run_hot_cell(spark, corpus: str, path: str) -> None:
    docs = spark.read.parquet(path)
    n = docs.count()
    want = planted(spark, n)
    n_planted = want.count()
    for variant in ("lsh", "exact_invindex"):
        unpersist_all(spark)
        t0 = time.perf_counter()
        if variant == "lsh":
            stats = {}
            out = minhash_lsh_pairs(docs, stats=stats).persist()
            n_out = out.count()
            n_cand = stats["candidates"].count()
        else:
            sh = doc_shingles(docs).persist()
            shc = cap_shingles(sh, SHINGLE_MAX_DOC_FREQ)
            a = shc.select(F.col("doc_id").alias("d1"), "s")
            b = shc.select(F.col("doc_id").alias("d2"), "s")
            cand = (a.join(b, "s").filter(F.col("d1") < F.col("d2"))
                     .select("d1", "d2").distinct())
            sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
            out = _verified_pairs(cand, sh, sizes).persist()
            n_out = out.count()
            n_cand = cand.count()
        dt = round(time.perf_counter() - t0, 2)
        hit = out.join(want, ["d1", "d2"]).count()
        out.unpersist()
        print(json.dumps({
            "variant": f"{corpus}_{variant}_{n}", "sec": dt,
            "n_docs": n, "candidates": n_cand, "verified_pairs": n_out,
            "planted_recall": round(hit / max(1, n_planted), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
