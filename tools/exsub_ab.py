"""ExactSubstr span-dedup scale A/B evidence (round-5 wave-11).

q_exact_substr claims (a) linear scaling in corpus words (the sliding-window
hash shuffle is the cost) and (b) the property that justifies its existence
next to q_block_dedup: it catches duplicated runs at ANY alignment, where
the non-overlapping block grid only fires when a copied run happens to
contain a whole aligned block. This harness measures both instead of
asserting them.

Synthetic corpus (parquet, like dedup_ab.py): N docs x 40 words from a
replica-prefixed vocabulary (cross-doc window collisions impossible except
where planted). Every doc with id % 10 == 1 copies a PLANT_LEN=20-word run
from doc id-1 into a deterministic md5-derived offset — so exactly
PLANT_LEN - K + 1 = 5 sliding windows per planted doc are duplicates,
merging into ONE span of exactly 20 covered words (the surrounding words
are unique, so boundary windows never match). Per scale, against the
SHIPPED operator (queries.prep.exact_substr_spans, imported not
reimplemented):

- wall-clock + linearity across 30k / 100k / 300k docs;
- planted recall: fraction of planted docs reported with >= 1 span;
- span sharpness: planted docs whose n_dup_words == 20 exactly (the
  interval-merge correctness check at scale, not just at sf0.01);
- block-grid comparison: how many planted docs q_block_dedup's aligned
  16-word grid detects at all (the any-alignment gap, measured).

Usage:  python tools/exsub_ab.py        # one JSON line per scale
Env:    EXSUB_AB_SIZES=30000,100000,300000  EXSUB_AB_DIR=/tmp/exsub_ab
Results recorded in BASELINE.md ("ExactSubstr A/B evidence"). Run in
isolation.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from flink_job_spark.queries.prep import (  # noqa: E402
    BLOCK_WORDS,
    EXSUB_K,
    _doc_block_hashes,
    exact_substr_spans,
)
from flink_job_spark.session import get_spark, unpersist_all  # noqa: E402

DOC_WORDS = 40
PLANT_LEN = 20
PLANT_MOD = 10  # doc_id % 10 == 1 copies from doc_id - 1


def build_corpus(spark, n_docs: int, path: str) -> None:
    """Deterministic synthetic corpus with planted copied runs, written
    once to parquet (generation cost stays out of the measured decode)."""

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids, texts = [], []
            for d in pdf["id"]:
                d = int(d)
                words = [f"w{d}x{j}" for j in range(DOC_WORDS)]
                if d % PLANT_MOD == 1:
                    src = [f"w{d - 1}x{j}" for j in range(DOC_WORDS)]
                    s_off = int(hashlib.md5(f"s{d}".encode()).hexdigest()[:4],
                                16) % (DOC_WORDS - PLANT_LEN)
                    d_off = int(hashlib.md5(f"d{d}".encode()).hexdigest()[:4],
                                16) % (DOC_WORDS - PLANT_LEN)
                    words[d_off:d_off + PLANT_LEN] = \
                        src[s_off:s_off + PLANT_LEN]
                ids.append(d)
                texts.append(" ".join(words))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    (spark.range(n_docs).repartition(32)
          .mapInPandas(gen, schema="doc_id long, text string")
          .write.mode("overwrite").parquet(path))


def main() -> None:
    sizes = [int(s) for s in os.environ.get(
        "EXSUB_AB_SIZES", "30000,100000,300000").split(",")]
    base = os.environ.get("EXSUB_AB_DIR", "/tmp/exsub_ab")
    spark = get_spark("exsub_ab")
    for n in sizes:
        path = f"{base}/docs_{n}"
        build_corpus(spark, n, path)
        d = spark.read.parquet(path)
        planted = sum(1 for i in range(n) if i % PLANT_MOD == 1)

        t0 = time.time()
        res = exact_substr_spans(d).persist()
        agg = res.agg(
            F.sum("n_windows").alias("windows"),
            F.sum((F.col("n_spans") > 0).cast("int")).alias("docs_with_span"),
            F.sum(((F.col("doc_id") % PLANT_MOD == 1)
                   & (F.col("n_spans") > 0)).cast("int")).alias("recalled"),
            F.sum(((F.col("doc_id") % PLANT_MOD == 1)
                   & (F.col("n_dup_words") == PLANT_LEN)).cast("int"))
             .alias("sharp"),
        ).collect()[0]
        wall = round(time.time() - t0, 2)
        res.unpersist()

        # block-grid comparison: planted docs the aligned grid detects
        t1 = time.time()
        b = _doc_block_hashes(d)
        first = F.min("doc_id").over(Window.partitionBy("block_hash"))
        blk = (b.withColumn("first_doc", first)
                .filter(F.col("first_doc") < F.col("doc_id"))
                .filter(F.col("doc_id") % PLANT_MOD == 1)
                .select("doc_id").distinct().count())
        blk_wall = round(time.time() - t1, 2)

        print(json.dumps({
            "n_docs": n, "planted": planted,
            "exsub_wall_s": wall,
            "windows": int(agg["windows"]),
            "docs_with_span": int(agg["docs_with_span"]),
            "planted_recall": round(int(agg["recalled"]) / planted, 4),
            "span_exact_20w": round(int(agg["sharp"]) / planted, 4),
            "block_grid_detected": blk,
            "block_grid_recall": round(blk / planted, 4),
            "block_wall_s": blk_wall,
            "k": EXSUB_K, "block_words": BLOCK_WORDS,
        }), flush=True)
        unpersist_all(spark)
    spark.stop()


if __name__ == "__main__":
    main()
