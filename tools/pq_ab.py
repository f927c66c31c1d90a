"""Product-quantization scan-format A/B evidence (round-5 wave-11).

q_ann_pq's 100 TB story is a STORAGE claim: encode once to PQ_M bytes per
vector, then answer queries by scanning the code column instead of the
float rows. This harness measures that claim instead of asserting it, on
synthetic corpora 20-80x the bench embeddings table, against the SHIPPED
building blocks (queries.similarity.pq_codebooks/pq_encode, imported not
reimplemented):

- **bytes on disk**: the float-vector parquet vs the code parquet the
  encode pass writes (parquet's own encodings included — the honest
  ratio, not the theoretical 32x).
- **scan wall**: ADC top-PQ_CANDIDATES over the code parquet vs exact
  brute-force L2 top-10 over the float parquet, same 5 queries, cold
  reads (spark.catalog.clearCache between passes).
- **recall@10 after exact rerank** vs the brute answer — the quality the
  two-stage shape actually ships.

Usage:  python tools/pq_ab.py          # one JSON line per scale
Env:    PQ_AB_SIZES=100000,400000  PQ_AB_DIR=/tmp/pq_ab
Results recorded in BASELINE.md ("PQ scan-format A/B"). Run in isolation.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_job_spark.queries.similarity import (  # noqa: E402
    PQ_CANDIDATES,
    PQ_M,
    PQ_SUBDIM,
    TOPK,
    pq_codebooks,
    pq_encode,
)
from flink_job_spark.session import get_spark, unpersist_all  # noqa: E402

DIM = PQ_M * PQ_SUBDIM
N_QUERIES = 25


def build_vectors(spark, n: int, path: str) -> None:
    """Hash-derived float vectors (deterministic, no rand())."""

    def gen(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].to_numpy()
            out = []
            for vid in ids:
                h = hashlib.md5(f"pqab{int(vid)}".encode()).digest()
                seed = int.from_bytes(h[:8], "big")
                rng = np.random.default_rng(seed)
                out.append(rng.standard_normal(DIM).astype("float32"))
            yield pd.DataFrame({"vec_id": ids,
                                "embedding": [v.tolist() for v in out]})

    (spark.range(n).repartition(32)
          .mapInPandas(gen, schema="vec_id long, embedding array<float>")
          .write.mode("overwrite").parquet(path))


def du_bytes(path: str) -> int:
    return int(subprocess.check_output(["du", "-sb", path]).split()[0])


def main() -> None:
    sizes = [int(s) for s in os.environ.get(
        "PQ_AB_SIZES", "100000,400000").split(",")]
    base = os.environ.get("PQ_AB_DIR", "/tmp/pq_ab")
    spark = get_spark("pq_ab")
    for n in sizes:
        fpath, cpath = f"{base}/float_{n}", f"{base}/codes_{n}"
        build_vectors(spark, n, fpath)

        e = (spark.read.parquet(fpath)
             .select("vec_id",
                     F.transform("embedding", lambda x: x.cast("double"))
                      .alias("v")))
        books = pq_codebooks(e)
        t0 = time.time()
        pq_encode(e, books).write.mode("overwrite").parquet(cpath)
        encode_wall = round(time.time() - t0, 2)

        qrows = sorted(e.filter(F.col("vec_id") < N_QUERIES)
                        .select("vec_id", "v").collect(),
                       key=lambda r: r["vec_id"])

        # exact brute-force L2 top-10 over the float parquet
        probe = spark.createDataFrame(
            [(int(r["vec_id"]), [float(x) for x in r["v"]]) for r in qrows],
            "qid bigint, qv array<double>")
        sq = F.zip_with("qv", "v", lambda x, y: (x - y) * (x - y))
        t0 = time.time()
        brute = (spark.read.parquet(fpath)
                 .select("vec_id",
                         F.transform("embedding",
                                     lambda x: x.cast("double")).alias("v"))
                 .crossJoin(F.broadcast(probe))
                 .filter(F.col("vec_id") != F.col("qid"))
                 .select("qid", "vec_id",
                         F.aggregate(sq, F.lit(0.0),
                                     lambda a, x: a + x).alias("l2")))
        w = Window.partitionBy("qid").orderBy(F.col("l2").asc(), "vec_id")
        exact = (brute.withColumn("rk", F.row_number().over(w))
                      .filter(F.col("rk") <= TOPK).collect())
        brute_wall = round(time.time() - t0, 2)
        unpersist_all(spark)

        # ADC scan over the code parquet only
        luts = []
        for r in qrows:
            qv = [float(x) for x in r["v"]]
            lut = []
            for m in range(PQ_M):
                row = []
                for _, cv in books[m]:
                    acc = 0.0
                    for i, bx in enumerate(cv):
                        d = qv[m * PQ_SUBDIM + i] - bx
                        acc = acc + d * d
                    row.append(acc)
                lut.append(row)
            luts.append((int(r["vec_id"]), lut))
        lut_df = spark.createDataFrame(
            luts, "qid bigint, lut array<array<double>>")
        d_arr = F.zip_with("lut", "codes", lambda l, c: F.element_at(l, c + 1))
        t0 = time.time()
        cand = (spark.read.parquet(cpath)
                .crossJoin(F.broadcast(lut_df))
                .filter(F.col("vec_id") != F.col("qid"))
                .select("qid", "vec_id",
                        F.aggregate(d_arr, F.lit(0.0),
                                    lambda a, x: a + x).alias("adc")))
        wc = Window.partitionBy("qid").orderBy(F.col("adc").asc(), "vec_id")
        cands = (cand.withColumn("rk", F.row_number().over(wc))
                     .filter(F.col("rk") <= PQ_CANDIDATES).collect())
        adc_wall = round(time.time() - t0, 2)
        unpersist_all(spark)

        # exact rerank of the candidates (tiny — driver-side here)
        vecs = {int(r["vec_id"]): [float(x) for x in r["v"]]
                for r in e.filter(F.col("vec_id").isin(
                    [int(c["vec_id"]) for c in cands]
                    + list(range(N_QUERIES)))).collect()}
        reranked: dict[int, list[int]] = {}
        for qid in range(N_QUERIES):
            qv = vecs[qid]
            scored = []
            for c in cands:
                if c["qid"] != qid:
                    continue
                v = vecs[int(c["vec_id"])]
                acc = 0.0
                for a, b in zip(qv, v):
                    acc += (a - b) * (a - b)
                scored.append((acc, int(c["vec_id"])))
            scored.sort()
            reranked[qid] = [vid for _, vid in scored[:TOPK]]

        truth: dict[int, set] = {}
        for r in exact:
            truth.setdefault(int(r["qid"]), set()).add(int(r["vec_id"]))
        recalls = [len(set(reranked[q]) & truth[q]) / len(truth[q])
                   for q in truth]

        # --- trained-books cell: per-subspace k-means on a 10k sample ---
        # (numpy Lloyd, deterministic first-16 init — the production path
        # the id-sample cell's recall decay points at; same pq_encode /
        # LUT / rerank plan, only the book VALUES change)
        import numpy as np

        sample = np.array(
            [r["v"] for r in e.filter(F.col("vec_id") < 10_000)
                             .select("v").collect()], dtype=np.float64)
        trained = []
        for m in range(PQ_M):
            sub = sample[:, m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
            cents = sub[:16].copy()
            for _ in range(10):
                d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
                lab = d2.argmin(1)
                for k in range(16):
                    pts = sub[lab == k]
                    if len(pts):
                        cents[k] = pts.mean(0)
            trained.append([(k, [float(x) for x in cents[k]])
                            for k in range(16)])
        pq_encode(e, trained).write.mode("overwrite") \
            .parquet(cpath + "_trained")
        tluts = []
        for r in qrows:
            qv = [float(x) for x in r["v"]]
            lut = []
            for m in range(PQ_M):
                row = []
                for _, cv in trained[m]:
                    acc = 0.0
                    for i, bx in enumerate(cv):
                        d = qv[m * PQ_SUBDIM + i] - bx
                        acc = acc + d * d
                    row.append(acc)
                lut.append(row)
            tluts.append((int(r["vec_id"]), lut))
        tlut_df = spark.createDataFrame(
            tluts, "qid bigint, lut array<array<double>>")
        tcand = (spark.read.parquet(cpath + "_trained")
                 .crossJoin(F.broadcast(tlut_df))
                 .filter(F.col("vec_id") != F.col("qid"))
                 .select("qid", "vec_id",
                         F.aggregate(d_arr, F.lit(0.0),
                                     lambda a, x: a + x).alias("adc")))
        tcands = (tcand.withColumn("rk", F.row_number().over(wc))
                       .filter(F.col("rk") <= PQ_CANDIDATES).collect())
        tvecs = {int(r["vec_id"]): [float(x) for x in r["v"]]
                 for r in e.filter(F.col("vec_id").isin(
                     [int(c["vec_id"]) for c in tcands]
                     + list(range(N_QUERIES)))).collect()}
        trecalls = []
        for qid in range(N_QUERIES):
            qv = tvecs[qid]
            scored = []
            for c in tcands:
                if c["qid"] != qid:
                    continue
                v = tvecs[int(c["vec_id"])]
                acc = 0.0
                for a, b in zip(qv, v):
                    acc += (a - b) * (a - b)
                scored.append((acc, int(c["vec_id"])))
            scored.sort()
            got = {vid for _, vid in scored[:TOPK]}
            trecalls.append(len(got & truth[qid]) / len(truth[qid]))
        unpersist_all(spark)

        fbytes, cbytes = du_bytes(fpath), du_bytes(cpath)
        print(json.dumps({
            "n_vectors": n, "dim": DIM,
            "float_bytes": fbytes, "code_bytes": cbytes,
            "bytes_ratio": round(fbytes / cbytes, 1),
            "encode_wall_s": encode_wall,
            "brute_scan_wall_s": brute_wall,
            "adc_scan_wall_s": adc_wall,
            "recall_at_10": round(sum(recalls) / len(recalls), 3),
            "trained_recall_at_10": round(sum(trecalls) / len(trecalls), 3),
        }), flush=True)
        unpersist_all(spark)
    spark.stop()


if __name__ == "__main__":
    main()
