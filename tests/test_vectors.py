"""Vector expression builders: the unrolled and fold forms must be
bit-identical (the documented contract that lets callers choose either)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_job_spark.functions.vectors import (
    as_double_array,
    dot,
    dot_fixed,
    norm,
    norm_fixed,
    sign_bucket,
)
from flink_job_spark.sources.tables import load_table


def test_dot_forms_bit_identical(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(64)
    v = e.select("vec_id", as_double_array("embedding").alias("v"))
    dim = len(v.first()["v"])
    rows = v.select(
        dot("v", "v").alias("fold"),
        dot_fixed("v", "v", dim).alias("unrolled"),
        norm("v").alias("nfold"),
        norm_fixed("v", dim).alias("nunrolled"),
    ).collect()
    for r in rows:
        assert r["fold"] == r["unrolled"]          # exact, not approx
        assert r["nfold"] == r["nunrolled"]


def test_sign_bucket_shape(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(16)
    v = e.select(as_double_array("embedding").alias("v"))
    rows = v.select(sign_bucket("v", 4, 0).alias("b")).collect()
    assert all(len(r["b"]) == 4 and set(r["b"]) <= {"0", "1"} for r in rows)


def test_cosine_self_is_one(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings").limit(16)
    v = e.select(as_double_array("embedding").alias("v"))
    rows = v.select((dot("v", "v") / (norm("v") * norm("v"))).alias("c")).collect()
    for r in rows:
        assert abs(r["c"] - 1.0) < 1e-12


def test_int8_quantization_error_bound(spark, sf_dir):
    """Symmetric int8 quantization: max reconstruction error <= amax/254 per
    vector (half a quantization step), and dequantized cosine within 1% of
    exact for the ANN query set."""
    import numpy as np

    from flink_job_spark.queries import all_queries

    rows = all_queries()["q_embedding_quantize"].fn(spark, sf_dir).collect()
    assert rows
    import duckdb
    con = duckdb.connect()
    vecs = {r[0]: np.array(r[1]) for r in con.execute(
        f"SELECT vec_id, CAST(embedding AS DOUBLE[]) FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')").fetchall()}
    for r in rows:
        v = vecs[r["vec_id"]]
        amax = np.abs(v).max()
        # max_abs_err is round()ed to 6 decimals — allow half that granularity
        assert r["max_abs_err"] <= amax / 254 + 5e-7
        if r["scale"] > 0:
            deq = np.array([int(x) for x in r["qv"].split(",")],
                           dtype=np.float64) / (127.0 / amax)
            exact = v
            cos = float(deq @ exact / (np.linalg.norm(deq) * np.linalg.norm(exact)))
            assert cos > 0.99, f"vec {r['vec_id']}: dequantized cosine {cos}"


def test_score_pairs_tiled_equals_untiled_all_pairs():
    """The two-axis tiling (ADVICE r4: bound scratch to chunk x chunk) must
    return exactly the same pair set and bit-identical raw scores as one
    untiled pass, including when n is not a multiple of the chunk and when
    chunk=1 (every tile boundary exercised)."""
    import numpy as np

    from flink_job_spark.queries.similarity import _score_pairs_tiled

    rng = np.random.default_rng(7)
    n, dim = 37, 16
    ids = np.sort(rng.choice(10_000, size=n, replace=False).astype(np.int64))
    vm = rng.standard_normal((n, dim))
    nm = np.sqrt((vm * vm).sum(axis=1))
    prefilter = 0.2

    def key_sorted(res):
        a, b, r = res
        order = np.lexsort((b, a))
        return a[order], b[order], r[order]

    ref = key_sorted(_score_pairs_tiled(ids, vm, nm, prefilter, chunk=n + 5))
    assert len(ref[0]) > 0            # the fixture actually produces pairs
    for chunk in (1, 5, 16, n):
        got = key_sorted(_score_pairs_tiled(ids, vm, nm, prefilter, chunk))
        assert np.array_equal(got[0], ref[0])
        assert np.array_equal(got[1], ref[1])
        assert np.array_equal(got[2], ref[2])   # bit-identical, not approx
