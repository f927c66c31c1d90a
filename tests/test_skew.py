"""Salting utilities: equivalence with the unsalted plan + shape checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_job_spark.operators.skew import salted_agg, salted_broadcast_left
from flink_job_spark.sources.tables import load_table


def test_salted_agg_matches_plain_groupby(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = (li.groupBy("l_returnflag")
               .agg(F.count(F.lit(1)).alias("n"),
                    F.sum("l_quantity").alias("qty"))
               .orderBy("l_returnflag").collect())
    salted = (salted_agg(
                  li, ["l_returnflag"], tiebreak_col="l_orderkey",
                  aggs={"n": F.count(F.lit(1)), "qty": F.sum("l_quantity")},
                  n_salts=8)
              .orderBy("l_returnflag").collect())
    assert [r["l_returnflag"] for r in plain] == [r["l_returnflag"] for r in salted]
    assert [r["n"] for r in plain] == [r["n"] for r in salted]
    for p, s in zip(plain, salted):
        assert abs(p["qty"] - s["qty"]) < 1e-6 * max(1.0, abs(p["qty"]))


def test_salted_broadcast_left_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    plain = orders.join(cust, "o_custkey")
    salted = salted_broadcast_left(orders, cust, "o_custkey",
                                   tiebreak_col="o_orderkey", n_salts=4)
    assert salted.count() == plain.count()
    assert sorted(salted.columns) == sorted(plain.columns)
    # spot-check value agreement on one key
    k = plain.select("o_custkey").first()["o_custkey"]
    a = sorted(map(tuple, plain.filter(F.col("o_custkey") == k).collect()))
    b = sorted(map(tuple, salted.filter(F.col("o_custkey") == k).collect()))
    assert a == b


def test_salted_broadcast_plan_has_no_big_side_shuffle(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    salted = salted_broadcast_left(orders, cust, "o_custkey",
                                   tiebreak_col="o_orderkey", n_salts=4)
    jvm = salted.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = salted._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in p, p
    assert "Exchange hashpartitioning" not in p, f"big side shuffled:\n{p}"


def test_hot_key_split_join_matches_plain_join(spark, sf_dir):
    """Split join == plain join, row for row, on a fact whose key list
    includes hot keys, cold keys, and keys absent from the dim."""
    from flink_job_spark.operators.skew import hot_key_split_join

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dim = e.select("event_type").distinct().withColumn(
        "w", F.length("event_type"))
    plain = e.join(dim, "event_type")
    split = hot_key_split_join(e, dim, "event_type", ["click", "view"])
    assert split.count() == plain.count()
    assert sorted(split.columns) == sorted(plain.columns)
    a = plain.agg(F.expr("bit_xor(xxhash64(event_type, event_id, w))")).first()[0]
    b = split.agg(F.expr("bit_xor(xxhash64(event_type, event_id, w))")).first()[0]
    assert a == b


def test_hot_key_split_join_hot_slice_broadcasts(spark, sf_dir):
    """Plan pin: the hot slice must join via BroadcastHashJoin (no shuffle
    of the hot fact rows) while the cold slice keeps its shuffle join."""
    from flink_job_spark.operators.skew import hot_key_split_join

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dim = e.select("event_type").distinct().withColumn(
        "w", F.length("event_type"))
    split = hot_key_split_join(e, dim, "event_type", ["click"])
    jvm = split.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    p = split._jdf.queryExecution().explainString(mode)
    assert "BroadcastHashJoin" in p, f"hot slice not broadcast:\n{p}"
    assert "SortMergeJoin" in p or "ShuffledHashJoin" in p or \
        p.count("BroadcastHashJoin") >= 2, p


def test_hot_key_split_join_null_keys_match_plain_join(spark):
    """NULL-keyed rows route to the cold slice and get the engine's own
    inner-join NULL semantics (dropped) — identical to a plain join, and
    no silent double-drop if the helper grows outer-join support."""
    from flink_job_spark.operators.skew import hot_key_split_join

    big = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 3), ("b", 4), (None, 5)], "k string, v int")
    other = spark.createDataFrame(
        [("a", 10), ("b", 20), (None, 30)], "k string, w int")
    plain = sorted(map(tuple, big.join(other, "k").collect()))
    split = sorted(map(tuple,
                       hot_key_split_join(big, other, "k", ["a"]).collect()))
    assert split == plain
    assert len(split) == 3  # non-vacuous: a x2, b x1; NULLs dropped
