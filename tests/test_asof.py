"""Unit tests for the generic union-merge as-of join operator."""

from __future__ import annotations

import datetime as dt

from flink_job_spark.operators.asof import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_semantics(spark):
    right = spark.createDataFrame(
        [(1, _ts("2026-01-01T10:00:00"), 100.0),
         (1, _ts("2026-01-01T12:00:00"), 200.0),
         (2, _ts("2026-01-01T11:00:00"), 300.0)],
        "k int, ts timestamp_ntz, px double")
    left = spark.createDataFrame(
        [(1, _ts("2026-01-01T09:00:00"), "before-any"),
         (1, _ts("2026-01-01T10:00:00"), "same-instant"),
         (1, _ts("2026-01-01T11:30:00"), "between"),
         (1, _ts("2026-01-01T23:00:00"), "after-all"),
         (2, _ts("2026-01-01T11:00:01"), "other-key"),
         (3, _ts("2026-01-01T11:00:00"), "no-right-rows")],
        "k int, ts timestamp_ntz, label string")

    out = {r["label"]: r for r in
           asof_join(left, right, key="k", right_payload=["px"]).collect()}

    assert out["before-any"]["asof_px"] is None          # nothing at/before
    assert out["same-instant"]["asof_px"] == 100.0       # ts == right ts matches
    assert out["between"]["asof_px"] == 100.0            # latest ≤, not nearest
    assert out["after-all"]["asof_px"] == 200.0
    assert out["other-key"]["asof_px"] == 300.0          # keys never cross
    assert out["no-right-rows"]["asof_px"] is None
    assert out["between"]["asof_ts"] == _ts("2026-01-01T10:00:00")


def test_asof_preserves_left_rowcount(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_job_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view")
    errors = (e.filter(F.col("event_type") == "error")
               .groupBy("user_id", "ts").agg(F.max("event_id").alias("err_id")))
    out = asof_join(views, errors, key="user_id", right_payload=["err_id"])
    assert out.count() == views.count()  # left join: no row loss, no fanout


def test_asof_null_payload_in_latest_row_is_kept(spark):
    """The matched right row is atomic: a NULL payload column in the as-of
    row must come through as NULL, never backfilled from an older row
    (per-column carry would emit a chimera of several right rows)."""
    import datetime as dt

    from flink_job_spark.operators.asof import asof_join

    t = dt.datetime
    right = spark.createDataFrame(
        [(1, t(2024, 1, 1, 0, 1), 5.0, "a"),
         (1, t(2024, 1, 1, 0, 2), None, "b")],
        "k long, ts timestamp, x double, y string")
    left = spark.createDataFrame(
        [(1, t(2024, 1, 1, 0, 3))], "k long, ts timestamp")
    row = asof_join(left, right, key="k").collect()[0]
    assert row["asof_ts"] == t(2024, 1, 1, 0, 2)
    assert row["asof_x"] is None        # NOT 5.0 from the older row
    assert row["asof_y"] == "b"
