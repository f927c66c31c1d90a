"""Snapshot diff: hash-based change detection between two snapshot loads.

The reference stamps every ingested row with a canonical MD5 row hash
(mis:1598-1694) so two independent computations can be compared. The same
hash makes consecutive snapshots diffable WITHOUT comparing columns: join the
two loads on the business key and compare one 32-char hash per row —
ADDED / REMOVED / CHANGED falls out of a single full-outer equi-join.

Scale shape: one shuffle per side on the key (or zero if both loads were
written bucketed/clustered by it); the hash comparison is a constant-width
string equality regardless of table width. This is the batch CDC-lite a
snapshot-only source (like the reference's Firebird) supports: run it
between load N and N+1 to emit a change feed for downstream consumers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_job_spark.functions.hashing import row_hash_column

CHANGE_ADDED = "ADDED"
CHANGE_REMOVED = "REMOVED"
CHANGE_CHANGED = "CHANGED"


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    hash_old: Column | None = None,
    hash_new: Column | None = None,
) -> DataFrame:
    """(key_cols..., change_type) for every row that differs between loads.

    Hashes default to the canonical row hash over each side's full column
    set; pass explicit Columns to diff a projection. Unchanged rows are
    filtered before anything leaves the join, so the output is change-volume
    sized, not table sized."""
    ho = hash_old if hash_old is not None else row_hash_column(old)
    hn = hash_new if hash_new is not None else row_hash_column(new)
    o = old.select(*key_cols, ho.alias("__h_old"))
    n = new.select(*key_cols, hn.alias("__h_new"))
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("__h_old").isNull(), F.lit(CHANGE_ADDED))
         .when(F.col("__h_new").isNull(), F.lit(CHANGE_REMOVED))
         .when(F.col("__h_old") != F.col("__h_new"), F.lit(CHANGE_CHANGED))
    )
    return (
        j.withColumn("change_type", change)
         .filter(F.col("change_type").isNotNull())
         .select(*key_cols, "change_type")
    )
