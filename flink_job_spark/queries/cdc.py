"""CDC change-stream application → latest-state snapshot.

The reference's tech envelope reserves Debezium-style CDC slots (op, ts_ms,
source_ts_ms — mis:88-91; the snapshot path stamps op='INITIAL' only). This
operator completes that surface: given a keyed change stream with I/U/D
operations, produce the current state per key — keep each key's LAST change
in (ts, event_id) order unless that change is a delete.

Spark shape: one window over the key (single shuffle on user_id), rank by the
total change order descending, keep rn=1, drop deletes. At 100 TB this is the
standard "compact a CDC topic" plan: partition by key, no broadcast, no
driver state; in streaming the same semantics run as
``dropDuplicates``/max-ts ``applyInPandasWithState`` (see streaming/).

The `events` table plays the change stream: signup→I, error→D, others→U,
totally ordered per user by (ts, event_id) (unique in the testdata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_job_spark.queries import register
from flink_job_spark.sources.tables import load_table

_OP = "CASE WHEN event_type = 'signup' THEN 'I' WHEN event_type = 'error' THEN 'D' ELSE 'U' END"


@register(
    "q_cdc_apply",
    f"""WITH changes AS (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
             {_OP} AS op, value
      FROM events
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM changes
    )
    SELECT user_id, ts AS last_ts, op AS last_op, value AS last_value
    FROM ranked WHERE rn = 1 AND op <> 'D'""",
    doc="apply a keyed I/U/D change stream: latest non-delete state per key "
        "(one key-partitioned window, Debezium-slot semantics of mis:88-91)",
    tags=("cdc", "window"),
)
def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    changes = e.select(
        "user_id", "ts", "event_id",
        F.expr(_OP).alias("op"), "value",
    )
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(),
                                              F.col("event_id").desc())
    return (
        changes.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select("user_id", F.col("ts").alias("last_ts"),
                F.col("op").alias("last_op"), F.col("value").alias("last_value"))
    )


# --- q_scd2_merge: type-2 slowly-changing dimension snapshot apply ------------------

SCD2_T0 = "2025-01-01"   # historical valid_from
SCD2_T1 = "2025-06-01"   # historical valid_to
SCD2_T2 = "2026-01-01"   # current-generation valid_from
SCD2_T3 = "2026-02-01"   # this load's timestamp
SCD2_HIST_MOD = 5        # keys that carry a pre-closed history row
SCD2_DROP_MOD = 11       # keys missing from the new snapshot (logical delete)
SCD2_CHG_MOD = 7         # keys whose acctbal changed
SCD2_NEW_MOD = 13        # keys spawning a brand-new +1000000 key
SCD2_NEW_OFF = 1_000_000

@register(
    "q_scd2_merge",
    f"""WITH base AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
    closed AS (
      SELECT c_custkey, c_acctbal - 10 AS c_acctbal, c_mktsegment,
             TIMESTAMP '{SCD2_T0}' AS valid_from, TIMESTAMP '{SCD2_T1}' AS valid_to
      FROM base WHERE c_custkey % {SCD2_HIST_MOD} = 0
    ),
    open_rows AS (
      SELECT c_custkey, c_acctbal, c_mktsegment,
             TIMESTAMP '{SCD2_T2}' AS valid_from FROM base
    ),
    snap AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % {SCD2_CHG_MOD} = 0 THEN c_acctbal + 1
                  ELSE c_acctbal END AS c_acctbal,
             c_mktsegment
      FROM base WHERE c_custkey % {SCD2_DROP_MOD} != 0
      UNION ALL
      SELECT c_custkey + {SCD2_NEW_OFF}, c_acctbal, 'NEW'
      FROM base WHERE c_custkey % {SCD2_NEW_MOD} = 0
    ),
    merged AS (
      SELECT o.c_custkey, o.c_acctbal, o.c_mktsegment, o.valid_from,
             CASE WHEN n.c_custkey IS NOT NULL AND o.c_acctbal = n.c_acctbal
                       AND o.c_mktsegment = n.c_mktsegment
                  THEN CAST(NULL AS TIMESTAMP)
                  ELSE TIMESTAMP '{SCD2_T3}' END AS valid_to
      FROM open_rows o LEFT JOIN snap n ON o.c_custkey = n.c_custkey
      UNION ALL
      SELECT n.c_custkey, n.c_acctbal, n.c_mktsegment,
             TIMESTAMP '{SCD2_T3}' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
      FROM snap n LEFT JOIN open_rows o ON o.c_custkey = n.c_custkey
      WHERE o.c_custkey IS NULL OR o.c_acctbal != n.c_acctbal
            OR o.c_mktsegment != n.c_mktsegment
    )
    SELECT c_custkey, c_acctbal, c_mktsegment, valid_from, valid_to,
           valid_to IS NULL AS is_current
    FROM (SELECT * FROM closed UNION ALL SELECT * FROM merged)""",
    doc="SCD type-2 merge: apply a full snapshot to a versioned dimension — "
        "unchanged rows stay open, changed keys close-and-reopen, missing "
        "keys close, new keys open; closed history passes through untouched",
    tags=("cdc", "scd2", "diff"),
)
def q_scd2_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixture riding the customer table: %5 keys carry closed
    history, the new snapshot drops %11 keys, bumps %7 acctbals, and spawns
    %13 brand-new keys. The operator (operators/diff.py scd2_apply) does one
    full-outer key join of the open slice vs the snapshot and emits each
    row's 1-2 outputs via conditional array + explode — history only ever
    costs a scan+union. The oracle re-derives the same semantics with plain
    attr comparison, independently of the operator's hash mechanism."""
    from flink_job_spark.operators.diff import scd2_apply

    import datetime as dt

    base = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment")
    null_ts = F.lit(None).cast("timestamp_ntz")

    def ts(s: str):
        return F.lit(dt.datetime.fromisoformat(s)).cast("timestamp_ntz")

    closed = base.filter(F.col("c_custkey") % SCD2_HIST_MOD == 0).select(
        "c_custkey",
        (F.col("c_acctbal") - 10).alias("c_acctbal"),
        "c_mktsegment",
        ts(SCD2_T0).alias("valid_from"),
        ts(SCD2_T1).alias("valid_to"),
    )
    open_rows = base.select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        ts(SCD2_T2).alias("valid_from"),
        null_ts.alias("valid_to"),
    )
    dim = closed.unionByName(open_rows)

    snap = base.filter(F.col("c_custkey") % SCD2_DROP_MOD != 0).select(
        "c_custkey",
        F.when(F.col("c_custkey") % SCD2_CHG_MOD == 0,
               F.col("c_acctbal") + 1).otherwise(F.col("c_acctbal"))
         .alias("c_acctbal"),
        "c_mktsegment",
    ).unionByName(
        base.filter(F.col("c_custkey") % SCD2_NEW_MOD == 0).select(
            (F.col("c_custkey") + SCD2_NEW_OFF).alias("c_custkey"),
            "c_acctbal",
            F.lit("NEW").alias("c_mktsegment"),
        )
    )
    return scd2_apply(
        dim, snap, ["c_custkey"], ["c_acctbal", "c_mktsegment"],
        dt.datetime.fromisoformat(SCD2_T3),
    )


# --- q_compaction_plan: small-file bin-packing for table maintenance -----------------
#
# The maintenance pass every large Iceberg/parquet table needs: group small
# files into target-sized rewrite bins (the reference pins
# write.target-file-size-bytes = 512 MB on its tables,
# mis_initial_job/src/main/java/com/rzdmed/flink/FirebirdToIcebergJob.java:888-913;
# compaction is how a table keeps honoring that target after many
# incremental loads). Files are binned PER PARTITION (source) by the
# sequential-fill rule: a file joins the bin in which its first byte lands
# when files are laid end-to-end in file-id order — one window cumsum, no
# driver loop, and exactly what a planner needs to emit one rewrite task
# per bin.

COMPACT_TARGET_BYTES = 8 * 1024 * 1024     # bench-scaled stand-in for 512 MB
COMPACT_FILE_SCALE = 4096                  # n_chars -> synthetic file bytes


@register(
    "q_compaction_plan",
    f"""WITH files AS (
          SELECT source, doc_id AS file_id,
                 CAST(n_chars AS BIGINT) * {COMPACT_FILE_SCALE} AS bytes
          FROM documents
        ),
        placed AS (
          SELECT source, file_id, bytes,
                 (SUM(bytes) OVER (PARTITION BY source ORDER BY file_id)
                  - bytes) // {COMPACT_TARGET_BYTES} AS bin
          FROM files
        )
        SELECT source, CAST(bin AS BIGINT) AS bin,
               CAST(COUNT(1) AS BIGINT) AS n_files,
               CAST(SUM(bytes) AS BIGINT) AS total_bytes,
               MIN(file_id) AS first_file, MAX(file_id) AS last_file
        FROM placed GROUP BY source, bin""",
    doc="compaction planning: per-partition sequential-fill bin packing of "
        "small files into target-size rewrite groups (the maintenance op "
        "behind Iceberg rewrite_data_files; the reference pins a 512 MB "
        "target file size) — one window cumsum per partition, each output "
        "row is one rewrite task",
    tags=("cdc", "maintenance", "layout"),
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One shuffle on the partition key, then a running sum inside each
    partition — the plan a metadata-scale input deserves (file inventories
    are rows-per-FILE, not rows-per-record: a 100 TB table is ~200k files,
    driver-free but trivially distributed). The bin rule is pure integer
    math ((cumsum - size) DIV target), so engines agree bitwise; a greedy
    first-fit-decreasing variant packs ~10% tighter but is inherently
    sequential per partition — the window form is the one that stays a
    2-exchange plan at any file count."""
    d = load_table(spark, sf_dir, "documents")
    files = d.select(
        "source", F.col("doc_id").alias("file_id"),
        (F.col("n_chars").cast("bigint") * COMPACT_FILE_SCALE).alias("bytes"))
    placed = files.withColumn(
        "bin", F.expr(f"(sum(bytes) OVER (PARTITION BY source ORDER BY "
                      f"file_id ROWS BETWEEN UNBOUNDED PRECEDING AND "
                      f"CURRENT ROW) - bytes) div {COMPACT_TARGET_BYTES}"))
    return placed.groupBy("source", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("total_bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file"),
    ).select("source", F.col("bin").cast("bigint").alias("bin"),
             "n_files", "total_bytes", "first_file", "last_file")
