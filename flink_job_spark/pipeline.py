"""End-to-end snapshot-ingest pipeline: the Spark-native equivalent of the
reference's per-table flow (mis:202-297) + post-load audit (mis:1264-1331).

Per table:
1. freeze cutoff MAX(order_col)                       (mis:628-643)
2. baseline source COUNT under cutoff                 (mis:1362-1383)
3. snapshot scan: explicit columns, cutoff predicate  (mis:1076-1088)
4. stamp the 11-tech-column envelope; row_hash via the Column-expression
   implementation                                     (mis:1107-1119)
5. write parquet partitioned by month(load_dttm), zstd — the local stand-in
   for the Iceberg DDL (month partitioning mis:905, zstd mis:907, 512 MB
   target files mis:908); computing row_hash_iceberg DURING the write via the
   independent SQL-string implementation              (mis:918-939)
6. re-read the target and run the COUNT+mismatch audit (mis:1385-1411)

Failure isolation: per-table try/except, like the reference's skip-on-failure
loop (mis:207-224, 309-359).
"""

from __future__ import annotations

import datetime as dt
import logging
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_job_spark.functions.hashing import row_hash_sql_expr
from flink_job_spark.operators.audit import AuditReport, run_consistency_check
from flink_job_spark.operators.envelope import (
    DEFAULT_SRC_SYSTEM,
    tech_column_names,
    with_envelope,
)
from flink_job_spark.operators.snapshot import cutoff_predicate, freeze_cutoff, snapshot_scan
from flink_job_spark.types import ColumnInfo, infos_from_schema, quote_identifier

log = logging.getLogger(__name__)


class SchemaDriftError(RuntimeError):
    """Raised when an append-mode snapshot's schema no longer matches the
    existing target and the config says drift is an error. The reference
    sidesteps drift by drop/replace (mis:261-263); production targets need an
    explicit decision — fail loudly or evolve additively."""

    def __init__(self, table: str, added: set[str], removed: set[str]):
        super().__init__(
            f"schema drift for {table}: added={sorted(added)} removed={sorted(removed)}")
        self.table = table
        self.added = added
        self.removed = removed


class ConsistencyError(RuntimeError):
    """Raised when the post-load audit fails and fail_on_consistency_error is
    set. Escapes the per-table failure isolation and aborts the whole batch,
    like the reference's rethrown ConsistencyCheckException (mis:365-368).
    Carries the failing AuditReport so the caller can print the numbers."""

    def __init__(self, table: str, report: "AuditReport | None" = None):
        if report is not None:
            msg = (f"consistency check failed for {table}: delta={report.delta} "
                   f"hash_mismatches={report.hash_mismatches}")
        else:   # message-only form (quality-gate rule failures carry no report)
            msg = f"consistency check failed: {table}"
        super().__init__(msg)
        self.table = table
        self.report = report


@dataclass
class IngestResult:
    table: str
    cutoff: Any
    report: AuditReport | None
    error: str | None = None

    @property
    def ok(self) -> bool:
        return self.error is None and self.report is not None and self.report.ok


@dataclass
class IngestConfig:
    mode: str = "append"                 # append | replace (mis:114, 261-263)
    src_system_code: str = DEFAULT_SRC_SYSTEM
    fail_on_consistency_error: bool = False  # mis:119-121
    compression: str = "zstd"            # mis:907
    load_dttm: dt.datetime | None = None  # fixed for deterministic tests
    infos: dict[str, ColumnInfo] = field(default_factory=dict)
    # Iceberg writer branch (mis:886-939): when catalog is set, the target is
    # <catalog>.<database>.<table> via DDL + writeTo instead of parquet files.
    # Requires the Iceberg Spark runtime on the classpath.
    catalog: str | None = None
    database: str = "default"
    # per-task progress logging + exact observed write counts (mis:1120-1131)
    progress: bool = False
    # cluster output files by the order key (sortWithinPartitions): parquet
    # row-group min/max stats then prune cutoff/point-lookup scans on the key
    # — the file-layout dividend of the reference's ordered cursor, without a
    # global sort's extra shuffle
    cluster_by_key: bool = False
    # append-mode schema drift policy: 'fail' aborts the table (per-table
    # isolation), 'evolve' appends additively and reads the target with
    # schema merge (Iceberg's add-column evolution, spelled for parquet)
    on_schema_drift: str = "fail"


def _detect_schema_drift(spark, target_path, new_schema):
    """(added, removed) column-name sets vs the existing target, or None when
    the target doesn't exist yet / schemas agree. Reads footers only."""
    from pyspark.errors import AnalysisException

    try:
        existing = set(spark.read.parquet(target_path).schema.names)
    except AnalysisException:  # first load: no target yet (PATH_NOT_FOUND)
        return None
    # any OTHER failure (transient storage/permission error) must propagate:
    # treating it as "no target" would silently skip drift detection and
    # append a drifted schema
    new = set(new_schema.names)
    if existing == new:
        return None
    return new - existing, existing - new


def snapshot_ingest(
    spark: SparkSession,
    source: DataFrame,
    table: str,
    target_path: str,
    order_col: str,
    config: IngestConfig | None = None,
    floor: Any = None,
) -> IngestResult:
    cfg = config or IngestConfig()
    try:
        cutoff = freeze_cutoff(source, order_col)
        src_count = source.filter(cutoff_predicate(order_col, cutoff)).count()

        scan = snapshot_scan(source, list(source.columns), order_col, cutoff,
                             floor=floor, ordered=False)
        enveloped = with_envelope(scan, cfg.src_system_code,
                                  load_dttm=cfg.load_dttm or dt.datetime.now(),
                                  infos=cfg.infos)

        # sink-side hash: the independently generated SQL expression, evaluated
        # during the write — same engine, independent implementation (mis:918-939)
        names = tech_column_names(list(scan.columns))
        sink_hash = row_hash_sql_expr(scan.schema, list(scan.columns), cfg.infos)
        hashed = enveloped.withColumn(names["row_hash_iceberg"], F.expr(sink_hash))

        obs = None
        if cfg.progress:
            # observed metric rides the write plan: exact rows written with no
            # second scan (the per-run total print of mis:1132-1134)
            from pyspark.sql import Observation
            obs = Observation(f"ingest:{table}")
            hashed = hashed.observe(obs, F.count(F.lit(1)).alias("rows_written"))

        from contextlib import nullcontext

        from flink_job_spark.progress import ProgressReporter
        reporter = (ProgressReporter(spark, f"ingest:{table}", f"snapshot {table}")
                    if cfg.progress else nullcontext())
        with reporter:
            if cfg.catalog:
                # Iceberg branch: DDL (month hidden partitioning, zstd, 512 MB,
                # v2, retention — mis:886-913) + writeTo append/overwrite
                from flink_job_spark.sinks.iceberg import iceberg_write
                derived = {i.name: i for i in infos_from_schema(scan.schema)}
                cols = [cfg.infos.get(c) or derived[c] for c in scan.columns]
                iceberg_write(spark, hashed, cfg.catalog, cfg.database, table,
                              cols, cfg.mode)
                target = spark.table(
                    f"{quote_identifier(cfg.catalog)}."
                    f"{quote_identifier(cfg.database)}.{quote_identifier(table)}")
            else:
                # parquet stand-in: explicit load_month partition column emulates
                # the hidden month(load_dttm) transform (mis:905)
                to_write = hashed.withColumn(
                    "load_month", F.date_format(F.col(names["load_dttm"]), "yyyy-MM"))
                if cfg.cluster_by_key:
                    to_write = to_write.sortWithinPartitions(order_col)
                drift = _detect_schema_drift(spark, target_path, to_write.schema) \
                    if cfg.mode == "append" else None
                if drift and cfg.on_schema_drift == "fail":
                    raise SchemaDriftError(table, *drift)
                (to_write.write
                    .partitionBy("load_month")
                    .option("compression", cfg.compression)
                    .mode("overwrite" if cfg.mode == "replace" else "append")
                    .parquet(target_path))
                if drift:  # evolve: the target now holds two schemas — merge
                    log.warning("schema drift on %s evolved additively: "
                                "added=%s removed=%s", table, *drift)
                    target = (spark.read.option("mergeSchema", "true")
                              .parquet(target_path))
                else:
                    # explicit schema: an empty snapshot writes no data files
                    # to infer from
                    target = spark.read.schema(to_write.schema).parquet(target_path)
        if obs is not None:
            log.info("Total emitted in this run: %s from %s (mis:1132-1134)",
                     obs.get.get("rows_written"), table)
        report = run_consistency_check(
            table, src_count, target, cutoff_predicate(order_col, cutoff),
            h1=names["row_hash"], h2=names["row_hash_iceberg"])
        if not report.ok:
            if cfg.fail_on_consistency_error:
                # escapes the blanket isolation below and aborts the batch,
                # like the reference's rethrow (mis:365-368)
                raise ConsistencyError(table, report)
            log.error("consistency check failed for %s: delta=%d hash_mismatches=%d",
                      table, report.delta, report.hash_mismatches)
        return IngestResult(table, cutoff, report)
    except ConsistencyError:
        raise
    except Exception as e:  # per-table failure isolation (mis:207-224)
        log.exception("ingest failed for table %s", table)
        return IngestResult(table, None, None, error=str(e))


def ingest_tables(
    spark: SparkSession,
    tables: list[tuple],  # (df, name, target_path, order_col[, infos])
    config: IngestConfig | None = None,
) -> list[IngestResult]:
    """Multi-table loop with per-table failure isolation and running totals
    (the reference's batch loop, mis:189-198, 299-359). A 5th tuple element
    carries per-table ColumnInfo metadata (live JDBC sources)."""
    import dataclasses

    results = []
    for item in tables:
        df, name, path, key = item[:4]
        infos = item[4] if len(item) > 4 and item[4] else None
        cfg = (dataclasses.replace(config or IngestConfig(), infos=infos)
               if infos else config)
        results.append(snapshot_ingest(spark, df, name, path, key, cfg))
    total_read = sum(r.report.source_count for r in results if r.report)
    total_written = sum(r.report.target_count for r in results if r.report)
    log.info("ingest totals: rows_read=%d rows_written=%d delta=%d failures=%d",
             total_read, total_written, total_written - total_read,
             sum(1 for r in results if r.error))
    return results
