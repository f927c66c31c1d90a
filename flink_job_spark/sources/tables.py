"""Testdata table loaders + static schemas.

The driver testdata (`TESTDATA.md`) is parquet; `events.ts` is stored as
parquet TIMESTAMP(NANOS) which Spark reads only as a long via
``spark.sql.legacy.parquet.nanosAsLong`` — we normalize it back to a
microsecond TIMESTAMP_NTZ here so every consumer sees a timestamp.

Static schemas below let oracle-SQL generators run without a SparkSession.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _ntz(name: str) -> T.StructField:
    return T.StructField(name, T.TimestampNTZType())


SCHEMAS: dict[str, T.StructType] = {
    "lineitem": T.StructType([
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        _ntz("l_shipdate"),
    ]),
    "orders": T.StructType([
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        _ntz("o_orderdate"),
        T.StructField("o_orderpriority", T.StringType()),
    ]),
    "customer": T.StructType([
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]),
}


def check_table_access(spark: SparkSession, sf_dir: str, name: str,
                       fmt: str = "parquet") -> bool:
    """Access probe before ingest (`SELECT FIRST 1 1 FROM t`, mis:494-525):
    failures mean SKIP the table, never crash the batch."""
    try:
        load_table(spark, sf_dir, name, fmt).limit(1).count()
        return True
    except Exception:
        return False


# microsecond-pinned NTZ text format (Spark's JSON/CSV default truncates to ms)
NTZ_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"


def load_table(spark: SparkSession, sf_dir: str, name: str,
               fmt: str = "parquet") -> DataFrame:
    """Read one source table in any supported on-disk format.

    parquet (default) reads `<dir>/<name>.parquet` (testdata layout) and
    normalizes `events.ts` nanos → TIMESTAMP_NTZ; csv/json/orc read
    `<dir>/<name>` directories as a generic ingest source (the engine's
    format-agnostic source surface — the reference only ever reads JDBC).
    CSV/JSON parse under the declared schema when one is known (SCHEMAS),
    else schema inference; ORC carries its own schema."""
    if fmt == "parquet":
        if name == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
            # integer division: `/` is double division and loses precision on
            # epoch-nanos magnitudes (2^53 < 1.7e18)
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
            )
        return df
    path = f"{sf_dir}/{name}"
    if fmt == "orc":
        return spark.read.orc(path)
    if fmt == "csv":
        r = spark.read.option("header", True).option("timestampNTZFormat", NTZ_FMT)
        schema = SCHEMAS.get(name)
        return (r.schema(schema) if schema
                else r.option("inferSchema", True)).csv(path)
    if fmt == "json":
        r = spark.read.option("timestampNTZFormat", NTZ_FMT)
        schema = SCHEMAS.get(name)
        return (r.schema(schema).json(path) if schema else r.json(path))
    raise ValueError(f"unsupported source format: {fmt!r}")


def fan_out(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism restore for map-heavy lineage (guide §2.5
    "Input skew: one huge unsplittable file … repartition immediately after
    the read").

    The bench testdata stores each table as ONE parquet file with ONE row
    group, so every scan is a single task no matter what
    ``maxPartitionBytes`` says — and any expensive per-row work that sits
    BELOW the first exchange (codec encode/decode in mapInPandas, hash
    forests, tokenize+shingle trees) serializes onto one core of the 32.
    One round-robin exchange of the (small, sub-core-count) scan output
    restores the parallelism the plan shape already assumes.

    Scale behaviour: the repartition fires ONLY when the input has fewer
    partitions than ``defaultParallelism``. A production corpus scan
    (binaryFile / many-file parquet) already carries >= cores partitions,
    so this is a no-op there — the condition is derived from the input,
    not from a local[32] constant. Same rule cached_media_df has shipped
    since r8 (one RoundRobinPartitioning allowed by the plan pins).

    Caveat (measured, see OPTIMIZATION_r09.md): Spark pushes deterministic
    Filters below Repartition, so a query whose expensive expressions sit
    in a Filter must ALSO pin the fanned frame (persist) or the work slides
    back below the exchange onto the single scan task.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def fan_out_by(df: DataFrame, *keys: str) -> DataFrame:
    """Keyed variant of :func:`fan_out` for grouped Arrow operators.

    A bare ``groupBy(k).applyInPandas(...)`` on bench-scale input produces a
    shuffle whose byte size AQE coalesces to ONE post-shuffle partition —
    correct for byte-bound work, but the grouped pandas stage is
    compute-bound per GROUP, so every group's Arrow transfer + Python
    recurrence serializes onto one core (measured: q_cusum 5.2 s → 2.2 s).
    An explicit ``repartition(defaultParallelism, keys)`` satisfies the
    operator's ClusteredDistribution (no second exchange) and, being a
    user-specified REPARTITION_BY_NUM, is exempt from AQE coalescing.

    Scale behaviour: fires only when the input has fewer partitions than
    defaultParallelism — a production-width scan keeps the standard
    groupBy exchange and AQE byte-based sizing."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par, *[df[k] for k in keys])
    return df
