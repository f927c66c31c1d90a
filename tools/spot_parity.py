"""Spot-check named registry keys against their DuckDB oracles at sf0.01.

Usage: python tools/spot_parity.py q_key1 q_key2 ...   (no args = all keys)

Mirrors the driver's comparison: sort columns by name, canonize cells
(repr for floats, str otherwise), sort rows, compare. Exits non-zero on
any mismatch. Run only when no other Spark process is live.
"""

from __future__ import annotations

import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
SF_DIR = "/root/testdata/sf0.01"


def canon(df) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(
        tuple(repr(float(v)) if isinstance(v, float) else str(v) for v in r)
        for r in df.itertuples(index=False))


def main(argv: list[str]) -> int:
    from pyspark.sql import SparkSession

    from flink_job_spark.queries import all_queries

    qs = all_queries()
    names = argv[1:] or sorted(qs)
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false").getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")
    failures = 0
    for name in names:
        spec = qs[name]
        sdf = spec.fn(spark, SF_DIR).toPandas()
        if spec.oracle is None:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        odf = con.execute(spec.oracle).df()
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"{name}: COLUMN MISMATCH {sorted(sdf.columns)} vs "
                  f"{sorted(odf.columns)}")
            failures += 1
            continue
        a, b = canon(sdf), canon(odf)
        if a == b:
            print(f"{name}: MATCH ({len(a)} rows)")
        else:
            failures += 1
            print(f"{name}: MISMATCH spark={len(a)} duck={len(b)} rows")
            for x, y in zip(a, b):
                if x != y:
                    print("  spark:", x)
                    print("  duck :", y)
                    break
        spark.catalog.clearCache()
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
