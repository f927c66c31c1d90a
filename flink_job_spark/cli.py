"""CLI mirroring the reference job's arguments (mis:105-121):

  --tables src[:dst][,src2[:dst2]...]   table mappings (parseTableMappings mis:437-466)
  --source-dir / --target-dir           local parquet stand-ins for JDBC/Iceberg
  --mode append|replace                 mis:114, 261-263
  --order-by col[,col2...]              per-table ordering/cutoff key override (mis:231-242)
  --src-system-code                     envelope stamp (mis:1115)
  --fail-on-consistency-error           mis:119-121
  --batch-size                          tables per progress batch (mis:84)

Order-key fallback mirrors the reference (explicit → detected key → first
column, mis:231-242); "detected key" here is the conventional `<t>_<prefix>key`
first column of the TPC-H-ish testdata.

Run:  python -m flink_job_spark.cli --tables lineitem,orders \
        --source-dir /root/testdata/sf0.001 --target-dir /tmp/out --mode replace
"""

from __future__ import annotations

import argparse
import sys

from flink_job_spark.pipeline import ConsistencyError, IngestConfig, ingest_tables
from flink_job_spark.session import get_spark
from flink_job_spark.sources.tables import check_table_access, load_table


def parse_table_mappings(spec: str) -> list[tuple[str, str]]:
    """'a:b,c' → [(a,b),(c,c)] (mis:437-466)."""
    out = []
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        src, _, dst = part.partition(":")
        out.append((src.strip(), (dst or src).strip()))
    return out


def detect_order_key(columns: list[str]) -> str:
    """PK detection stand-in: first `*key` column, else first column
    (mis:598-626 falls back the same way)."""
    for c in columns:
        if c.lower().endswith("key"):
            return c
    return columns[0]


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="flink_job_spark",
                                description="PySpark snapshot-ingest + audit engine")
    p.add_argument("--tables", required=True)
    p.add_argument("--source-dir", required=True)
    p.add_argument("--target-dir", required=True)
    p.add_argument("--mode", choices=["append", "replace"], default="append")
    p.add_argument("--order-by", default=None,
                   help="comma list parallel to --tables; blank entries auto-detect")
    p.add_argument("--src-system-code", default="mis")
    p.add_argument("--fail-on-consistency-error", action="store_true")
    p.add_argument("--batch-size", type=int, default=5)
    args = p.parse_args(argv)

    mappings = parse_table_mappings(args.tables)
    order_overrides = (args.order_by or "").split(",") if args.order_by else []

    spark = get_spark("flink_job_spark-cli")
    cfg = IngestConfig(mode=args.mode, src_system_code=args.src_system_code,
                       fail_on_consistency_error=args.fail_on_consistency_error)

    jobs = []
    skipped = 0
    for i, (src, dst) in enumerate(mappings):
        # access probe: skip unreadable tables, never crash the batch (mis:494-525)
        if not check_table_access(spark, args.source_dir, src):
            print(f"SKIP  {src}: access probe failed", file=sys.stderr)
            skipped += 1
            continue
        df = load_table(spark, args.source_dir, src)
        key = (order_overrides[i].strip()
               if i < len(order_overrides) and order_overrides[i].strip()
               else detect_order_key(df.columns))
        jobs.append((df, src, f"{args.target_dir}/{dst}", key))

    failures = 0
    for start in range(0, len(jobs), args.batch_size):  # batch loop (mis:189-198)
        try:
            results = ingest_tables(spark, jobs[start:start + args.batch_size], cfg)
        except ConsistencyError as e:
            # --fail-on-consistency-error aborts the whole job, like the
            # reference's rethrown ConsistencyCheckException (mis:365-368)
            rep = e.report
            print(f"ABORT {e.table}: consistency check failed "
                  f"read={rep.source_count} written={rep.target_count} "
                  f"delta={rep.delta} hash_mismatches={rep.hash_mismatches}",
                  file=sys.stderr)
            return 2
        for r in results:
            if r.error:
                failures += 1
                print(f"FAIL  {r.table}: {r.error}", file=sys.stderr)
            else:
                rep = r.report
                status = "OK" if rep.ok else "INCONSISTENT"
                print(f"{status:5s} {r.table}: read={rep.source_count} "
                      f"written={rep.target_count} delta={rep.delta} "
                      f"hash_mismatches={rep.hash_mismatches} cutoff={r.cutoff}")
                if not rep.ok:
                    failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
