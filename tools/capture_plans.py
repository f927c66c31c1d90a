"""Capture .explain("formatted") for a list of query keys to plans/<round>/.

Usage: python tools/capture_plans.py <suffix> key1 key2 ...
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<key>_<suffix>.txt for each key
(round dir defaults to r10).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    keys = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from flink_job_spark.queries import all_queries
    from flink_job_spark.session import get_spark, unpersist_all

    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r10"))
    os.makedirs(out_dir, exist_ok=True)
    for k in keys:
        try:
            df = qs[k].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {e}"
        with open(os.path.join(out_dir, f"{k}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"captured {k}")
        unpersist_all(spark)
    spark.stop()


if __name__ == "__main__":
    main()
