#!/bin/bash
cd /root/repo
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py \
  > bench_runs/r6_bench_sf01.log 2>&1
echo "bench_exit=$?" >> bench_runs/r6_bench_sf01.log
cp BENCH_FULL.json bench_runs/r6_sf01_full.json
sleep 5
SPARK_GRAFT_SF_DIR=/tmp/sfdata_sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 python bench.py \
  > bench_runs/r6_bench_sf1.log 2>&1
echo "bench_exit=$?" >> bench_runs/r6_bench_sf1.log
cp BENCH_FULL.json bench_runs/r6_sf1_full.json
cp bench_runs/r6_sf01_full.json BENCH_FULL.json
echo DONE > bench_runs/r6_close.done
