#!/bin/bash
# round-7 close: each step isolated (no concurrent Spark)
cd /root/repo
set -x
python -m pytest tests/ -q > bench_runs/r7_pytest.log 2>&1
echo "pytest_exit=$?" >> bench_runs/r7_pytest.log
sleep 5
python tools/full_parity_sweep.py --sf /root/testdata/sf0.01 --out PARITY_FULL.json \
  > bench_runs/r7_parity_sf001.log 2>&1
echo "parity_exit=$?" >> bench_runs/r7_parity_sf001.log
sleep 5
python tools/full_parity_sweep.py --sf /root/testdata/sf0.1 --out PARITY_FULL_SF01.json \
  > bench_runs/r7_parity_sf01.log 2>&1
echo "parity_exit=$?" >> bench_runs/r7_parity_sf01.log
sleep 5
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py \
  > bench_runs/r7_bench_sf01.log 2>&1
echo "bench_exit=$?" >> bench_runs/r7_bench_sf01.log
cp BENCH_FULL.json bench_runs/r7_sf01_full.json
sleep 5
# prewarm the sf1 media fixture cache so the single-rep sf1 sweep measures decode
SPARK_GRAFT_SF_DIR=/tmp/sfdata_sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_ONLY=q_media_mjpeg_frames,q_media_jpeg_prog_stats,q_media_jpeg_cmyk_stats \
  python bench.py > bench_runs/r7_sf1_prewarm.log 2>&1
sleep 5
SPARK_GRAFT_SF_DIR=/tmp/sfdata_sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 python bench.py \
  > bench_runs/r7_bench_sf1.log 2>&1
echo "bench_exit=$?" >> bench_runs/r7_bench_sf1.log
cp BENCH_FULL.json bench_runs/r7_sf1_full.json
cp bench_runs/r7_sf01_full.json BENCH_FULL.json
echo DONE > bench_runs/r7_close.done
