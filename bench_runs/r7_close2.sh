#!/bin/bash
cd /root/repo
set -x
# quick sf0.1 parity check of the three keys changed after the full sweeps
python tools/full_parity_sweep.py --sf /root/testdata/sf0.1 --out bench_runs/r7_parity_sf01_topup.json \
  q_segment_multiscript q_media_webp_stats q_media_jpeg_hier \
  > bench_runs/r7_parity_topup.log 2>&1
sleep 5
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py \
  > bench_runs/r7_bench_sf01b.log 2>&1
echo "bench_exit=$?" >> bench_runs/r7_bench_sf01b.log
cp BENCH_FULL.json bench_runs/r7_sf01_fullb.json
sleep 5
SPARK_GRAFT_SF_DIR=/tmp/sfdata_sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_ONLY=q_media_webp_stats,q_media_jpeg_hier \
  python bench.py > bench_runs/r7_sf1_prewarm2.log 2>&1
sleep 5
SPARK_GRAFT_SF_DIR=/tmp/sfdata_sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 python bench.py \
  > bench_runs/r7_bench_sf1b.log 2>&1
echo "bench_exit=$?" >> bench_runs/r7_bench_sf1b.log
cp BENCH_FULL.json bench_runs/r7_sf1_fullb.json
cp bench_runs/r7_sf01_fullb.json BENCH_FULL.json
sleep 5
python -m pytest tests/ -q > bench_runs/r7_pytest_final.log 2>&1
echo "pytest_exit=$?" >> bench_runs/r7_pytest_final.log
echo DONE > bench_runs/r7_close2.done
