#!/bin/bash
# round-8 close, part 2 (after the cache-parallelism fix): bench + sf1 + pytest
cd /root/repo
set -x
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py \
  > bench_runs/r8_bench_sf01.log 2>&1
echo "bench_exit=$?" >> bench_runs/r8_bench_sf01.log
cp BENCH_FULL.json bench_runs/r8_sf01_full.json
sleep 5
SPARK_GRAFT_SF_DIR=/tmp/sfdata_sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_ONLY=q_media_mjpeg_frames,q_media_jpeg_prog_stats,q_media_jpeg_cmyk_stats,q_media_webp_stats,q_media_jpeg_hier,q_media_webp_lossy \
  python bench.py > bench_runs/r8_sf1_prewarm.log 2>&1
sleep 5
SPARK_GRAFT_SF_DIR=/tmp/sfdata_sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 python bench.py \
  > bench_runs/r8_bench_sf1.log 2>&1
echo "bench_exit=$?" >> bench_runs/r8_bench_sf1.log
cp BENCH_FULL.json bench_runs/r8_sf1_full.json
cp bench_runs/r8_sf01_full.json BENCH_FULL.json
python -m pytest tests/ -q > bench_runs/r8_pytest.log 2>&1
echo "pytest_exit=$?" >> bench_runs/r8_pytest.log
echo DONE > bench_runs/r8_close.done
