#!/bin/bash
# round-8 close: each step isolated (no concurrent Spark)
cd /root/repo
set -x
# 1. isolated re-measure of the r7-flagged drifting iterative keys
#    (VERDICT r7 #4): three clean runs each
for i in 1 2 3; do
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
    SPARK_GRAFT_ONLY=q_label_propagation,q_recommend_topn,q_partition_prune,q_small_qty_revenue \
    python bench.py > bench_runs/r8_drift_$i.log 2>&1
  cp BENCH_FULL.json bench_runs/r8_drift_$i.json
  sleep 5
done
# 2. parity both sfs (also warms the sf0.01/sf0.1 media fixture caches,
#    which this round's codec edits invalidated)
python tools/full_parity_sweep.py --sf /root/testdata/sf0.01 --out PARITY_FULL.json \
  > bench_runs/r8_parity_sf001.log 2>&1
echo "parity_exit=$?" >> bench_runs/r8_parity_sf001.log
sleep 5
python tools/full_parity_sweep.py --sf /root/testdata/sf0.1 --out PARITY_FULL_SF01.json \
  > bench_runs/r8_parity_sf01.log 2>&1
echo "parity_exit=$?" >> bench_runs/r8_parity_sf01.log
sleep 5
# 3. sf0.1 bench (3 interleaved reps internally)
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py \
  > bench_runs/r8_bench_sf01.log 2>&1
echo "bench_exit=$?" >> bench_runs/r8_bench_sf01.log
cp BENCH_FULL.json bench_runs/r8_sf01_full.json
sleep 5
# 4. sf1: prewarm ALL SIX cached media keys (jpeg/webp/vp8 sources changed
#    this round, invalidating every media cache), then the single-rep sweep
SPARK_GRAFT_SF_DIR=/tmp/sfdata_sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 \
  SPARK_GRAFT_ONLY=q_media_mjpeg_frames,q_media_jpeg_prog_stats,q_media_jpeg_cmyk_stats,q_media_webp_stats,q_media_jpeg_hier,q_media_webp_lossy \
  python bench.py > bench_runs/r8_sf1_prewarm.log 2>&1
sleep 5
SPARK_GRAFT_SF_DIR=/tmp/sfdata_sf1 SPARK_GRAFT_CPUS=32 SPARK_GRAFT_REPS=1 python bench.py \
  > bench_runs/r8_bench_sf1.log 2>&1
echo "bench_exit=$?" >> bench_runs/r8_bench_sf1.log
cp BENCH_FULL.json bench_runs/r8_sf1_full.json
cp bench_runs/r8_sf01_full.json BENCH_FULL.json
# 5. post-fix green pytest log (VERDICT r7 #3: the committed log must be
#    the run AFTER the round's last source change)
python -m pytest tests/ -q > bench_runs/r8_pytest.log 2>&1
echo "pytest_exit=$?" >> bench_runs/r8_pytest.log
echo DONE > bench_runs/r8_close.done
