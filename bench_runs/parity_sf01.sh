#!/bin/bash
cd /root/repo
python tools/full_parity_sweep.py --sf /root/testdata/sf0.1 --out PARITY_FULL_SF01.json > bench_runs/parity_sf01.log 2>&1
echo "exit=$?" >> bench_runs/parity_sf01.log
