#!/bin/bash
# Round-5 TPU measurement runbook.
# Round-4 queue is DONE (raw log: docs/TPU_QUEUE_RUN_r4.log, transcribed to
# BASELINE.md): warp HW 5/5; pair_vmap NEGATIVE 1080p+4K; merge_coarse
# NEGATIVE on throughput; extraction einsum below-noise. Driver bench
# record: 819.32 fps (BENCH_r04.json).
#
# Rules: one TPU process at a time; never bench while pytest runs; A/B arms
# back-to-back (box drifts ~9%/hr); PYTHONPATH must KEEP /root/.axon_site
# (use PYTHONPATH=/root/.axon_site:/root/repo — overriding it drops the
# axon plugin).
set -x
cd /root/repo

echo "=== 1. qy-mode + tile-shape micro-bench (taps/roll/switch) ==="
PYTHONPATH=/root/.axon_site:/root/repo timeout 3600 python -u pending/qy_bench.py

echo "=== 2. if step 1 picks a winner: flip qy/tile default, then e2e A/B ==="
echo "VIDSTAB_WARP_QY=roll python bench.py                      # vs plain, alternating"
echo "VIDSTAB_WARP_QY=roll python -u apps/bench_configs.py --mode 4k --gn xla   # vs plain"

echo "=== 3. 4K re-profile after the warp decision (update BASELINE.md table) ==="
echo "python -u apps/profile_chunk.py --mode 4k --streams 2 --by-source"
