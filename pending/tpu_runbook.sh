#!/bin/bash
# Round-4 TPU measurement runbook — REMAINING steps (updated mid-round).
# Steps settled earlier on 2026-08-19 (results in docs/TPU_HW_RUN.md,
# BASELINE.md, /tmp/*.out transcribed to BASELINE/ROADMAP):
#   - on-HW suite 11/11 green; both pending patches LANDED (Jacobi +5.4%,
#     pltpu.roll column shift bit-exact)
#   - gn-backend default A/B: XLA everywhere wins 3/3 pairs -> default flipped
#   - 4K config-4 A/B: xla 141.6 vs auto 139.4/139.7
#   - latency-chunk2 9.6 ms/frame amortized; latency-request 34.1 ms p50
#     (29.9 ms dispatch-RTT floor), full-frame fetch 626 ms p50
# Remaining (one TPU process at a time; A/B arms back-to-back — the box
# drifts ~9%/hr):
set -x
cd /root/repo

echo "=== 0. warp bit-exactness on HW (f32-shifted + qy modes) ==="
VIDSTAB_TPU=1 timeout 2400 python -m pytest tests/test_tpu_hw.py -m tpu -q -k "warp"

echo "=== 1. qy-mode micro-bench (taps/roll/switch) ==="
timeout 2400 python -u pending/qy_bench.py

echo "=== 2. pair_vmap 1080p A/B pair3 (pair1: 796.0 seq / 757.7 vmap; pair2: 811.2 seq / 753.2 vmap) ==="
BENCH_PAIR_VMAP=0 timeout 1800 python bench.py
BENCH_PAIR_VMAP=1 timeout 1800 python bench.py

echo "=== 3. pair_vmap 4K A/B (the 4K GN-soup motivation; 2 alternating pairs) ==="
timeout 3000 python -u apps/bench_configs.py --mode 4k --gn xla --pair-vmap 1
timeout 3000 python -u apps/bench_configs.py --mode 4k --gn xla --pair-vmap 0
timeout 3000 python -u apps/bench_configs.py --mode 4k --gn xla --pair-vmap 1
timeout 3000 python -u apps/bench_configs.py --mode 4k --gn xla --pair-vmap 0

echo "=== 4. extraction micro-bench (4-axis einsum vs current) ==="
timeout 2400 python -u pending/micro2.py

echo "=== 5. merge_coarse throughput A/B (2 pairs, pair_vmap pinned off) ==="
BENCH_PAIR_VMAP=0 BENCH_MERGE_COARSE=2 timeout 1800 python bench.py
BENCH_PAIR_VMAP=0 BENCH_MERGE_COARSE=0 timeout 1800 python bench.py
BENCH_PAIR_VMAP=0 BENCH_MERGE_COARSE=2 timeout 1800 python bench.py
BENCH_PAIR_VMAP=0 BENCH_MERGE_COARSE=0 timeout 1800 python bench.py

echo "=== 6. after qy decision: flip default + same-hour headline re-measure ==="
echo "(flip qy_mode default in ops/pallas_warp.py + bench re-run; golden regen NOT needed — bit-exact)"

echo "=== 7. end-to-end qy default A/B (after step 1 picks the winner) ==="
echo "VIDSTAB_WARP_QY=roll python bench.py  # vs plain python bench.py, alternating pairs"
echo "VIDSTAB_WARP_QY=roll python -u apps/bench_configs.py --mode 4k --gn xla  # vs plain"
