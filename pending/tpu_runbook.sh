#!/bin/bash
# Round-4 TPU measurement runbook (single TPU process at a time).
# Run when the axon tunnel returns: bash pending/tpu_runbook.sh > /tmp/runbook.out 2>&1
#
# Decisions this sequence settles (round-3 VERDICT items 1-3 + weak 1):
#   - land-or-revert pending/pending_linalg.patch + pending/pending_roll.patch
#   - gn_kernel="auto" default: Pallas-at->=2MB hybrid vs XLA everywhere,
#     >= 3 ALTERNATING same-hour A/B pairs (the box drifts ~9%/hr)
#   - 8-DOF Pallas GN at 4K (round-4 kernel): A/B via --gn pallas vs xla
#   - true single-request latency (latency-request mode, chain=1)
set -x
cd /root/repo

echo "=== 0. probe ==="
timeout 120 python -c "
import jax, jax.numpy as jnp
print('devices', jax.devices())
print('probe', float(jnp.sum(jnp.arange(8.0)*2)))" || exit 1

echo "=== 1. apply pending patches (working tree must be clean) ==="
git apply pending/pending_linalg.patch || exit 1
git apply pending/pending_roll.patch || exit 1

echo "=== 2. on-TPU kernel suite (validates dynamic-roll warp + both GN kernels on HW) ==="
VIDSTAB_TPU=1 timeout 2400 python -m pytest tests/test_tpu_hw.py -m tpu -q

echo "=== 3. gn-default A/B: >=3 alternating pairs (A=hybrid auto, B=XLA everywhere) ==="
for i in 1 2 3; do
  timeout 1800 python bench.py                                  # A (auto hybrid)
  VIDSTAB_GN_MIN_BYTES=999999999999 timeout 1800 python bench.py  # B (XLA all levels)
done

echo "=== 4. 4K config-4: auto(hybrid incl. 8-DOF pallas) vs xla ==="
timeout 3000 python -u apps/bench_configs.py --mode 4k
timeout 3000 python -u apps/bench_configs.py --mode 4k --gn xla
timeout 3000 python -u apps/bench_configs.py --mode 4k

echo "=== 5. latency: amortized chunk2 + TRUE single-request ==="
timeout 2400 python -u apps/bench_configs.py --mode latency-chunk2
timeout 2400 python -u apps/bench_configs.py --mode latency-request

echo "=== 6. extraction micro-bench (4-axis einsum vs current) ==="
timeout 2400 python -u pending/micro2.py

echo "=== runbook done — decide land/revert + golden regen from the numbers ==="
