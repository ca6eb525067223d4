#!/bin/bash
# Sequential TPU measurement runbook (single TPU process at a time).
# Usage: bash /tmp/tpu_runbook.sh > /tmp/runbook.out 2>&1
set -x
cd /root/repo

echo "=== 0. probe ==="
timeout 120 python -c "
import jax, jax.numpy as jnp
print('devices', jax.devices())
print('probe', float(jnp.sum(jnp.arange(8.0)*2)))" || exit 1

echo "=== 1. on-TPU kernel suite (validates the dynamic-roll warp on HW) ==="
VIDSTAB_TPU=1 timeout 2400 python -m pytest tests/test_tpu_hw.py -m tpu -q

echo "=== 2. bench A: working tree (linalg stacks + roll + argmax + chunk) ==="
timeout 1800 python bench.py

echo "=== 3. bench B: XLA-GN everywhere (decides auto default) ==="
VIDSTAB_GN_MIN_BYTES=999999999999 timeout 1800 python bench.py

echo "=== 4. bench A again (drift control) ==="
timeout 1200 python bench.py

echo "=== 5. 4K config-4 ==="
timeout 3000 python -u apps/bench_configs.py --mode 4k

echo "=== 6. latency chunk2 ==="
timeout 2400 python -u apps/bench_configs.py --mode latency-chunk2

echo "=== 7. extraction micro-bench (4-axis einsum vs current) ==="
timeout 2400 python -u /tmp/micro2.py

echo "=== runbook done ==="
