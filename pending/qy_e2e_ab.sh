#!/bin/bash
# Round-5 e2e A/B of the output-warp qy-mode / tile defaults (micro-bench
# winners: roll everywhere at 4K with (216,640) best; roll at the 1080p
# bilinear headline shape). Alternating same-hour arms; bench.py / the 4K
# mode print one JSON line each. One TPU process at a time.
set -x
cd /root/repo

echo "=== headline 1080p: taps(512) vs roll(512), 3 alternating pairs ==="
for i in 1 2 3; do
  VIDSTAB_WARP_QY=taps timeout 2400 python bench.py 2>&1 | tail -2
  VIDSTAB_WARP_QY=roll timeout 2400 python bench.py 2>&1 | tail -2
done

echo "=== 4K config-4: taps(512) vs roll(640), 2 alternating pairs ==="
for i in 1 2; do
  VIDSTAB_WARP_QY=taps timeout 2400 python -u apps/bench_configs.py --mode 4k --gn xla 2>&1 | tail -2
  VIDSTAB_WARP_QY=roll VIDSTAB_WARP_TILE=216x640 timeout 2400 python -u apps/bench_configs.py --mode 4k --gn xla 2>&1 | tail -2
done
