#!/bin/bash
# One-shot TPU perf session (run when the tunnel at 127.0.0.1:8113 is up
# and no other heavy python process is running — 1-CPU host).
# Collects every round-3 hardware artifact in one pass:
#   logs/bench.json          bench.py all configs (driver contract lines)
#   logs/mfu_cornell.txt     per-depth roofline/MFU table (VERDICT r2 #3)
#   logs/sorted_dispatch.txt 10-family dispatch measurement (r2 #9)
#   logs/tpu_hardware.txt    MI_TPU_TESTS=1 battery (r2 #8)
set -x
cd "$(dirname "$0")/.."
mkdir -p logs
timeout 10 bash -c 'echo > /dev/tcp/127.0.0.1/8113' || {
    echo "tunnel down"; exit 1; }
timeout 5400 python bench.py | tee logs/bench.json
timeout 3600 python benchmarks/tpu_mfu.py --scene cornell \
    | tee logs/mfu_cornell.txt
timeout 3600 python benchmarks/bench_sorted_dispatch.py --families 10 \
    --width 256 --spp 64 | tee logs/sorted_dispatch.txt
MI_TPU_TESTS=1 timeout 3600 python -m pytest tests/test_tpu_hardware.py \
    -q 2>&1 | tee logs/tpu_hardware.txt
