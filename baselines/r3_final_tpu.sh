#!/bin/bash
# Round-3 final hardware pass.  Run AFTER the test suite finishes
# (one CPU core — serialize tests vs benches) and once the TPU tunnel
# is back (probe with __graft_entry__._probed_device_count).
#
#   nohup bash baselines/r3_final_tpu.sh > /tmp/r3_final_tpu.log 2>&1 &
#
# 1. bench.py at the canonical TCGA scale — confirms the 397k tok/s
#    headline still reproduces after the round-3 train-step refactors
#    (grad-accum plumbing is inert at grad_accum=1, but measure it).
# 2. Serving latency/throughput at canonical scale on the chip.
set -x
cd /root/repo
python bench.py
python baselines/serve_bench.py --rows 512 --concurrency 1,2,4,8
