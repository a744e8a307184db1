#!/bin/bash
# Round-4 queue D (chained after r4c): MFU width/batch scaling.
# PERF.md §4 — scale the production fused pass in hidden width and batch
# to locate where the step migrates from latency-bound to MXU-bound
# (reference config is 0.18% bf16-MFU by construction; this shows the
# framework's compute ceiling is the workload, not the stack).
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r4d
queue_wait_for r4c

backend_gate
if ! grep -q "hidden= 512 B= 256" experiments/log/bench_mfu.log 2>/dev/null; then
  run experiments/log/bench_mfu.log python experiments/bench_mfu.py
fi
echo "R4D COMPLETE"
