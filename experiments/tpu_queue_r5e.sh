#!/bin/bash
# Round-5e: close the 2D perf gap, then leave the bench cache fresh.
#
# 1. bench_2d — the 2-component gated family (the MSWG3 master-table
#    models) has accuracy rows but no perf row; capture ms/step, MFU,
#    and HBM utilization for the production train pass per 2D model
#    (PERF.md gets a "The 2D step" section from this log).
# 2. A final full bench.py fresh capture with a high budget so the
#    driver-time provisional line carries numbers measured at end-of-
#    round HEAD rather than a mid-round cache.
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r5e
queue_wait_for r5d
mkdir -p experiments/log experiments/artifacts /tmp/jaxcache

keep() {
  local f
  for f in "$@"; do
    [ -f "$f" ] && cp -f "$f" experiments/artifacts/ 2>/dev/null
  done
  return 0
}

bench2d_done() {
  # complete when the last default model printed its row (or FAILED)
  [ -f experiments/log/bench_2d.log ] \
    && grep -Eq "^MP-PDE2D " experiments/log/bench_2d.log
}

for p in 1 2; do
  echo "=== r5e pass $p ==="
  backend_gate
  if bench2d_done; then
    echo "=== skip (complete): bench_2d ==="
  else
    TIMEOUT=3600 run experiments/log/bench_2d.log \
      python experiments/bench_2d.py
  fi
  keep experiments/log/bench_2d.log
done

# Final fresh bench: high budget, uncontended (this queue is the only
# TPU client once r5d is gone; bench won't pause it — the queue is
# bench's own ancestor — so queue_paused_for_measurement stays unset).
# Complete when the log carries a NON-provisional result line: the
# provisional cache echo always prints first, the fresh capture prints
# a second line without that key only when it actually measured.
if ! { [ -f experiments/log/bench_r5e.log ] \
       && grep '"metric"' experiments/log/bench_r5e.log \
          | grep -v '"provisional"' | grep -q .; }; then
  TIMEOUT=2400 MSMP_BENCH_TOTAL_S=1800 run experiments/log/bench_r5e.log \
    python bench.py
fi
keep experiments/log/bench_r5e.log
echo "R5E COMPLETE"
