#!/bin/bash
# Round-4 queue B (chained after r4a): perf A/B for VERDICT #3 — the LEM
# input-projection layout (hoisted [T,N,4H] HBM intermediate vs in-step
# fused projection, experiments/bench_lem_layout.py). If nohoist wins,
# models/lem.py's auto path is flipped in a follow-up commit and bench.py
# recaptured.
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r4b
queue_wait_for r4a

gate() {
  while true; do
    if timeout 1800 python - <<'EOF' 2>&1 | grep -q BACKEND_UP
import jax
print("BACKEND_UP", jax.devices())
EOF
    then
      echo "=== $(date +%H:%M:%S) backend gate: UP ==="
      return 0
    fi
    echo "=== $(date +%H:%M:%S) backend gate: still down ==="
    sleep 30
  done
}

gate
if ! grep -q "BEST:" experiments/log/bench_lem_layout.log 2>/dev/null; then
  run experiments/log/bench_lem_layout.log python experiments/bench_lem_layout.py
fi
echo "R4B COMPLETE"
