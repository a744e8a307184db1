#!/bin/bash
# Round-4 queue C (chained after r4b): scoped-VMEM block-size A/B.
# Raises the Pallas block budget (MSMP_PALLAS_VMEM_BUDGET_MB) together
# with XLA's scoped-vmem compile limit so _pick_bb chooses larger batch
# blocks (fewer sequential grid steps per kernel); compares the production
# fused pass against the default 10 MB/16 MB configuration measured in r4b.
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r4c
queue_wait_for r4b

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
if ! grep -q "BEST:" experiments/log/bench_vmem_budget.log 2>/dev/null; then
  MSMP_PALLAS_VMEM_BUDGET_MB=20 \
  XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
  run experiments/log/bench_vmem_budget.log python experiments/bench_lem_layout.py
fi
echo "R4C COMPLETE"
