#!/bin/bash
# Round-2h TPU queue: runs after r2g drains.
# CANCELLED mid-round (replaced by a pass-through): the on-chip A/B showed
# bf16 operands are SLOWER in this kernel (RESULTS.md, 2026-08-17) —
# Mosaic relayout cost of the casts exceeds the saved MXU passes at these
# shapes. Script kept for the record.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

if [ -f /tmp/tpu_queue_g.pid ]; then
  while kill -0 "$(cat /tmp/tpu_queue_g.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%H:%M:%S) r2g drained; starting r2h ==="

tpu_retry() {
  log=$1; shift
  for attempt in $(seq 1 20); do
    echo "=== $(date +%H:%M:%S) RUN (attempt $attempt): $* ==="
    timeout 7200 "$@" > "$log" 2>&1
    rc=$?
    echo "=== $(date +%H:%M:%S) exit $rc: $* ==="
    if [ $rc -eq 0 ]; then return 0; fi
    if ! grep -q "No jellyfish device found\|Unable to initialize backend" "$log"; then
      echo "=== non-TPU-init failure; not retrying ==="
      return $rc
    fi
    sleep 60
  done
  return 1
}

tpu_retry experiments/log/train_E1_bf16.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=MSMP-PDE \
  --num_epochs=20 --batch_size=16 --mp_precision=bfloat16

echo "TPU QUEUE R2H COMPLETE"
