#!/bin/bash
# Round-2l TPU queue: runs after r2k drains.
# kdv with a schedule that fits 30 epochs (--milestones 1 12 20 26): the
# reference schedule freezes the LR at 0.4^4*lr after epoch 15, which is
# where the 30-epoch reference-schedule run plateaus (~22%).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

if [ -f /tmp/tpu_queue_k.pid ]; then
  while kill -0 "$(cat /tmp/tpu_queue_k.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%H:%M:%S) r2k drained; starting r2l ==="

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

tpu_retry experiments/log/train_kdv_long.log \
  python -m msmp_pde_tpu.training.train --experiment=kdv --model=MSMP-PDE \
  --num_epochs=30 --batch_size=16 --milestones 1 12 20 26

echo "TPU QUEUE R2L COMPLETE"
