#!/bin/bash
# Round-2j TPU queue: runs after r2i drains. Full-scale validation of two
# structurally distinct registry variants on E1 (neither ever trained at
# scale): MSGMP-PDE (GLU split decoder, hidden=164) and SaveMSMP-PDE
# (stateful LEM carried across rollout windows).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

if [ -f /tmp/tpu_queue_i.pid ]; then
  while kill -0 "$(cat /tmp/tpu_queue_i.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%H:%M:%S) r2i drained; starting r2j ==="

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

tpu_retry experiments/log/train_E1_MSGMP.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=MSGMP-PDE \
  --num_epochs=20 --batch_size=16

tpu_retry experiments/log/train_E1_SaveMSMP.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=SaveMSMP-PDE \
  --num_epochs=20 --batch_size=16

echo "TPU QUEUE R2J COMPLETE"
