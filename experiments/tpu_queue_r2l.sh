#!/bin/bash
# Replacement r2l: MSWG3 regen (von Mises f32 fix) + CV rerun, then kdv-long.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

if [ -f /tmp/tpu_queue_k.pid ]; then
  while kill -0 "$(cat /tmp/tpu_queue_k.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%H:%M:%S) r2k drained; starting r2l (replacement) ==="

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

tpu_retry experiments/log/datagen_MSWG3b.log \
  python -m msmp_pde_tpu.datagen.generate --experiment=MSWG3 \
  --train_samples=2048 --valid_samples=128 --test_samples=128 \
  --batch_size=16 --platform=tpu --dtype=float32

tpu_retry experiments/log/cv_MSWG3b.log \
  python -m msmp_pde_tpu.training.cv --experiment=MSWG3 --model=MSMP-PDE2D \
  --num_epochs=10 --batch_size=16 --rep=0

tpu_retry experiments/log/train_kdv_long.log \
  python -m msmp_pde_tpu.training.train --experiment=kdv --model=MSMP-PDE \
  --num_epochs=30 --batch_size=16 --milestones 1 12 20 26

echo "TPU QUEUE R2L (replacement) COMPLETE"
