#!/bin/bash
# Round-2k TPU queue: runs after r2j drains. Restores the KS dataset
# (lost with the container scratch disk) so the KS energy-spectrum
# cross-check test (tests/test_interchange.py) has both sides present.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

if [ -f /tmp/tpu_queue_j.pid ]; then
  while kill -0 "$(cat /tmp/tpu_queue_j.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%H:%M:%S) r2j drained; starting r2k ==="

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

tpu_retry experiments/log/datagen_KS.log \
  python -m msmp_pde_tpu.datagen.generate --experiment=KS \
  --train_samples=2048 --valid_samples=128 --test_samples=128 \
  --batch_size=16 --platform=tpu --dtype=float32

echo "TPU QUEUE R2K COMPLETE"
