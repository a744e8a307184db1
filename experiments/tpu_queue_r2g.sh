#!/bin/bash
# Round-2g TPU queue: runs after r2f drains.
#  1. Train MSMP-PDE on the torch-reference-generated E1 dataset
#     (data_torchref/data, per-mode layout) — the direct accuracy
#     cross-check: same model/config, reference's own data.
#  2. Regenerate MSWG3 (lost with the container scratch disk) and run the
#     cross-validation CLI at full scale (first-ever CV validation run).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

# wait for the r2f queue to release the chip
if [ -f /tmp/tpu_queue_f.pid ]; then
  while kill -0 "$(cat /tmp/tpu_queue_f.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%H:%M:%S) r2f drained; starting r2g ==="

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

tpu_retry experiments/log/train_E1_torchref.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=MSMP-PDE \
  --num_epochs=20 --batch_size=16 --data_dir=data_torchref/data

tpu_retry experiments/log/datagen_MSWG3.log \
  python -m msmp_pde_tpu.datagen.generate --experiment=MSWG3 \
  --train_samples=2048 --valid_samples=128 --test_samples=128 \
  --batch_size=16 --platform=tpu --dtype=float32

tpu_retry experiments/log/cv_MSWG3.log \
  python -m msmp_pde_tpu.training.cv --experiment=MSWG3 --model=MSMP-PDE2D \
  --num_epochs=10 --batch_size=16 --rep=0

echo "TPU QUEUE R2G COMPLETE"
