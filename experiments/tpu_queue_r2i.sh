#!/bin/bash
# Round-2i TPU queue: runs after r2h drains.
# The full RPU interpolated pipeline at scale (reference workflow:
# interpolateDataset.py -> train on *_I.h5 -> eval_interpolated.py):
#   1. regenerate RPU (unstructured LCG grid) at full scale
#   2. re-grid to uniform (data/AD_RPU_I.h5)
#   3. train MSMP-PDE2D on the interpolated dataset
#   4. eval_interpolated: roll out on the uniform grid, interpolate back,
#      L2 on the unstructured grid
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

if [ -f /tmp/tpu_queue_h.pid ]; then
  while kill -0 "$(cat /tmp/tpu_queue_h.pid)" 2>/dev/null; do sleep 60; done
fi
echo "=== $(date +%H:%M:%S) r2h drained; starting r2i ==="

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

tpu_retry experiments/log/datagen_RPU.log \
  python -m msmp_pde_tpu.datagen.generate --experiment=RPU \
  --train_samples=2048 --valid_samples=128 --test_samples=128 \
  --batch_size=16 --platform=tpu --dtype=float32

tpu_retry experiments/log/interp_RPU.log \
  python -m msmp_pde_tpu.data.interpolate --experiment=RPU

tpu_retry experiments/log/train_RPU_I.log \
  python -m msmp_pde_tpu.training.train --experiment=RPU --model=MSMP-PDE2D \
  --data_suffix=_I --num_epochs=20 --batch_size=16

ckpt=$(ls -dt models/MSMP-PDE2D_AD_RPU* 2>/dev/null | head -1)
echo "=== eval_interpolated on $ckpt ==="
tpu_retry experiments/log/eval_interp_RPU.log \
  python -m msmp_pde_tpu.training.eval_interpolated --experiment=RPU \
  --model=MSMP-PDE2D --model_to_test="$ckpt"

echo "TPU QUEUE R2I COMPLETE"
