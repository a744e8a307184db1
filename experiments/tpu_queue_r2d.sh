#!/bin/bash
# Round-2d TPU queue: reruns the datagens that failed in r2c (the chip was
# still held by the A/B bench when r2c started) and the trainings that
# depend on them. Waits for r2c to drain first; retries each datagen up to
# 3x in case of transient chip contention.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

echo "=== $(date +%H:%M:%S) waiting for r2c queue to drain ==="
while ! grep -q "QUEUE R2C COMPLETE" experiments/log/tpu_queue_r2c.log; do
  sleep 60
done
echo "=== $(date +%H:%M:%S) r2c drained ==="

# Mosaic-lowering smoke test of the rewritten fused MP layer (972e9d0)
# before any training depends on it. Retries cover chip-release races.
for attempt in 1 2 3; do
  echo "=== $(date +%H:%M:%S) SMOKE mp_pallas (attempt $attempt) ==="
  timeout 900 python experiments/smoke_mp_pallas_tpu.py \
    > experiments/log/smoke_mp_pallas.log 2>&1
  rc=$?
  echo "=== $(date +%H:%M:%S) SMOKE exit $rc ==="
  if [ $rc -eq 0 ]; then break; fi
  sleep 30
done
if [ $rc -ne 0 ]; then
  echo "SMOKE FAILED — trainings would fall back needed; continuing anyway"
fi

gen() {
  exp=$1; shift
  for attempt in 1 2 3; do
    echo "=== $(date +%H:%M:%S) DATAGEN $exp (attempt $attempt) ==="
    timeout 7200 python -m msmp_pde_tpu.datagen.generate --experiment=$exp \
      --train_samples=2048 --valid_samples=128 --test_samples=128 \
      --batch_size=16 --platform=tpu --dtype=float32 "$@" \
      > experiments/log/datagen_${exp}.log 2>&1
    rc=$?
    echo "=== $(date +%H:%M:%S) DATAGEN $exp exit $rc ==="
    if [ $rc -eq 0 ]; then break; fi
    sleep 30
  done
}

run() {
  echo "=== $(date +%H:%M:%S) TRAIN: $* ==="
  timeout 7200 python -m msmp_pde_tpu.training.train "$@" --log=True
  echo "=== $(date +%H:%M:%S) TRAIN done (exit $?): $* ==="
}

gen MSWG
gen KF
gen kdv --chunk=32
gen E3 --chunk=32

run --experiment=KF  --model=MSMP-PDE --num_epochs=20 --batch_size=16
run --experiment=E3  --model=MSMP-PDE --num_epochs=20 --batch_size=16
run --experiment=MSWG --model=MSMP-PDE2D --num_epochs=20 --batch_size=16
run --experiment=kdv --model=MSMP-PDE --num_epochs=30 --batch_size=16
echo "TPU QUEUE R2D COMPLETE"
