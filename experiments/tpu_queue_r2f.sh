#!/bin/bash
# Round-2f TPU mega-queue (replaces r2d/r2e): all remaining datagens,
# validation trainings, and the WE-family runs, serial on the one chip.
#
# The axon tunnel takes several minutes to release the chip after a heavy
# TPU process exits ("No jellyfish device found" on re-init), so every
# stage retries on TPU-init failure with 60 s spacing for up to 20 min.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

tpu_retry() {
  # tpu_retry <logfile> <cmd...>: run cmd, retrying only when the failure
  # is a TPU-init race (chip not yet released).
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

gen() {
  exp=$1; shift
  tpu_retry experiments/log/datagen_${exp}.log \
    python -m msmp_pde_tpu.datagen.generate --experiment=$exp \
    --train_samples=2048 --valid_samples=128 --test_samples=128 \
    --batch_size=16 --platform=tpu --dtype=float32 "$@"
}

train() {
  exp=$1; model=$2; epochs=$3
  tpu_retry experiments/log/train_${exp}.log \
    python -m msmp_pde_tpu.training.train --experiment=$exp --model=$model \
    --num_epochs=$epochs --batch_size=16
}

gen MSWG
gen KF
gen kdv --chunk=32
gen E3 --chunk=32

train KF MSMP-PDE 20
train E3 MSMP-PDE 20
train MSWG MSMP-PDE2D 20
train kdv MSMP-PDE 30

tpu_retry experiments/log/bench_pallas_r2e.log \
  python experiments/bench_pallas.py

train WE2 MSMP-PDE 20
train WE3 MSMP-PDE 20
echo "TPU QUEUE R2F COMPLETE"
