#!/bin/bash
# Round-2c TPU queue: regenerate the heavy datasets wiped by the container
# reset (TPU f32 datagen for the dispersive CE family + KF + MSWG), then run
# the full-scale validation trainings that VERDICT.md item 4 asks for.
# Serial: there is exactly one chip.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

gen() {
  exp=$1; shift
  echo "=== $(date +%H:%M:%S) DATAGEN $exp ==="
  timeout 7200 python -m msmp_pde_tpu.datagen.generate --experiment=$exp \
    --train_samples=2048 --valid_samples=128 --test_samples=128 \
    --batch_size=16 --platform=tpu --dtype=float32 "$@" \
    > experiments/log/datagen_${exp}.log 2>&1
  echo "=== $(date +%H:%M:%S) DATAGEN $exp exit $? ==="
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

# Accuracy north star: train the flagship on the TORCH-REFERENCE-generated
# E1 dataset (produced by experiments/cpu_queue_r2c.sh).
run --experiment=E1 --model=MSMP-PDE --num_epochs=20 --batch_size=16 \
    --data_dir=data_torchref/data
run --experiment=KF  --model=MSMP-PDE --num_epochs=20 --batch_size=16
run --experiment=E3  --model=MSMP-PDE --num_epochs=20 --batch_size=16
run --experiment=MSWG --model=MSMP-PDE2D --num_epochs=20 --batch_size=16
run --experiment=kdv --model=MSMP-PDE --num_epochs=30 --batch_size=16
echo "TPU QUEUE R2C COMPLETE"
