#!/bin/bash
# Round-2 validation queue: full-scale training runs for the TaskIDs that
# have no validated run yet (VERDICT.md item 4). Runs serially on the one
# TPU chip; each run logs to experiments/log/ via --log=True.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

run() {
  echo "=== $(date +%H:%M:%S) START: $* ==="
  python -m msmp_pde_tpu.training.train "$@" --log=True
  echo "=== $(date +%H:%M:%S) DONE: $* (exit $?) ==="
}

run --experiment=WE1 --model=MSMP-PDE --num_epochs=20 --batch_size=16
run --experiment=KF  --model=MSMP-PDE --num_epochs=20 --batch_size=16
run --experiment=E3  --model=MSMP-PDE --num_epochs=20 --batch_size=16
run --experiment=MSWG --model=MSMP-PDE2D --num_epochs=20 --batch_size=16
# kdv: resume the round-1 checkpoint (epoch 0-9 done, 25.3% test) to 20 epochs
run --experiment=kdv --model=MSMP-PDE --num_epochs=20 --batch_size=16 \
    --resume=models/MSMP-PDE_CE_kdv_xresolution100-200_n3_tw25_unrolling1_time8161422
echo "QUEUE COMPLETE"
# appended: accuracy north-star cross-check — train the flagship on the
# TORCH-REFERENCE-generated E1 dataset (experiments/torchref_e1.py output)
run --experiment=E1 --model=MSMP-PDE --num_epochs=20 --batch_size=16 \
    --data_dir=data_torchref/data
echo "QUEUE R2B COMPLETE"
