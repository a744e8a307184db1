#!/bin/bash
# Round-2 queue, part B (WE1 done: 1.46% test rel-L2).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

run() {
  echo "=== $(date +%H:%M:%S) START: $* ==="
  python -m msmp_pde_tpu.training.train "$@" --log=True
  echo "=== $(date +%H:%M:%S) DONE: $* (exit $?) ==="
}

run --experiment=KF  --model=MSMP-PDE --num_epochs=20 --batch_size=16
run --experiment=E3  --model=MSMP-PDE --num_epochs=20 --batch_size=16
run --experiment=MSWG --model=MSMP-PDE2D --num_epochs=20 --batch_size=16
run --experiment=kdv --model=MSMP-PDE --num_epochs=20 --batch_size=16 \
    --resume=models/MSMP-PDE_CE_kdv_xresolution100-200_n3_tw25_unrolling1_time8161422
run --experiment=E1 --model=MSMP-PDE --num_epochs=20 --batch_size=16 \
    --data_dir=data_torchref/data
echo "QUEUE R2B COMPLETE"
