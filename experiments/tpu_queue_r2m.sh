#!/bin/bash
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
run() {
  log=$1; shift
  for attempt in 1 2 3 4 5; do
    echo "=== $(date +%H:%M:%S) RUN: $* ==="
    timeout 2400 "$@" > "$log" 2>&1 && return 0
    grep -q "No jellyfish device found\|Unable to initialize backend" "$log" || return 1
    sleep 60
  done
}
run experiments/log/train_E1_FNO.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=FNO \
  --num_epochs=20 --batch_size=16
run experiments/log/train_E1_BaseCNN.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=BaseCNN \
  --num_epochs=20 --batch_size=16
ckpt=$(ls -dt models/MSMP-PDE_KF_KF* 2>/dev/null | head -1)
run experiments/log/eval_KF.log \
  python -m msmp_pde_tpu.training.eval --experiment=KF --model=MSMP-PDE \
  --model_to_test="$ckpt"
echo "R2M COMPLETE"
