#!/bin/bash
# Round-3 queue A: finish the MP-vs-MSMP ablation ladder (VERDICT #1)
# and bound the kdv claim with cross-model runs (VERDICT #7).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo $$ > /tmp/tpu_queue_r3a.pid
run() {
  log=$1; shift
  for attempt in 1 2 3 4 5 6 7 8 9 10; do
    echo "=== $(date +%H:%M:%S) RUN: $* ==="
    timeout 7200 "$@" > "$log" 2>&1
    rc=$?
    echo "=== $(date +%H:%M:%S) exit $rc ==="
    [ $rc -eq 0 ] && return 0
    grep -q "No jellyfish device found\|Unable to initialize backend" "$log" || return 1
    sleep 60
  done
}
run experiments/log/train_MSWG3_GLEM.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG3 --model=GLEMGated2D \
  --num_epochs=20 --batch_size=16
run experiments/log/train_E1_Gated.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=Gated \
  --num_epochs=20 --batch_size=16
run experiments/log/train_E1_LSTMGated.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=LSTMGated \
  --num_epochs=20 --batch_size=16
run experiments/log/train_kdv_FNO.log \
  python -m msmp_pde_tpu.training.train --experiment=kdv --model=FNO \
  --num_epochs=20 --batch_size=16
run experiments/log/train_kdv_BaseCNN.log \
  python -m msmp_pde_tpu.training.train --experiment=kdv --model=BaseCNN \
  --num_epochs=20 --batch_size=16
run experiments/log/train_kdv_tw50.log \
  python -m msmp_pde_tpu.training.train --experiment=kdv --model=MSMP-PDE \
  --num_epochs=20 --batch_size=16 --time_window=50
echo "R3A COMPLETE"
