#!/bin/bash
# Round-3 queue B (chains after r3a):
#  1. A/B the fused gated-pair Pallas kernel (VERDICT #4)
#  2. our-side 1-epoch E1 run on the torch-shim head-to-head dataset (VERDICT #2)
#  3. KS 5-epoch train + short-horizon eval (VERDICT #8)
#  4. MSWG3 cross-train on torch-reference-generated data (VERDICT #6)
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo $$ > /tmp/tpu_queue_r3b.pid

# wait for r3a to drain
while [ -f /tmp/tpu_queue_r3a.pid ] && kill -0 "$(cat /tmp/tpu_queue_r3a.pid)" 2>/dev/null; do
  sleep 60
done

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

run experiments/log/bench_pallas_r3.log \
  python experiments/bench_pallas.py

run experiments/log/train_E1_h2h_ours.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=MSMP-PDE \
  --num_epochs=1 --batch_size=16 --data_dir=data_torchref_small/data

run experiments/log/train_KS_r3.log \
  python -m msmp_pde_tpu.training.train --experiment=KS --model=MSMP-PDE \
  --num_epochs=5 --batch_size=16

ckpt=$(ls -dt models/MSMP-PDE_KS_KS* 2>/dev/null | head -1)
run experiments/log/eval_KS_short.log \
  python -m msmp_pde_tpu.training.eval --experiment=KS --model=MSMP-PDE \
  --model_to_test="$ckpt" --short_horizon_windows=2

# wait for the torch-reference MSWG3 dataset (background CPU chain)
for i in $(seq 1 720); do
  grep -q "MSWG3 test:" /tmp/trg_mswg3.log 2>/dev/null && break
  sleep 60
done
run experiments/log/train_MSWG3_torchref.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG3 --model=MSMP-PDE2D \
  --num_epochs=20 --batch_size=16 --data_dir=data_torchref/data

echo "R3B COMPLETE"
