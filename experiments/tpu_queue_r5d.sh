#!/bin/bash
# Round-5d: restore the two datasets the Aug-18 re-image wiped that no
# later queue regenerated (kdv, E3 — their master-table rows were static
# carries so r4f skipped them), then run the r5b stages that failed on
# the missing files (kdv Gated tw=50, E3 Gated).
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r5d
queue_wait_for r5c
mkdir -p experiments/log experiments/artifacts /tmp/jaxcache

keep() {
  local f
  for f in "$@"; do
    [ -f "$f" ] && cp -f "$f" experiments/artifacts/ 2>/dev/null
  done
  return 0
}

gen() {
  local exp=$1; shift
  if [ -f "data/.stamp_$exp" ]; then
    echo "=== skip datagen (stamped): $exp ==="
    return 0
  fi
  run "experiments/log/datagen_${exp}.log" \
    python -m msmp_pde_tpu.datagen.generate --experiment="$exp" \
    --train_samples=2048 --valid_samples=128 --test_samples=128 \
    --batch_size=16 --platform=tpu --dtype=float32 "$@" \
    && touch "data/.stamp_$exp"
}

T() {
  local log=$1 exp=$2 model=$3; shift 3
  run_if_incomplete "experiments/log/$log" \
    python -m msmp_pde_tpu.training.train --experiment="$exp" \
    --model="$model" --num_epochs=20 --batch_size=16 "$@"
}

for p in 1 2; do
  echo "=== r5d pass $p ==="
  backend_gate
  gen kdv
  gen E3
  T train_kdv_Gated_tw50.log kdv Gated --time_window=50
  T train_E3_Gated.log E3 Gated
  keep experiments/log/train_kdv_Gated_tw50.log \
       experiments/log/train_E3_Gated.log \
       experiments/log/datagen_kdv.log experiments/log/datagen_E3.log
done
echo "R5D COMPLETE"
