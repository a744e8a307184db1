#!/bin/bash
# Round-5b accuracy queue — chained after tpu_queue_r5.sh drains.
# Purpose (RESULTS.md follow-ups, not VERDICT items — those are closed):
#   G   MSWG3 Gated2D seed replicates: the single-seed 3.87% is currently
#       the best MSWG3 number on the board; give it error bars so the
#       "which gate wins on MSWG3" claim is measured, not single-seed.
#   K   gate-only variants on the hardest tasks (kdv tw=50, KS 20-epoch
#       short-horizon, E3): the E1 ablation found gate-only ties or beats
#       the temporal-encoder variants; check whether that transfers.
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r5b
queue_wait_for r5
mkdir -p experiments/log experiments/artifacts /tmp/jaxcache

keep() {
  local f
  for f in "$@"; do
    [ -f "$f" ] && cp -f "$f" experiments/artifacts/ 2>/dev/null
  done
  return 0
}

T() {  # T <log> <experiment> <model> [extra args...]
  local log=$1 exp=$2 model=$3; shift 3
  run_if_incomplete "experiments/log/$log" \
    python -m msmp_pde_tpu.training.train --experiment="$exp" \
    --model="$model" --num_epochs=20 --batch_size=16 "$@"
}

pass() {
  T train_MSWG3_Gated2D_s1.log MSWG3 Gated2D --seed=1
  T train_MSWG3_Gated2D_s2.log MSWG3 Gated2D --seed=2
  keep experiments/log/train_MSWG3_Gated2D_s1.log \
       experiments/log/train_MSWG3_Gated2D_s2.log
  T train_kdv_Gated_tw50.log kdv Gated --time_window=50
  T train_E3_Gated.log E3 Gated
  T train_KS_Gated_20ep.log KS Gated --short_horizon_windows=2
  keep experiments/log/train_kdv_Gated_tw50.log \
       experiments/log/train_E3_Gated.log \
       experiments/log/train_KS_Gated_20ep.log
}

for p in 1 2; do
  echo "=== r5b pass $p ==="
  backend_gate
  pass
done
echo "R5B COMPLETE"
