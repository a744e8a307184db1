#!/bin/bash
# Round-3 catch-all (chains after r3n): sweep up every at-scale stage the
# Aug 17-18 axon outage may have cost, by checking each training log for
# the completion footer and re-running only the incomplete ones. Three
# passes, so a stage that exhausts its retries during a lingering partial
# outage gets another shot once the chip is stable.
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r3o
queue_wait_for r3n

T() {  # train stage: T <log> <experiment> <model> [extra args...]
  local log=$1 exp=$2 model=$3; shift 3
  run_if_incomplete "experiments/log/$log" \
    python -m msmp_pde_tpu.training.train --experiment="$exp" \
    --model="$model" --num_epochs=20 --batch_size=16 "$@"
}

for pass in 1 2 3; do
  echo "=== catch-all pass $pass ==="
  # 2D ablation ladder + remaining 2D variants (r3i/r3j/r3n)
  T train_MSWG3_MPPDE2D.log     MSWG3 MP-PDE2D
  T train_MSWG3_Gated2D.log     MSWG3 Gated2D
  T train_MSWG3_LSTMGated2D.log MSWG3 LSTMGated2D
  T train_MSWG_FNO2D.log        MSWG  FNO2D
  T train_MSWG3_MSGMP2D.log     MSWG3 MSGMP-PDE2D
  T train_MSWG3_SaveMSMP2D.log  MSWG3 SaveMSMP-PDE2D
  T train_MSWG3_LEM2D.log       MSWG3 LEM2D
  T train_MSWG3_LSTM2D.log      MSWG3 LSTM2D
  # seed-1 E1 ladder (r3l) + the E1 LSTM rerun (r3m)
  T train_E1_Gated_s1.log       E1 Gated --seed=1
  T train_E1_LSTMGated_s1.log   E1 LSTMGated --seed=1
  T train_E1_MSMP_s1.log        E1 MSMP-PDE --seed=1
  T train_E1_MPPDE_s1.log       E1 MP-PDE --seed=1
  T train_E1_LSTM.log           E1 LSTM
  # closing bench (r3j) — rerun until it emits its JSON line
  if ! grep -q '"metric"' experiments/log/bench_r3_final.log 2>/dev/null; then
    run experiments/log/bench_r3_final.log python bench.py
  fi
done
echo "R3O COMPLETE"
