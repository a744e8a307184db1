#!/bin/bash
# Round-4 queue A (chained after r3r): the VERDICT round-4 run list.
#
#   1. KS at the reference schedule (20 epochs, train.py:452-498 defaults)
#      with the per-epoch short-horizon metric (--short_horizon_windows=2),
#      replacing the 5-epoch round-3 row; then the eval battery incl. the
#      KS spectral diagnostics figure (--ks_spectrum -> plots/ks_spectrum.png).
#   2. A fresh bench.py capture (the reworked outage-proof bench: persists
#      experiments/bench_cache.json, reports mfu_pct).
#   3. Seed replicates for the error-bar table: MSWG3 {MSMP-PDE2D,
#      MSG2-PDE2D} seeds 1,2 and E1 {MP-PDE, Gated, MSMP-PDE} seed 2
#      (seed 1 runs in r3r; seed 0 is the recorded master-table row).
#   4. A TPU rerun of the full interpolated-eval battery (CPU numbers are
#      recorded; this adds the on-chip figures at production numerics).
#
# All stages are idempotent (run_if_incomplete on the train footer) and the
# whole queue is gated on a live backend, same as r3r.
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r4a
queue_wait_for r3r

gate() {
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
  # -- 1. KS at the reference 20-epoch schedule + spectrum eval
  T train_KS_20ep.log KS MSMP-PDE --short_horizon_windows=2
  ckpt=$(ls -dt models/MSMP-PDE_KS_KS* 2>/dev/null | head -1)
  if [ -n "$ckpt" ] && ! grep -q "ks_spectrum" experiments/log/eval_KS_20ep.log 2>/dev/null; then
    run experiments/log/eval_KS_20ep.log \
      python -m msmp_pde_tpu.training.eval --experiment=KS --model=MSMP-PDE \
      --model_to_test="$ckpt" --short_horizon_windows=2 --ks_spectrum
  fi
  # -- 2. fresh bench capture (writes experiments/bench_cache.json)
  if ! grep -q '"backend_down": false' experiments/log/bench_r4.log 2>/dev/null; then
    run experiments/log/bench_r4.log python bench.py
  fi
  # -- 3. seed replicates (error bars; VERDICT round-4 item 6)
  T train_MSWG3_MSMP2D_s1.log MSWG3 MSMP-PDE2D --seed=1
  T train_MSWG3_MSG2_s1.log   MSWG3 MSG2-PDE2D --seed=1
  T train_E1_MPPDE_s2.log     E1 MP-PDE --seed=2
  T train_E1_Gated_s2.log     E1 Gated --seed=2
  T train_E1_MSMP_s2.log      E1 MSMP-PDE --seed=2
  T train_MSWG3_MSMP2D_s2.log MSWG3 MSMP-PDE2D --seed=2
  T train_MSWG3_MSG2_s2.log   MSWG3 MSG2-PDE2D --seed=2
  # -- 4. on-chip interpolated-eval battery (figures at TPU numerics)
  if ! grep -q "Interp-back comparison" experiments/log/eval_interp_RPU_tpu.log 2>/dev/null; then
    run experiments/log/eval_interp_RPU_tpu.log \
      python -m msmp_pde_tpu.training.eval_interpolated --experiment=RPU \
      --model=MSMP-PDE2D \
      --model_to_test=models/MSMP-PDE2D_AD_RPU_xresolution100-200_n3_tw25_unrolling1_time81739 \
      --n_more_rollout=2
  fi
}

for p in 1 2; do
  echo "=== r4a pass $p ==="
  gate
  pass
done
echo "R4A COMPLETE"
