#!/bin/bash
# Round-4 queue E: consolidated, strict-priority replacement for the
# r3r -> r4a -> r4b -> r4c -> r4d chain (retired ~12:15 during the Aug 18
# axon outage — 6+ h gone, so the remaining window gets ONE queue ordered
# by round-4 judge value instead of round-3 leftovers first):
#
#   P0  fresh bench.py capture (VERDICT #1 — BENCH_r04 + first MFU number)
#   P1  the three perf A/Bs (LEM layout, scoped-VMEM blocks, MFU width
#       scaling) — cheap, and they decide the default-flip commits
#   P2  KS at the reference 20-epoch schedule + spectrum eval (VERDICT #4/#8)
#   P3  MSWG3 2D ablation ladder + E1 LSTM (VERDICT #2 outage holes)
#   P4  seed replicates, s1 before s2 (VERDICT #6 error bars)
#   P5  registry-completeness rows, serving bench, TPU interp-eval
#   P6  FNO2DPU tail (longest; already recorded at best-val ep14)
#
# Same idempotency contract as r3r/r4a: every train stage keys on the
# "Elapsed Time" footer, every bench on its output marker, so stages
# finished by the retired chain (or a previous pass) are skipped and the
# script can be re-run safely. Two passes sweep up transient failures.
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r4e

T() {  # train stage: T <log> <experiment> <model> [extra args...]
  local log=$1 exp=$2 model=$3; shift 3
  run_if_incomplete "experiments/log/$log" \
    python -m msmp_pde_tpu.training.train --experiment="$exp" \
    --model="$model" --num_epochs=20 --batch_size=16 "$@"
}

pass() {
  # -- P0: the driver-facing perf record
  if ! grep -q '"backend_down": false' experiments/log/bench_r4.log 2>/dev/null; then
    run experiments/log/bench_r4.log python bench.py
  fi
  # -- P1: perf A/Bs (decisions: lem auto default, vmem budget default)
  if ! grep -q "BEST:" experiments/log/bench_lem_layout.log 2>/dev/null; then
    run experiments/log/bench_lem_layout.log python experiments/bench_lem_layout.py
  fi
  if ! grep -q "BEST:" experiments/log/bench_vmem_budget.log 2>/dev/null; then
    MSMP_PALLAS_VMEM_BUDGET_MB=20 \
    XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
    run experiments/log/bench_vmem_budget.log python experiments/bench_lem_layout.py
  fi
  if ! grep -q "hidden= 512 B= 256" experiments/log/bench_mfu.log 2>/dev/null; then
    run experiments/log/bench_mfu.log python experiments/bench_mfu.py
  fi
  # -- P2: KS at the reference schedule + spectral diagnostics figure
  T train_KS_20ep.log KS MSMP-PDE --short_horizon_windows=2
  ckpt=$(ls -dt models/MSMP-PDE_KS_KS* 2>/dev/null | head -1)
  if [ -n "$ckpt" ] && ! grep -q "ks_spectrum" experiments/log/eval_KS_20ep.log 2>/dev/null; then
    run experiments/log/eval_KS_20ep.log \
      python -m msmp_pde_tpu.training.eval --experiment=KS --model=MSMP-PDE \
      --model_to_test="$ckpt" --short_horizon_windows=2 --ks_spectrum
  fi
  # -- P3: outage holes — 2D ablation ladder + E1 LSTM
  T train_MSWG3_MPPDE2D.log     MSWG3 MP-PDE2D
  T train_MSWG3_Gated2D.log     MSWG3 Gated2D
  T train_MSWG3_LSTMGated2D.log MSWG3 LSTMGated2D
  T train_E1_LSTM.log           E1 LSTM
  # -- P4: seed replicates, one full s1 set before any s2
  T train_E1_MSMP_s1.log        E1 MSMP-PDE --seed=1
  T train_E1_Gated_s1.log       E1 Gated --seed=1
  T train_E1_MPPDE_s1.log       E1 MP-PDE --seed=1
  T train_MSWG3_MSMP2D_s1.log   MSWG3 MSMP-PDE2D --seed=1
  T train_MSWG3_MSG2_s1.log     MSWG3 MSG2-PDE2D --seed=1
  T train_E1_MSMP_s2.log        E1 MSMP-PDE --seed=2
  T train_E1_Gated_s2.log       E1 Gated --seed=2
  T train_E1_MPPDE_s2.log       E1 MP-PDE --seed=2
  T train_MSWG3_MSMP2D_s2.log   MSWG3 MSMP-PDE2D --seed=2
  T train_MSWG3_MSG2_s2.log     MSWG3 MSG2-PDE2D --seed=2
  T train_E1_LSTMGated_s1.log   E1 LSTMGated --seed=1
  # -- P5: registry-completeness rows + serving bench + TPU interp-eval
  T train_MSWG3_LEM2D.log       MSWG3 LEM2D
  T train_MSWG3_LSTM2D.log      MSWG3 LSTM2D
  T train_MSWG_FNO2D.log        MSWG  FNO2D
  T train_MSWG3_MSGMP2D.log     MSWG3 MSGMP-PDE2D
  T train_MSWG3_SaveMSMP2D.log  MSWG3 SaveMSMP-PDE2D
  if ! grep -q '"metric"' experiments/log/bench_serving.log 2>/dev/null; then
    run experiments/log/bench_serving.log python experiments/bench_serving.py
  fi
  if ! grep -q "Interp-back comparison" experiments/log/eval_interp_RPU_tpu.log 2>/dev/null; then
    run experiments/log/eval_interp_RPU_tpu.log \
      python -m msmp_pde_tpu.training.eval_interpolated --experiment=RPU \
      --model=MSMP-PDE2D \
      --model_to_test=models/MSMP-PDE2D_AD_RPU_xresolution100-200_n3_tw25_unrolling1_time81739 \
      --n_more_rollout=2
  fi
  # -- P6: FNO2DPU tail (~8 min/epoch -> 4 h timeout)
  ( TIMEOUT=14400
    run_if_incomplete experiments/log/train_RPU_FNO2DPU.log \
      python -m msmp_pde_tpu.training.train --experiment=RPU --model=FNO2DPU \
      --num_epochs=20 --batch_size=16 )
}

for p in 1 2; do
  echo "=== r4e pass $p ==="
  backend_gate
  pass
done
echo "R4E COMPLETE"
