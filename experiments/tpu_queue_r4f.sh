#!/bin/bash
# Round-4 queue F: RE-IMAGE RECOVERY. The host was re-imaged mid-round
# (boot 18:29 Aug 18): every gitignored artifact — data/*.h5, models/
# checkpoints, experiments/log/ — was wiped and the running r4e queue
# died. The TPU backend is UP for the first time this round, so this
# queue (a) regenerates the datasets its stages need, on-chip, and
# (b) re-runs the round-4 priority ladder from r4e:
#
#   P0  fresh bench.py capture (BENCH_r04 + the first MFU number)
#   P1  perf A/Bs (LEM layout, scoped-VMEM blocks, MFU width scaling)
#   D1  datagen: E1, KS, MSWG3, RPU (+ RPU re-grid)  [TPU f32]
#   P2  KS at the reference 20-epoch schedule + spectrum eval
#   P3  MSWG3 2D ablation ladder + E1 LSTM (round-3 outage holes)
#   P3b RPU interpolated pipeline train + full interp-eval battery
#       (re-creates the checkpoint the wiped r4 CPU validation used)
#   P4  seed replicates — seeds 0/1/2 ALL on the freshly generated data
#       (the old seed-0 rows were trained on the wiped CPU-f64 E1 data;
#       mean±std must not mix data provenance)
#   P5  registry-completeness rows + serving bench
#   P6  FNO2DPU tail
#
# Idempotency: datagen stages stamp data/.stamp_<exp> on success; train
# stages key on the "Elapsed Time" footer; benches on output markers.
# Two passes sweep up transient chip failures.
set -u
cd /root/repo
source experiments/queue_lib.sh
mkdir -p experiments/log experiments/artifacts /tmp/jaxcache
queue_init r4f

gen() {  # gen <experiment> [extra args...]
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

T() {  # T <log> <experiment> <model> [extra args...]
  local log=$1 exp=$2 model=$3; shift 3
  run_if_incomplete "experiments/log/$log" \
    python -m msmp_pde_tpu.training.train --experiment="$exp" \
    --model="$model" --num_epochs=20 --batch_size=16 "$@"
}

keep() {  # copy evidence into the committed artifacts dir (re-image-proof)
  local f
  for f in "$@"; do
    [ -f "$f" ] && cp -f "$f" experiments/artifacts/ 2>/dev/null
  done
  return 0
}

pass() {
  # -- P0: the driver-facing perf record (cache feeds BENCH_r04)
  if ! grep -q '"backend_down": false' experiments/log/bench_r4.log 2>/dev/null; then
    run experiments/log/bench_r4.log python bench.py
  fi
  keep experiments/log/bench_r4.log experiments/bench_cache.json
  # -- P1: perf A/Bs (decide lem default + vmem budget default)
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
  keep experiments/log/bench_lem_layout.log experiments/log/bench_vmem_budget.log \
       experiments/log/bench_mfu.log
  # -- D1: datasets the ladder needs (wiped by the re-image)
  gen E1
  gen KS
  gen MSWG3
  gen RPU
  if [ -f data/.stamp_RPU ] && [ ! -f data/AD_RPU_I.h5 ]; then
    run experiments/log/interp_RPU.log \
      python -m msmp_pde_tpu.data.interpolate --experiment=RPU
  fi
  # -- P2: KS at the reference schedule + spectral diagnostics figure
  T train_KS_20ep.log KS MSMP-PDE --short_horizon_windows=2
  local ckpt
  ckpt=$(ls -dt models/MSMP-PDE_KS_KS* 2>/dev/null | head -1)
  if [ -n "$ckpt" ] && ! grep -q "ks_spectrum" experiments/log/eval_KS_20ep.log 2>/dev/null; then
    run experiments/log/eval_KS_20ep.log \
      python -m msmp_pde_tpu.training.eval --experiment=KS --model=MSMP-PDE \
      --model_to_test="$ckpt" --short_horizon_windows=2 --ks_spectrum
  fi
  keep experiments/log/train_KS_20ep.log experiments/log/eval_KS_20ep.log \
       plots/ks_spectrum.png
  # -- P3: outage holes — 2D ablation ladder + E1 LSTM
  T train_MSWG3_MPPDE2D.log     MSWG3 MP-PDE2D
  T train_MSWG3_Gated2D.log     MSWG3 Gated2D
  T train_MSWG3_LSTMGated2D.log MSWG3 LSTMGated2D
  T train_E1_LSTM.log           E1 LSTM
  keep experiments/log/train_MSWG3_MPPDE2D.log experiments/log/train_MSWG3_Gated2D.log \
       experiments/log/train_MSWG3_LSTMGated2D.log experiments/log/train_E1_LSTM.log
  # -- P3b: interpolated pipeline — retrain the RPU _I checkpoint the
  #         re-image deleted, then the full interp-eval battery on-chip
  T train_RPU_I.log RPU MSMP-PDE2D --data_suffix=_I
  ckpt=$(ls -dt models/MSMP-PDE2D_AD_RPU* 2>/dev/null | head -1)
  if [ -n "$ckpt" ] && ! grep -q "Interp-back comparison" experiments/log/eval_interp_RPU_tpu.log 2>/dev/null; then
    run experiments/log/eval_interp_RPU_tpu.log \
      python -m msmp_pde_tpu.training.eval_interpolated --experiment=RPU \
      --model=MSMP-PDE2D --model_to_test="$ckpt" --n_more_rollout=2
  fi
  keep experiments/log/train_RPU_I.log experiments/log/eval_interp_RPU_tpu.log
  # -- P4: seed replicates (s0 reruns included: fresh data provenance)
  T train_E1_MSMP_s0.log        E1 MSMP-PDE --seed=0
  T train_E1_MSMP_s1.log        E1 MSMP-PDE --seed=1
  T train_E1_MSMP_s2.log        E1 MSMP-PDE --seed=2
  T train_E1_Gated_s0.log       E1 Gated --seed=0
  T train_E1_Gated_s1.log       E1 Gated --seed=1
  T train_E1_Gated_s2.log       E1 Gated --seed=2
  T train_E1_MPPDE_s0.log       E1 MP-PDE --seed=0
  T train_E1_MPPDE_s1.log       E1 MP-PDE --seed=1
  T train_E1_MPPDE_s2.log       E1 MP-PDE --seed=2
  keep experiments/log/train_E1_MSMP_s0.log experiments/log/train_E1_MSMP_s1.log \
       experiments/log/train_E1_MSMP_s2.log experiments/log/train_E1_Gated_s0.log \
       experiments/log/train_E1_Gated_s1.log experiments/log/train_E1_Gated_s2.log \
       experiments/log/train_E1_MPPDE_s0.log experiments/log/train_E1_MPPDE_s1.log \
       experiments/log/train_E1_MPPDE_s2.log
  # serving bench as soon as an E1 MSMP checkpoint exists
  if ! grep -q '"metric"' experiments/log/bench_serving.log 2>/dev/null \
     && ls models/MSMP-PDE_CE_E1_* >/dev/null 2>&1; then
    run experiments/log/bench_serving.log python experiments/bench_serving.py
  fi
  T train_MSWG3_MSMP2D_s0.log   MSWG3 MSMP-PDE2D --seed=0
  T train_MSWG3_MSMP2D_s1.log   MSWG3 MSMP-PDE2D --seed=1
  T train_MSWG3_MSMP2D_s2.log   MSWG3 MSMP-PDE2D --seed=2
  T train_MSWG3_MSG2_s0.log     MSWG3 MSG2-PDE2D --seed=0
  T train_MSWG3_MSG2_s1.log     MSWG3 MSG2-PDE2D --seed=1
  T train_MSWG3_MSG2_s2.log     MSWG3 MSG2-PDE2D --seed=2
  keep experiments/log/train_MSWG3_MSMP2D_s0.log experiments/log/train_MSWG3_MSMP2D_s1.log \
       experiments/log/train_MSWG3_MSMP2D_s2.log experiments/log/train_MSWG3_MSG2_s0.log \
       experiments/log/train_MSWG3_MSG2_s1.log experiments/log/train_MSWG3_MSG2_s2.log \
       experiments/log/bench_serving.log
  # -- P5: registry-completeness rows
  gen MSWG
  T train_MSWG3_LEM2D.log       MSWG3 LEM2D
  T train_MSWG3_LSTM2D.log      MSWG3 LSTM2D
  T train_MSWG_FNO2D.log        MSWG  FNO2D
  T train_MSWG3_MSGMP2D.log     MSWG3 MSGMP-PDE2D
  T train_MSWG3_SaveMSMP2D.log  MSWG3 SaveMSMP-PDE2D
  T train_E1_LSTMGated_s1.log   E1 LSTMGated --seed=1
  keep experiments/log/train_MSWG3_LEM2D.log experiments/log/train_MSWG3_LSTM2D.log \
       experiments/log/train_MSWG_FNO2D.log experiments/log/train_MSWG3_MSGMP2D.log \
       experiments/log/train_MSWG3_SaveMSMP2D.log experiments/log/train_E1_LSTMGated_s1.log
  # -- P6: FNO2DPU tail (~8 min/epoch -> 4 h timeout)
  ( TIMEOUT=14400
    run_if_incomplete experiments/log/train_RPU_FNO2DPU.log \
      python -m msmp_pde_tpu.training.train --experiment=RPU --model=FNO2DPU \
      --num_epochs=20 --batch_size=16 )
  keep experiments/log/train_RPU_FNO2DPU.log
}

for p in 1 2; do
  echo "=== r4f pass $p ==="
  backend_gate
  pass
done
echo "R4F COMPLETE"
