#!/bin/bash
# Round-5 queue: VERDICT r5 priorities first, then the remaining r4g tail.
# Supersedes tpu_queue_r4g.sh (killed at the E1 MP-PDE seed stage; its
# completed logs are skipped by run_if_incomplete markers).
# Order:
#   P0  fresh driver-facing bench with the round-5 cache-first bench.py
#       (also re-captures the datagen sub-bench under the queue-pause
#       window — VERDICT #7 contention provenance)
#   P1  mp_remat at its target shape (hidden=512, VERDICT #3) + the
#       per-component time/traffic breakdown (VERDICT #6)
#   P2  E1 MP-PDE seed replicates (r4g P4 tail) + serving bench
#   KS  cross-data training gate (VERDICT #5): fires once the background
#       torch-reference KS datagen (experiments/torchref_ks.py, 128/16/16,
#       /tmp/ks128_datagen.pid) has delivered; paired with an own-data
#       _s128 control at the SAME sample budget (experiments/make_subset.py)
#   P3  MSWG3 seed replicates (VERDICT #8)
#   P5  registry-completeness rows (r4g)
#   P6  FNO2DPU tail (r4g)
set -u
cd /root/repo
source experiments/queue_lib.sh
mkdir -p experiments/log experiments/artifacts plots /tmp/jaxcache
queue_init r5

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

ks_cross() {  # VERDICT #5 — checked between stages so it fires the first
  # pass the background CPU datagen delivers (not only on the next pass)
  local pid
  pid=$(cat /tmp/ks128_datagen.pid 2>/dev/null || echo 0)
  [ -f data_torchref_ks/data/KS_test_KS.h5 ] || return 0
  kill -0 "$pid" 2>/dev/null && return 0  # still generating
  T train_KS_torchref.log KS MSMP-PDE --short_horizon_windows=2 \
    --data_dir=data_torchref_ks/data
  T train_KS_s128.log KS MSMP-PDE --short_horizon_windows=2 \
    --data_suffix=_s128
  keep experiments/log/train_KS_torchref.log experiments/log/train_KS_s128.log
}

pass() {
  # -- P0: fresh driver-facing bench capture (round-5 provisional-first code)
  if ! grep -q '"backend_down": false' experiments/log/bench_r5.log 2>/dev/null; then
    run experiments/log/bench_r5.log python bench.py
  fi
  keep experiments/log/bench_r5.log experiments/bench_cache.json
  # -- P1: mp_remat at hidden=512 + component time/traffic breakdown
  if ! grep -q 'hidden= 512 B= 256' experiments/log/bench_mfu_remat.log 2>/dev/null; then
    run experiments/log/bench_mfu_remat.log \
      python experiments/bench_mfu.py --mp_remat
  fi
  if ! grep -q 'window slicing' experiments/log/bench_components_r5.log 2>/dev/null; then
    run experiments/log/bench_components_r5.log \
      python experiments/bench_components.py
  fi
  keep experiments/log/bench_mfu_remat.log \
       experiments/log/bench_components_r5.log
  # -- P2: E1 MP-PDE seed replicates (r4g P4 tail)
  T train_E1_MPPDE_s0.log E1 MP-PDE --seed=0
  T train_E1_MPPDE_s1.log E1 MP-PDE --seed=1
  T train_E1_MPPDE_s2.log E1 MP-PDE --seed=2
  keep experiments/log/train_E1_MPPDE_s0.log \
       experiments/log/train_E1_MPPDE_s1.log \
       experiments/log/train_E1_MPPDE_s2.log
  if ! grep -q '"metric"' experiments/log/bench_serving.log 2>/dev/null \
     && ls models/MSMP-PDE_CE_E1_* >/dev/null 2>&1; then
    run experiments/log/bench_serving.log python experiments/bench_serving.py
  fi
  keep experiments/log/bench_serving.log
  ks_cross
  # -- P3: MSWG3 seed replicates (VERDICT #8)
  T train_MSWG3_MSMP2D_s0.log   MSWG3 MSMP-PDE2D --seed=0
  T train_MSWG3_MSMP2D_s1.log   MSWG3 MSMP-PDE2D --seed=1
  T train_MSWG3_MSMP2D_s2.log   MSWG3 MSMP-PDE2D --seed=2
  T train_MSWG3_MSG2_s0.log     MSWG3 MSG2-PDE2D --seed=0
  T train_MSWG3_MSG2_s1.log     MSWG3 MSG2-PDE2D --seed=1
  T train_MSWG3_MSG2_s2.log     MSWG3 MSG2-PDE2D --seed=2
  keep experiments/log/train_MSWG3_MSMP2D_s0.log \
       experiments/log/train_MSWG3_MSMP2D_s1.log \
       experiments/log/train_MSWG3_MSMP2D_s2.log \
       experiments/log/train_MSWG3_MSG2_s0.log \
       experiments/log/train_MSWG3_MSG2_s1.log \
       experiments/log/train_MSWG3_MSG2_s2.log
  ks_cross
  # -- P5: registry-completeness rows (r4g)
  gen MSWG
  T train_MSWG3_LEM2D.log       MSWG3 LEM2D
  T train_MSWG3_LSTM2D.log      MSWG3 LSTM2D
  T train_MSWG_FNO2D.log        MSWG  FNO2D
  T train_MSWG3_MSGMP2D.log     MSWG3 MSGMP-PDE2D
  T train_MSWG3_SaveMSMP2D.log  MSWG3 SaveMSMP-PDE2D
  T train_E1_LSTMGated_s1.log   E1 LSTMGated --seed=1
  keep experiments/log/train_MSWG3_LEM2D.log \
       experiments/log/train_MSWG3_LSTM2D.log \
       experiments/log/train_MSWG_FNO2D.log \
       experiments/log/train_MSWG3_MSGMP2D.log \
       experiments/log/train_MSWG3_SaveMSMP2D.log \
       experiments/log/train_E1_LSTMGated_s1.log
  ks_cross
  # -- P6: FNO2DPU tail (~8 min/epoch -> 4 h timeout)
  ( TIMEOUT=14400
    run_if_incomplete experiments/log/train_RPU_FNO2DPU.log \
      python -m msmp_pde_tpu.training.train --experiment=RPU --model=FNO2DPU \
      --num_epochs=20 --batch_size=16 )
  keep experiments/log/train_RPU_FNO2DPU.log
}

for p in 1 2 3; do
  echo "=== r5 pass $p ==="
  backend_gate
  pass
done
echo "R5 COMPLETE"
