#!/bin/bash
# Round-3 queue I (chains after r3h): the 2D ablation ladder on MSWG3 —
# MP-PDE2D (plain MP baseline), Gated2D (sigmoid gate, no temporal
# encoder), LSTMGated2D (gate + LSTM) vs the already-recorded MSMP-PDE2D
# (gate + LEM, 5.37%) — mirroring the 1D ladder in RESULTS.md; then FNO2D
# (unconditioned spectral baseline) on MSWG, and the remaining 2D MP
# variants (MSGMP-PDE2D, SaveMSMP-PDE2D) on MSWG3 as stretch rows.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo $$ > /tmp/tpu_queue_r3i.pid

while [ -f /tmp/tpu_queue_r3h.pid ] && kill -0 "$(cat /tmp/tpu_queue_r3h.pid)" 2>/dev/null; do
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

run experiments/log/train_MSWG3_MPPDE2D.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG3 --model=MP-PDE2D \
  --num_epochs=20 --batch_size=16

run experiments/log/train_MSWG3_Gated2D.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG3 --model=Gated2D \
  --num_epochs=20 --batch_size=16

run experiments/log/train_MSWG3_LSTMGated2D.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG3 --model=LSTMGated2D \
  --num_epochs=20 --batch_size=16

run experiments/log/train_MSWG_FNO2D.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG --model=FNO2D \
  --num_epochs=20 --batch_size=16

run experiments/log/train_MSWG3_MSGMP2D.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG3 --model=MSGMP-PDE2D \
  --num_epochs=20 --batch_size=16

run experiments/log/train_MSWG3_SaveMSMP2D.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG3 --model=SaveMSMP-PDE2D \
  --num_epochs=20 --batch_size=16

echo "R3I COMPLETE"
