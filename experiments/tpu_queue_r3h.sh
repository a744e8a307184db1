#!/bin/bash
# Round-3 queue H (chains after r3g): at-scale rows for remaining baseline
# variants — FNO2DPU (unstructured FNO) on RPU, BaseCNN2D on MSWG,
# LEM and LSTM (non-gated recurrent 1D baselines) on E1.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo $$ > /tmp/tpu_queue_r3h.pid

while [ -f /tmp/tpu_queue_r3g.pid ] && kill -0 "$(cat /tmp/tpu_queue_r3g.pid)" 2>/dev/null; do
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

run experiments/log/train_RPU_FNO2DPU.log \
  python -m msmp_pde_tpu.training.train --experiment=RPU --model=FNO2DPU \
  --num_epochs=20 --batch_size=16

run experiments/log/train_MSWG_BaseCNN2D.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG --model=BaseCNN2D \
  --num_epochs=20 --batch_size=16

run experiments/log/train_E1_LEM.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=LEM \
  --num_epochs=20 --batch_size=16

run experiments/log/train_E1_LSTM.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=LSTM \
  --num_epochs=20 --batch_size=16

echo "R3H COMPLETE"
