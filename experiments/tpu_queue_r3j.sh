#!/bin/bash
# Round-3 queue J (chains after r3i): the last two registry names without
# an at-scale row — LEM2D and LSTM2D (non-gated recurrent 2D baselines,
# reference models_gnn2D.py LEM/LSTM variants) on MSWG3 — then a closing
# bench.py run on the freed chip so BENCH reflects the final round-3 tree.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo $$ > /tmp/tpu_queue_r3j.pid

while [ -f /tmp/tpu_queue_r3i.pid ] && kill -0 "$(cat /tmp/tpu_queue_r3i.pid)" 2>/dev/null; do
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

run experiments/log/train_MSWG3_LEM2D.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG3 --model=LEM2D \
  --num_epochs=20 --batch_size=16

run experiments/log/train_MSWG3_LSTM2D.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG3 --model=LSTM2D \
  --num_epochs=20 --batch_size=16

run experiments/log/bench_r3_final.log \
  python bench.py

echo "R3J COMPLETE"
