#!/bin/bash
# Round-3 queue M (chains after r3l): rerun E1 LSTM — the r3h attempt hung
# in a dead tunnel RPC mid-epoch-12 (all threads futex-blocked, no log
# writes for 45 min) and was killed by PID. Reuses the same log name so
# collect_results.py harvests the row.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo $$ > /tmp/tpu_queue_r3m.pid

while [ -f /tmp/tpu_queue_r3l.pid ] && kill -0 "$(cat /tmp/tpu_queue_r3l.pid)" 2>/dev/null; do
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

run experiments/log/train_E1_LSTM.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=LSTM \
  --num_epochs=20 --batch_size=16

echo "R3M COMPLETE"
