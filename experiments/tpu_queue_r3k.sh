#!/bin/bash
# Round-3 queue K (chains after r3j): rerun FNO2DPU on RPU with a larger
# timeout — the r3h attempt was killed by `timeout 7200` at epoch 15/20
# (the unstructured interp1d pre/post stages make it ~8 min/epoch, the
# slowest model in the registry).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo $$ > /tmp/tpu_queue_r3k.pid

while [ -f /tmp/tpu_queue_r3j.pid ] && kill -0 "$(cat /tmp/tpu_queue_r3j.pid)" 2>/dev/null; do
  sleep 60
done

run() {
  log=$1; shift
  for attempt in 1 2 3 4 5 6 7 8 9 10; do
    echo "=== $(date +%H:%M:%S) RUN: $* ==="
    timeout 14400 "$@" > "$log" 2>&1
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

echo "R3K COMPLETE"
