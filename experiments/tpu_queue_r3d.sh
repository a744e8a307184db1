#!/bin/bash
# Round-3 queue D (chains after r3c):
#  1. component-level timing of the 2.318 ms step (find next headroom)
#  2. full-scale E1 MSMP-PDE train under the NEW auto (fused pair) config —
#     at-scale accuracy regression for the pair kernel + headline refresh
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo $$ > /tmp/tpu_queue_r3d.pid

while [ -f /tmp/tpu_queue_r3c.pid ] && kill -0 "$(cat /tmp/tpu_queue_r3c.pid)" 2>/dev/null; do
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

run experiments/log/bench_components_r3.log \
  python experiments/bench_components.py

run experiments/log/train_E1_pair.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=MSMP-PDE \
  --num_epochs=20 --batch_size=16

echo "R3D COMPLETE"
