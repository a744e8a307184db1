#!/bin/bash
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
if [ -f /tmp/tpu_queue_n.pid ]; then
  while kill -0 "$(cat /tmp/tpu_queue_n.pid)" 2>/dev/null; do sleep 60; done
fi
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
run experiments/log/train_E1_MPPDE.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=MP-PDE \
  --num_epochs=20 --batch_size=16
run experiments/log/train_MSWG3_GLEM.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG3 --model=GLEMGated2D \
  --num_epochs=20 --batch_size=16
echo "R2O COMPLETE"
