#!/bin/bash
# Round-2e TPU queue: runs after r2d drains. WE2/WE3 full-scale validation
# (completing the WE family) and a re-bench of the batch-blocked MP kernel.
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
mkdir -p /tmp/jaxcache experiments/log

echo "=== $(date +%H:%M:%S) waiting for r2d queue to drain ==="
while ! grep -q "TPU QUEUE R2D COMPLETE" experiments/log/tpu_queue_r2d.log; do
  sleep 120
done
echo "=== $(date +%H:%M:%S) r2d drained ==="

run() {
  echo "=== $(date +%H:%M:%S) TRAIN: $* ==="
  timeout 7200 python -m msmp_pde_tpu.training.train "$@" --log=True
  echo "=== $(date +%H:%M:%S) TRAIN done (exit $?): $* ==="
}

for attempt in 1 2 3; do
  echo "=== $(date +%H:%M:%S) SMOKE mp_pallas (attempt $attempt) ==="
  timeout 900 python experiments/smoke_mp_pallas_tpu.py \
    > experiments/log/smoke_mp_pallas.log 2>&1
  rc=$?
  echo "=== $(date +%H:%M:%S) SMOKE exit $rc ==="
  if [ $rc -eq 0 ]; then break; fi
  sleep 30
done

echo "=== $(date +%H:%M:%S) re-bench Pallas A/B (batch-blocked kernel) ==="
timeout 2400 python experiments/bench_pallas.py \
  > experiments/log/bench_pallas_r2e.log 2>&1
echo "=== $(date +%H:%M:%S) bench exit $? ==="

run --experiment=WE2 --model=MSMP-PDE --num_epochs=20 --batch_size=16
run --experiment=WE3 --model=MSMP-PDE --num_epochs=20 --batch_size=16
echo "TPU QUEUE R2E COMPLETE"
