#!/bin/bash
# Round-3 queue L (chains after r3k): seed-1 reruns of the E1 ablation
# ladder. RESULTS.md currently attributes the 6.3-6.8% spread within the
# gated family (Gated 6.32 / LSTMGated 6.57 / MSMP-PDE 6.76-6.86) to
# single-seed noise — this queue measures that noise directly by rerunning
# the four ladder models with --seed=1 on the identical on-disk E1 data
# (seed affects init + batch order only; the dataset is fixed).
set -u
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
echo $$ > /tmp/tpu_queue_r3l.pid

while [ -f /tmp/tpu_queue_r3k.pid ] && kill -0 "$(cat /tmp/tpu_queue_r3k.pid)" 2>/dev/null; do
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

run experiments/log/train_E1_Gated_s1.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=Gated \
  --num_epochs=20 --batch_size=16 --seed=1

run experiments/log/train_E1_LSTMGated_s1.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=LSTMGated \
  --num_epochs=20 --batch_size=16 --seed=1

run experiments/log/train_E1_MSMP_s1.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=MSMP-PDE \
  --num_epochs=20 --batch_size=16 --seed=1

run experiments/log/train_E1_MPPDE_s1.log \
  python -m msmp_pde_tpu.training.train --experiment=E1 --model=MP-PDE \
  --num_epochs=20 --batch_size=16 --seed=1

echo "R3L COMPLETE"
