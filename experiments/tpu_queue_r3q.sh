#!/bin/bash
# Round-3 queue Q (chains after r3p): complete the one remaining cut run —
# FNO2DPU on RPU reached epoch 15/20 before the outage (best-val ep 14:
# 1.75%/2.05%, recorded in RESULTS). ~8 min/epoch, so it needs the 4 h
# timeout r3k used, not queue_lib's 2 h default. Last in the chain because
# the incremental value (5 more epochs on an already-recorded row) is the
# smallest of the queued work.
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r3q
queue_wait_for r3p

TIMEOUT=14400
run_if_incomplete experiments/log/train_RPU_FNO2DPU.log \
  python -m msmp_pde_tpu.training.train --experiment=RPU --model=FNO2DPU \
  --num_epochs=20 --batch_size=16
echo "R3Q COMPLETE"
