#!/bin/bash
# Round-3 queue N (chains after r3m): re-run stages lost to the Aug 17-18
# axon backend outage (UNAVAILABLE since ~19:37; each init attempt hangs
# ~25 min). MP-PDE2D on MSWG3 exhausted its 10 retries at 03:19. Re-run it
# here at the tail so it lands if the chip returns before the round ends.
set -u
cd /root/repo
source experiments/queue_lib.sh
queue_init r3n
queue_wait_for r3m

run experiments/log/train_MSWG3_MPPDE2D.log \
  python -m msmp_pde_tpu.training.train --experiment=MSWG3 --model=MP-PDE2D \
  --num_epochs=20 --batch_size=16

echo "R3N COMPLETE"
