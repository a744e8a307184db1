#!/bin/bash
# Round-2c CPU datagen queue (single-core host; serial).
# Regenerates the CPU-side datasets wiped by the container reset:
#   1. torch-reference E1 at full scale (accuracy north-star training data)
#   2. our E1 (f64, adaptive WENO5+Dopri45)
#   3. WE2 / WE3 (exact expm propagator; fast)
set -u
cd /root/repo
mkdir -p experiments/log

echo "=== $(date +%H:%M:%S) torchref E1 full scale ==="
python experiments/torchref_e1.py --train 2048 --valid 128 --test 128 \
  > experiments/log/torchref_e1.log 2>&1
echo "=== $(date +%H:%M:%S) our E1 (f64 cpu) ==="
python -m msmp_pde_tpu.datagen.generate --experiment=E1 \
  --train_samples=2048 --valid_samples=128 --test_samples=128 \
  --batch_size=16 --platform=cpu \
  > experiments/log/datagen_E1.log 2>&1
echo "=== $(date +%H:%M:%S) WE2 ==="
python -m msmp_pde_tpu.datagen.generate --experiment=WE2 \
  --train_samples=2048 --valid_samples=128 --test_samples=128 \
  --batch_size=16 --platform=cpu \
  > experiments/log/datagen_WE2.log 2>&1
echo "=== $(date +%H:%M:%S) WE3 ==="
python -m msmp_pde_tpu.datagen.generate --experiment=WE3 \
  --train_samples=2048 --valid_samples=128 --test_samples=128 \
  --batch_size=16 --platform=cpu \
  > experiments/log/datagen_WE3.log 2>&1
echo "=== $(date +%H:%M:%S) CPU QUEUE R2C COMPLETE ==="
