#!/bin/bash
# End-to-end quick start at toy scale, entirely on CPU (~5-10 min on one
# core): generate an E1 dataset with the datagen CLI -> train a BaseCNN
# surrogate for one epoch -> evaluate the checkpoint -> serve it over HTTP
# and roll a test trajectory out through the server.
#
# Everything below is exactly the production CLI surface (the same commands
# run the full-scale TPU workloads in RESULTS.md — only the sample counts,
# epochs, and --platform differ).
#
#   bash examples/quickstart.sh [workdir]     # default /tmp/msmp_quickstart
set -euo pipefail

REPO=$(cd "$(dirname "$0")/.." && pwd)
WORK=${1:-/tmp/msmp_quickstart}
export PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p "$WORK"
cd "$WORK"

echo "== [1/4] datagen: toy E1 (Burgers) dataset, reference HDF5 schema =="
python -m msmp_pde_tpu.datagen.generate --experiment=E1 --platform=cpu \
  --train_samples=16 --valid_samples=8 --test_samples=8 --batch_size=8

echo
echo "== [2/4] train: BaseCNN, 1 epoch (pushforward loop, best-val ckpt) =="
python -m msmp_pde_tpu.training.train --experiment=E1 --model=BaseCNN \
  --platform=cpu --num_epochs=1 --batch_size=8 --print_interval=100

CKPT=$(ls -dt models/BaseCNN_CE_E1_* | head -1)
echo
echo "== [3/4] eval: rollout L2 metrics + plots for $CKPT =="
python -m msmp_pde_tpu.training.eval --experiment=E1 --model=BaseCNN \
  --platform=cpu --batch_size=8 --model_to_test="$CKPT"

echo
echo "== [4/4] serve: HTTP rollout server + client round trip =="
python -m msmp_pde_tpu.serving.serve --experiment=E1 --model=BaseCNN \
  --platform=cpu --checkpoint="$CKPT" --port=8493 --batch_buckets 4 \
  --warmup_windows=0 &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT

python - <<'EOF'
import json
import time
import urllib.request

import h5py
import numpy as np

from msmp_pde_tpu.serving.serve import request_rollout

# wait for the server (model build + checkpoint restore)
for _ in range(120):
    try:
        with urllib.request.urlopen("http://127.0.0.1:8493/healthz",
                                    timeout=5) as r:
            print("healthz:", json.load(r))
        break
    except Exception:
        time.sleep(1)
else:
    raise SystemExit("server did not come up")

tw = 25
with h5py.File("data/CE_E1.h5", "r") as f:
    u = f["test"]["pde_250-100"][:2]  # [2, nt, nx]
window = np.transpose(u[:, tw:2 * tw, :], (0, 2, 1)).astype(np.float32)
traj = request_rollout("127.0.0.1", 8493, window,
                       steps=np.full((2,), 2 * tw, np.int32),
                       n_windows=4, as_trajectory=True)
true = u[:, 2 * tw:2 * tw + 4 * tw, :]
pred = traj[:, :, 0, :]
nrmse = float(np.sqrt(((pred - true) ** 2).mean())
              / np.sqrt((true ** 2).mean()))
print(f"served rollout: {traj.shape}, nRMSE vs ground truth over "
      f"{4 * tw} steps: {nrmse:.3f}")
EOF

echo
echo "quickstart complete — artifacts in $WORK (data/, models/, plots/)"
