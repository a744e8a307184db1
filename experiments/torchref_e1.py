"""Generate a reduced E1 dataset with the TORCH REFERENCE's own datagen.

Runs /root/reference/generate/generate_data.py::generate_data_combined_equation
unmodified (CPU shims only: no-op torch.cuda.synchronize, stubbed torchdiffeq
import — the KF-only dependency isn't installed here) to produce
reference-authored HDF5 files in the reference's one-file-per-mode layout
(data/CE_{mode}_E1.h5). Used for the accuracy north star: our pipeline must
consume these files unmodified and train to comparable rel-L2
(BASELINE.md; SURVEY.md §4 item 4).

Usage: python experiments/torchref_e1.py [--train N --valid N --test N --batch B]
Writes under /root/repo/data_torchref/data/.
"""
import argparse
import os
import sys
import time
import types

sys.modules.setdefault("torchdiffeq", types.SimpleNamespace(odeint=None))
import matplotlib

matplotlib.use("Agg")
import torch

if not torch.cuda.is_available():
    torch.cuda.synchronize = lambda *a, **k: None

sys.path.insert(0, "/root/reference")
from equations.PDEs import CE  # noqa: E402
from generate import generate_data as gd  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train", type=int, default=128)
    p.add_argument("--valid", type=int, default=32)
    p.add_argument("--test", type=int, default=32)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--outdir", type=str, default="/root/repo/data_torchref")
    args = p.parse_args()

    os.makedirs(os.path.join(args.outdir, "data"), exist_ok=True)
    os.chdir(args.outdir)

    # the two resolutions the training pipeline uses (train.py:477-480)
    pde = {
        f"pde_250-{nx}": CE(0.0, 4.0, (250, nx), device="cpu")
        for nx in (200, 100)
    }
    for mode, n in (("train", args.train), ("valid", args.valid),
                    ("test", args.test)):
        path = f"data/CE_{mode}_E1.h5"
        if os.path.exists(path):
            os.remove(path)
        t0 = time.time()
        gd.generate_data_combined_equation(
            experiment="E1", pde=pde, mode=mode, num_samples=n,
            batch_size=args.batch, device="cpu",
            alpha=[1.0, 1.0], beta=[0.0, 0.0], gamma=[0.0, 0.0],
        )
        print(f"[torchref_e1] {mode}: {n} samples in {time.time()-t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
