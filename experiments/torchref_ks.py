"""Generate a reduced KS dataset with the TORCH REFERENCE's own datagen.

Runs /root/reference's KS ETDRK4 path unmodified (generate_data.py:544-650
flow: per-trajectory numpy ETDRK4, 2s transient removal, temporal
downsampling) to produce reference-authored per-mode HDF5 files under
/root/repo/data_torchref/data/KS_{mode}_KS.h5. Used for KS accuracy
validation: our reader consumes the files, and energy spectra of our
generated KS data must match the reference's (tests/test_interchange.py).

Usage: python experiments/torchref_ks.py [--train N --valid N --test N]
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
import numpy as np  # noqa: E402
from equations.PDEs import KS  # noqa: E402
from generate import generate_data as gd  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train", type=int, default=16)
    p.add_argument("--valid", type=int, default=8)
    p.add_argument("--test", type=int, default=8)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--outdir", type=str, default="/root/repo/data_torchref")
    args = p.parse_args()

    os.makedirs(os.path.join(args.outdir, "data"), exist_ok=True)
    os.chdir(args.outdir)

    # gen_KS config (generate_data.py:897-939): L=22/2pi, dt_fine=2.5e-4,
    # t in [0, 100]; the two training resolutions.
    L = 22.0 / (2 * np.pi)
    pde = {
        f"pde_250-{nx}": KS(L=L, nx=nx, dt=0.00025, tend=100.0, tstart=0.0,
                            dt_downsampled=100.0 / 250)
        for nx in (200, 100)
    }
    for mode, n in (("train", args.train), ("valid", args.valid),
                    ("test", args.test)):
        if n == 0:  # keep an existing file for this mode untouched
            continue
        path = f"data/KS_{mode}_KS.h5"
        if os.path.exists(path):
            os.remove(path)
        t0 = time.time()
        gd.generate_data_KS(experiment="KS", pde=pde, mode=mode,
                            num_samples=n, batch_size=args.batch)
        print(f"[torchref_ks] {mode}: {n} samples in {time.time()-t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
