"""Generate AD / KF / WE datasets with the TORCH REFERENCE's own datagen.

Runs /root/reference/generate/generate_data.py::generate_data_RP /
generate_data_KF / generate_data_wave_equation unmodified on CPU (shims
only: no-op torch.cuda.synchronize; a scipy-RK45 torchdiffeq.odeint for
KF — experiments/torchshim/torchdiffeq.py).  Broadens the torch-reference
data interchange beyond E1/KS (VERDICT r2 #6): the produced files are read
by tests/test_interchange.py statistics checks and used for an at-scale
cross-train of MSWG3.

PDE construction mirrors the reference dispatch exactly
(generate_data.py:1271-1319 for RP/RPU/MSWG/MSWG3 — a/b ranges, IC family,
L=2*pi for the gaussian ICs; :1251-1261 for KF r/D ranges; :1216-1250 for
WE1/WE2/WE3 — per-task boundary_condition, wave_speed=2, t in [0,100]), at
the reference's resolutions nt=250, nx in {200,100,50,40} (:985-986,
861-862; WE adds nx=20, :1122-1123).  The reference's own WE default is
2**5 samples per mode (:1095-1097) — WE datagen is serial scipy Radau
(batch_size>1 raises NotImplementedError, :1117-1118).

Usage:
  python experiments/torchref_gen.py --experiment=MSWG3 \
      [--train N --valid N --test N --batch B --outdir DIR]
Writes the reference's one-file-per-mode layout under <outdir>/data/.
"""
import argparse
import os
import sys
import time

SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "torchshim")
sys.path.insert(0, SHIM)  # provides torchdiffeq (scipy-RK45 odeint)
import matplotlib

matplotlib.use("Agg")
import numpy as np
import torch

if not torch.cuda.is_available():
    torch.cuda.synchronize = lambda *a, **k: None

sys.path.insert(0, "/root/reference")
from equations.PDEs import AD, KF, WE  # noqa: E402
from generate import generate_data as gd  # noqa: E402

# reference dispatch table (generate_data.py:1251-1319)
AD_TASKS = {
    "RP": dict(t1=4.0, a=[0.1, 1.0], b=[1.0, 10.0], ic="sinesum",
               unstructured=False),
    "RPU": dict(t1=4.0, a=[0.1, 1.0], b=[1.0, 10.0], ic="sinesum",
                unstructured=True),
    "MSWG": dict(t1=3.0, a=[0.1, 1.0], b=[1.0, 10.0], ic="gaussian",
                 unstructured=False),
    "MSWG3": dict(t1=1.0, a=[0.1, 0.5], b=[8.0, 10.0], ic="gaussian_triple",
                  unstructured=False),
}
RESOLUTIONS = ((250, 200), (250, 100), (250, 50), (250, 40))
# WE adds nx=20 (generate_data.py:1122-1123)
WE_RESOLUTIONS = RESOLUTIONS + ((250, 20),)
WE_BCS = {"WE1": "dirichlet", "WE2": "neumann", "WE3": "mixed"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", required=True,
                   choices=sorted(AD_TASKS) + ["KF"] + sorted(WE_BCS))
    p.add_argument("--train", type=int, default=2048)
    p.add_argument("--valid", type=int, default=128)
    p.add_argument("--test", type=int, default=128)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--outdir", type=str, default="/root/repo/data_torchref")
    args = p.parse_args()

    os.makedirs(os.path.join(args.outdir, "data"), exist_ok=True)
    os.chdir(args.outdir)
    exp = args.experiment

    if exp in WE_BCS:
        # wave_equation dispatch (generate_data.py:1137-1141): t in [0,100],
        # wave_speed=2, serial batch_size=1
        pde = {f"pde_{nt}-{nx}": WE(tmin=0.0, tmax=100.0, grid_size=(nt, nx),
                                    device="cpu")
               for nt, nx in WE_RESOLUTIONS}
        prefix = "WE"
    elif exp == "KF":
        pde = {f"pde_{nt}-{nx}": KF(0.0, 5.0, (nt, nx), device="cpu",
                                    r=[0.0, 2.0], D=[1e-6, 1e-2])
               for nt, nx in RESOLUTIONS}
        prefix = "KF"
    else:
        cfg = AD_TASKS[exp]
        kw = {}
        if cfg["ic"] in ("gaussian", "gaussian_triple"):
            kw["L"] = 2 * np.pi  # generate_data.py:1002-1003
        pde = {f"pde_{nt}-{nx}": AD(0.0, cfg["t1"], (nt, nx), device="cpu",
                                    **kw)
               for nt, nx in RESOLUTIONS}
        prefix = "AD"

    for mode, n in (("train", args.train), ("valid", args.valid),
                    ("test", args.test)):
        path = f"data/{prefix}_{mode}_{exp}.h5"
        if os.path.exists(path):
            os.remove(path)
        t0 = time.time()
        if exp in WE_BCS:
            gd.generate_data_wave_equation(
                experiment=exp, boundary_condition=WE_BCS[exp], pde=pde,
                mode=mode, num_samples=n, batch_size=1, wave_speed=2.0,
                device="cpu")
        elif exp == "KF":
            gd.generate_data_KF(experiment=exp, pde=pde, mode=mode,
                                num_samples=n, batch_size=args.batch,
                                device="cpu", r=[0.0, 2.0], D=[1e-6, 1e-2])
        else:
            gd.generate_data_RP(experiment=exp, pde=pde, mode=mode,
                                num_samples=n, batch_size=args.batch,
                                device="cpu", a=cfg["a"], b=cfg["b"],
                                initial_condition=cfg["ic"],
                                unstructured_grid=cfg["unstructured"])
        print(f"[torchref_gen] {exp} {mode}: {n} samples in "
              f"{time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
