"""Cross-validation CLI: merge all modes, re-split randomly, train.

Capability parity with /root/reference/experiments/cv.py: the train/valid/
test files of one experiment are concatenated and randomly re-split into
1024/128/128 samples (cv.py:82-96), trained with the standard loop, and the
checkpoint is saved under a replicate-indexed path (--rep, cv.py:106,233).
The reference hardcodes the save folder "cvMSWG3" (cv.py:24) — exposed here
as --cv_folder with that default.
"""
from __future__ import annotations

import os
import sys
import time
from datetime import datetime

import numpy as np


CV_SPLIT = (1024, 128, 128)


def main(args):
    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from msmp_pde_tpu.parallel.mesh import init_distributed
    from msmp_pde_tpu.training.setup import setup_experiment
    from msmp_pde_tpu.training.train import fit

    init_distributed()  # multi-host DCN hook; no-op single-host
    # probe/wait for the backend before the multi-minute dataset load
    from msmp_pde_tpu.parallel.mesh import wait_for_backend

    wait_for_backend()
    print(f"Backend: {jax.default_backend()}, devices: {len(jax.devices())}")
    os.makedirs(args.cv_folder, exist_ok=True)
    exp = setup_experiment(args)

    # merge and re-split (cv.py:82-96)
    u_super = np.concatenate([exp.datasets[m].u_super for m in ("train", "valid", "test")])
    u_base = np.concatenate([exp.datasets[m].u_base for m in ("train", "valid", "test")])
    variables = {
        k: np.concatenate([exp.datasets[m].variables[k] for m in ("train", "valid", "test")])
        for k in exp.datasets["train"].variables
    }
    n_total = u_super.shape[0]
    want = sum(CV_SPLIT)
    rng = np.random.default_rng(args.seed + args.rep)
    perm = rng.permutation(n_total)
    if n_total < want:
        # small datasets: proportional split
        n_tr = int(n_total * CV_SPLIT[0] / want)
        n_va = max(1, int(n_total * CV_SPLIT[1] / want))
        splits = (n_tr, n_va, n_total - n_tr - n_va)
    else:
        splits = CV_SPLIT
    idxs = np.split(perm[: sum(splits)], np.cumsum(splits)[:-1])

    data = {}
    for mode, idx in zip(("train", "valid", "test"), idxs):
        u = jnp.asarray(u_super[idx])
        ub = jnp.asarray(u_base[idx])
        var = {k: jnp.asarray(v[idx].astype(np.float32)) for k, v in variables.items()}
        data[mode] = (u, ub, var)
        print(f"CV {mode}: {len(idx)} samples")

    d = datetime.now()
    timestring = f"{d.month}{d.day}{d.hour}{d.minute}"
    run_name = (
        f"{args.model}_{exp.pde}_{args.experiment}_rep{args.rep}"
        f"_n{args.neighbors}_tw{args.time_window}_unrolling{args.unrolling}"
        f"_time{timestring}"
    )
    if args.log:
        os.makedirs("experiments/log", exist_ok=True)
        logfile = f"experiments/log/cv_{run_name}.csv"
        print(f"Writing to log file {logfile}")
        sys.stdout = open(logfile, "w")
    save_path = f"{args.cv_folder}/{run_name}"
    print(save_path)
    return fit(args, exp, data, save_path)


def build_parser():
    from msmp_pde_tpu.training.train import build_parser as train_parser

    p = train_parser()
    p.add_argument("--rep", type=int, default=0, help="replicate index")
    p.add_argument("--cv_folder", type=str, default="cvMSWG3")
    return p


if __name__ == "__main__":
    ts = time.time()
    main(build_parser().parse_args())
    print(f"Elapsed Time : {time.time() - ts}")
