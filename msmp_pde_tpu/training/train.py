"""Training CLI.

Capability parity with /root/reference/experiments/train.py:

    python -m msmp_pde_tpu.training.train --experiment=E1 --model=MSMP-PDE \
        --time_window=25 [--base_resolution=250,100 ...]

Flow (train.py:296-448): load datasets, build the (static) graph, construct
the model, AdamW + MultiStepLR, then per epoch: t_res shuffled passes with
the pushforward trick, validation (one-step + unrolled losses), and on
validation improvement: test losses, space-time L2 norms, and a best-val
checkpoint (orbax; includes optimizer state for resume — a superset of the
reference's params-only torch.save).

The ``fit`` function is shared with the cross-validation CLI (cv.py).
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from datetime import datetime

import numpy as np


def device_arrays(ds):
    import jax.numpy as jnp

    u = jnp.asarray(ds.u_super)
    ub = jnp.asarray(ds.u_base)
    var = {k: jnp.asarray(v.astype(np.float32)) for k, v in ds.variables.items()}
    return u, ub, var


# the only entry points whose argv a watchdog re-exec may replay; fit()
# embedded in any other process must not re-exec that host with its
# unrelated argv (the watchdog stays off there)
_CLI_MODULES = ("msmp_pde_tpu.training.train", "msmp_pde_tpu.training.cv")


def _running_as_cli() -> bool:
    import __main__

    spec = getattr(__main__, "__spec__", None)
    if spec is not None and spec.name in _CLI_MODULES:
        return True
    # launched by file path (python .../train.py): __spec__ is None but
    # argv replay is equally safe — _stall_recovery re-execs sys.argv[0]
    if spec is None and os.path.basename(sys.argv[0]) in ("train.py",
                                                          "cv.py"):
        return True
    return os.environ.get("MSMP_WATCHDOG_FORCE", "") == "1"


def _checkpoint_finalized(path: str) -> bool:
    """True iff ``path`` is a COMMITTED orbax checkpoint — the
    _CHECKPOINT_METADATA marker is written at finalize, so a watchdog that
    fires mid-save won't point --resume at a half-written directory."""
    return os.path.isdir(path) and os.path.exists(
        os.path.join(path, "_CHECKPOINT_METADATA")
    )


def _stall_recovery(args, save_path: str):
    """Watchdog action: re-exec this CLI, resuming from the last best-val
    checkpoint when one is finalized (utils/watchdog.py has the failure
    story; unfinalized/absent checkpoint -> fresh start). Module re-derived
    from __main__.__spec__ so the cv CLI (which shares fit()) restarts as
    itself; --resume injected only for parsers that have the flag."""
    import __main__

    spec = getattr(__main__, "__spec__", None)
    head = ["-m", spec.name] if spec is not None else [sys.argv[0]]

    def action():
        argv = _recovery_argv(
            sys.argv[1:],
            resume=(save_path if hasattr(args, "resume")
                    and _checkpoint_finalized(save_path) else None),
        )
        sys.stdout.flush()
        sys.stderr.flush()
        os.execv(sys.executable, [sys.executable] + head + argv)

    return action


def _recovery_argv(argv_in, resume=None):
    """Original CLI args with any --resume stripped; re-append the new one."""
    argv, skip = [], False
    for tok in argv_in:
        if skip:
            skip = False
            continue
        if tok == "--resume":
            skip = True
            continue
        if tok.startswith("--resume="):
            continue
        argv.append(tok)
    if resume is not None:
        argv += ["--resume", resume]
    return argv


def fit(args, exp, data, save_path: str):
    """The epoch loop; ``data`` maps mode -> (u_super, u_base, variables)."""
    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.parallel.mesh import make_mesh, replicate
    from msmp_pde_tpu.training import metrics
    from msmp_pde_tpu.training.loop import train_epoch
    from msmp_pde_tpu.utils.checkpoint import save_checkpoint
    from msmp_pde_tpu.utils.watchdog import Watchdog

    trainer = exp.trainer
    t_res = exp.t_res
    nx_base = args.base_resolution[1]

    # Data parallelism over the device mesh (new capability vs the
    # single-device reference, SURVEY.md §2.4): auto when >1 device and the
    # batch divides, or forced via --dp N.
    import math

    n_dev = len(jax.devices())
    dp = getattr(args, "dp", 0) or n_dev
    dp = math.gcd(dp, args.batch_size)
    if dp > 1:
        trainer.mesh = make_mesh(dp)
        print(f"Data parallelism over {dp} devices "
              f"(mesh {trainer.mesh.shape})")
        data = {m: replicate(trainer.mesh, v) for m, v in data.items()}

    u_train, _, var_train = data["train"]
    u_valid, ub_valid, var_valid = data["valid"]
    u_test, ub_test, var_test = data["test"]

    key = jax.random.PRNGKey(args.seed)
    params = trainer.init_params(key, batch_size=args.batch_size)
    if trainer.mesh is not None:
        params = replicate(trainer.mesh, params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"Number of parameters: {n_params}")

    n_batches = max(1, int(u_train.shape[0]) // args.batch_size)
    tx = trainer.make_optimizer(
        args.lr, args.lr_decay,
        milestones=(list(args.milestones) if args.milestones is not None
                    else [args.unrolling, 5, 10, 15]),
        steps_per_epoch=t_res * n_batches,
    )
    opt_state = tx.init(params)
    start_epoch = 0
    if getattr(args, "resume", None):
        # mid-training resume — the reference cannot do this (it saves
        # params only, train.py:433); our checkpoints carry optimizer state.
        from msmp_pde_tpu.utils.checkpoint import restore_checkpoint

        restored = restore_checkpoint(
            args.resume, {"params": params, "opt_state": opt_state, "epoch": 0}
        )
        params, opt_state = restored["params"], restored["opt_state"]
        if trainer.mesh is not None:
            params = replicate(trainer.mesh, params)
            opt_state = replicate(trainer.mesh, opt_state)
        start_epoch = int(restored["epoch"]) + 1
        print(f"Resumed from {args.resume} at epoch {start_epoch}")
    rng = np.random.default_rng(args.seed)

    # Stall watchdog (utils/watchdog.py): beats on every loss print and
    # metric-program return; a hung device RPC re-execs with --resume
    # instead of dying to the outer queue's timeout. MSMP_WATCHDOG_S=0
    # disables; the 1800 s default clears first-epoch tunnel compiles
    # (<= ~7 min) by a wide margin. Armed ONLY when this process was
    # launched as the train/cv CLI (or MSMP_WATCHDOG_FORCE=1): the recovery
    # re-execs sys.argv, which is only safe to replay for those entry
    # points.
    wd_stall = (float(os.environ.get("MSMP_WATCHDOG_S", "1800"))
                if _running_as_cli() else 0.0)
    wd = Watchdog(wd_stall, _stall_recovery(args, save_path)).start()

    def log_beat(*a, **k):
        wd.beat()
        print(*a, **k)

    min_val_loss = 1e30
    test_loss = 1e30
    results = {}
    for epoch in range(start_epoch, args.num_epochs):
        print(f"Epoch {epoch}")
        params, opt_state, _ = train_epoch(
            trainer, tx, params, opt_state, u_train, var_train, epoch,
            args.batch_size, t_res, args.unrolling, rng,
            print_interval=args.print_interval,
            log=log_beat,
            profile_dir=(args.profile if epoch == 0 else None),
        )
        wd.beat()
        print("Evaluation on validation dataset:")
        metrics.test_timestep_losses(
            trainer, params, u_valid, var_valid, args.batch_size, t_res
        )
        wd.beat()
        val_loss, _ = metrics.test_unrolled_losses(
            trainer, params, u_valid, ub_valid, var_valid, args.batch_size,
            args.nr_gt_steps, t_res, nx_base,
        )
        wd.beat()
        shw = getattr(args, "short_horizon_windows", 0)
        if shw:
            # per-epoch pre-divergence metric for chaotic tasks (KS): rel-L2
            # over only the first N rollout windows, next to the full-horizon
            # number (which saturates once trajectories decorrelate)
            print(f"*Valid short-horizon rel-L2 (first {shw} windows)*")
            metrics.compute_l2_norms(
                trainer, params, u_valid, var_valid, args.batch_size,
                args.nr_gt_steps, t_res, max_windows=shw, log=log_beat,
            )
        if val_loss < min_val_loss:
            print("Evaluation on test dataset:")
            metrics.test_timestep_losses(
                trainer, params, u_test, var_test, args.batch_size, t_res
            )
            wd.beat()
            test_loss, _ = metrics.test_unrolled_losses(
                trainer, params, u_test, ub_test, var_test, args.batch_size,
                args.nr_gt_steps, t_res, nx_base,
            )
            wd.beat()
            print("**Dimensionless L2 errors**")
            print("*Valid*")
            results["valid_L2"], results["valid_rel_L2"] = metrics.compute_l2_norms(
                trainer, params, u_valid, var_valid, args.batch_size,
                args.nr_gt_steps, t_res,
            )
            print("*Test*")
            results["test_L2"], results["test_rel_L2"] = metrics.compute_l2_norms(
                trainer, params, u_test, var_test, args.batch_size,
                args.nr_gt_steps, t_res,
            )
            if shw:
                print(f"*Test short-horizon rel-L2 (first {shw} windows)*")
                (results["test_L2_short"],
                 results["test_rel_L2_short"]) = metrics.compute_l2_norms(
                    trainer, params, u_test, var_test, args.batch_size,
                    args.nr_gt_steps, t_res, max_windows=shw,
                )
            save_checkpoint(save_path, params, opt_state, epoch)
            print(f"Saved model at {save_path}\n")
            min_val_loss = val_loss
        wd.beat()

    wd.stop()
    print(f"Min Val loss: {min_val_loss}")
    print(f"Test loss: {test_loss}")
    print("**Dimensionless L2 errors**")
    print(f"Min Val L2 Error: {results.get('valid_L2')}")
    print(f"Min Relative Val L2 Error: {100 * results.get('valid_rel_L2', 0)} %")
    print(f"Test L2 Error: {results.get('test_L2')}")
    print(f"Relative Test L2 Error: {100 * results.get('test_rel_L2', 0)} %")
    results["min_val_loss"] = min_val_loss
    results["test_loss"] = test_loss
    return results


def main(args):
    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)

    from msmp_pde_tpu.parallel.mesh import init_distributed
    from msmp_pde_tpu.training.setup import setup_experiment

    init_distributed()  # multi-host DCN hook; no-op single-host

    # Probe (and briefly wait for) the backend BEFORE the multi-minute
    # dataset load/downprojection; see wait_for_backend's docstring.
    from msmp_pde_tpu.parallel.mesh import wait_for_backend

    wait_for_backend()
    print(f"Backend: {jax.default_backend()}, devices: {len(jax.devices())}")

    os.makedirs("models", exist_ok=True)
    os.makedirs("experiments/log", exist_ok=True)

    exp = setup_experiment(args, data_dir=getattr(args, "data_dir", "data"))

    d = datetime.now()
    timestring = f"{d.month}{d.day}{d.hour}{d.minute}"
    run_name = (
        f"{args.model}_{exp.pde}_{args.experiment}"
        f"_xresolution{args.base_resolution[1]}-{args.super_resolution[1]}"
        f"_n{args.neighbors}_tw{args.time_window}_unrolling{args.unrolling}"
        f"_time{timestring}"
    )
    if args.log:
        logfile = f"experiments/log/{run_name}.csv"
        print(f"Writing to log file {logfile}")
        sys.stdout = open(logfile, "w")
    save_path = f"models/{run_name}"
    print(f"Training on dataset data/{exp.pde}_train_{args.experiment}.h5")
    print(save_path)

    data = {m: device_arrays(exp.datasets[m]) for m in ("train", "valid", "test")}
    return fit(args, exp, data, save_path)


def build_parser():
    p = argparse.ArgumentParser(description="Train a neural PDE solver")
    p.add_argument("--experiment", type=str, default="")
    p.add_argument("--model", type=str, default="MP-PDE")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--lr_decay", type=float, default=0.4)
    p.add_argument("--milestones", type=int, nargs="*", default=None,
                   help="MultiStepLR epoch milestones (default: reference "
                        "schedule [unrolling, 5, 10, 15], train.py:410-411)")
    p.add_argument("--parameter_ablation", type=eval, default=False)
    p.add_argument(
        "--base_resolution",
        type=lambda s: [int(i) for i in s.split(",")], default=[250, 100],
    )
    p.add_argument(
        "--super_resolution",
        type=lambda s: [int(i) for i in s.split(",")], default=[250, 200],
    )
    p.add_argument("--neighbors", type=int, default=3)
    p.add_argument("--time_window", type=int, default=25)
    p.add_argument("--unrolling", type=int, default=1)
    p.add_argument("--nr_gt_steps", type=int, default=2)
    p.add_argument("--n_graph_layers", type=int, default=6)
    p.add_argument("--print_interval", type=int, default=20)
    p.add_argument("--short_horizon_windows", type=int, default=0,
                   help="also report rel-L2 over only the first N rollout "
                        "windows (per-epoch on valid, and on test at each "
                        "best-val) — the pre-divergence metric for chaotic "
                        "tasks like KS")
    p.add_argument("--log", type=eval, default=False)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default="default",
                   choices=["cpu", "tpu", "default"])
    p.add_argument("--dp", type=int, default=0,
                   help="data-parallel mesh size (0 = all devices; clamped "
                        "to a divisor of batch_size)")
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint to resume training from")
    p.add_argument("--profile", type=str, default=None,
                   help="directory for a jax.profiler trace of one pass")
    p.add_argument("--data_dir", type=str, default="data",
                   help="dataset directory (e.g. data_torchref/data for "
                        "torch-reference-generated files)")
    p.add_argument("--data_suffix", type=str, default="",
                   help="dataset filename suffix, e.g. '_I' for the "
                        "interpolated RPU files")
    p.add_argument("--mp_precision", type=str, default="float32",
                   choices=["float32", "bfloat16", "bfloat16s"],
                   help="matmul operand dtype inside the fused Pallas MP "
                        "kernel (f32 accumulation either way); 'bfloat16s' "
                        "pre-casts kernel inputs/weights outside the kernel "
                        "(native-bf16 storage, no in-kernel input relayouts)")
    p.add_argument("--mp_remat", action="store_true",
                   help="rematerialize each MP layer in the backward "
                        "(recompute per-edge intermediates instead of "
                        "stashing them) — the HBM lever for wide hidden "
                        "sizes; forces the XLA layer math (same param "
                        "tree, checkpoints interchange; outputs/grads "
                        "numerically equivalent at f32 ULP level — remat "
                        "recomputation is not bit-guaranteed). NOTE: "
                        "mp_impl=auto on TPU engages remat by itself "
                        "whenever the Pallas working set exceeds VMEM "
                        "(hidden>=256); mp_impl=xla opts out")
    return p


if __name__ == "__main__":
    ts = time.time()
    main(build_parser().parse_args())
    print(f"Elapsed Time : {time.time() - ts}")
