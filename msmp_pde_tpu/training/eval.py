"""Offline evaluation CLI.

Capability parity with /root/reference/experiments/eval.py:

    python -m msmp_pde_tpu.training.eval --experiment=E1 --model=MSMP-PDE \
        --model_to_test=models/<run_name>

Loads a checkpoint, reports the space-time L2 / relative-L2 metrics and the
unrolled losses, writes the reference's diagnostic figures to plots/
(1-D rollout curves, 2-D heatmaps for the advection system, per-timestep
relative-error curve — eval.py:381-478) and performs the beyond-horizon
``long_rollout`` (eval.py:502-575).
"""
from __future__ import annotations

import os

import numpy as np


def plot_rollouts(preds, trues, t_grid, x, family: str, out_dir="plots"):
    """The three reference figures (eval.py:25-69, 381-478)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    N, T, d, nx = preds.shape

    # 1D rollout snapshots (plot1d.png)
    fig, axes = plt.subplots(1, 4, figsize=(16, 3.2))
    snap = np.linspace(0, T - 1, 4).astype(int)
    for ax, ti in zip(axes, snap):
        ax.plot(x, trues[0, ti, 0], label="true", lw=2)
        ax.plot(x, preds[0, ti, 0], "--", label="pred")
        ax.set_title(f"t index {ti}")
    axes[0].legend()
    fig.tight_layout()
    fig.savefig(f"{out_dir}/plot1d.png", dpi=120)
    plt.close(fig)

    # 2D heatmaps (plot2d.png) — pred vs true over (t, x)
    fig, axes = plt.subplots(d, 2, figsize=(10, 3 * d), squeeze=False)
    for di in range(d):
        axes[di][0].imshow(trues[0, :, di], aspect="auto", origin="lower")
        axes[di][0].set_title(f"true component {di}")
        axes[di][1].imshow(preds[0, :, di], aspect="auto", origin="lower")
        axes[di][1].set_title(f"pred component {di}")
    fig.tight_layout()
    fig.savefig(f"{out_dir}/plot2d.png", dpi=120)
    plt.close(fig)

    # per-timestep relative error curve (plot_relerror.png)
    from msmp_pde_tpu.training.metrics import compute_space_l2_norms

    _, rel = compute_space_l2_norms(preds, trues)
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(rel)
    ax.set_xlabel("rollout timestep")
    ax.set_ylabel("relative L2 error")
    fig.tight_layout()
    fig.savefig(f"{out_dir}/plot_relerror.png", dpi=120)
    plt.close(fig)


def main(args):
    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from msmp_pde_tpu.training import metrics
    from msmp_pde_tpu.training.setup import data_family, setup_experiment
    from msmp_pde_tpu.utils.checkpoint import restore_checkpoint

    exp = setup_experiment(args, modes=("valid", "test"))
    trainer = exp.trainer
    t_res = exp.datasets["test"].nt
    nx_base = args.base_resolution[1]

    params = trainer.init_params(jax.random.PRNGKey(0),
                                 batch_size=args.batch_size)
    tx = trainer.make_optimizer(1e-4, 0.4, [1, 5, 10, 15], 1000)
    template = {"params": params, "opt_state": tx.init(params), "epoch": 0}
    restored = restore_checkpoint(args.model_to_test, template)
    params = restored["params"]
    print(f"Loaded checkpoint {args.model_to_test} (epoch {restored['epoch']})")

    def to_device(ds):
        return (
            jnp.asarray(ds.u_super),
            jnp.asarray(ds.u_base),
            {k: jnp.asarray(v.astype(np.float32)) for k, v in ds.variables.items()},
        )

    u_test, ub_test, var_test = to_device(exp.datasets["test"])

    print("**Dimensionless L2 errors (test)**")
    metrics.compute_l2_norms(trainer, params, u_test, var_test,
                             args.batch_size, args.nr_gt_steps, t_res)
    metrics.test_unrolled_losses(trainer, params, u_test, ub_test, var_test,
                                 args.batch_size, args.nr_gt_steps, t_res,
                                 nx_base)

    preds, trues = metrics.rollout_store(
        trainer, params, u_test, var_test, args.batch_size,
        args.nr_gt_steps, t_res, n_more_rollout=args.n_more_rollout,
    )
    horizon = preds.shape[1] - args.n_more_rollout * args.time_window
    plot_rollouts(preds[:, :horizon], trues[:, :horizon],
                  np.asarray(exp.spec.t_grid), np.asarray(exp.spec.x),
                  data_family(args.experiment))
    print("Plots written to plots/")
    if args.n_more_rollout:
        np.save("plots/long_rollout_pred.npy", preds)
        print(f"Long rollout ({args.n_more_rollout} extra windows) saved to "
              "plots/long_rollout_pred.npy")
    return preds, trues


def build_parser():
    from msmp_pde_tpu.training.train import build_parser as train_parser

    p = train_parser()
    p.add_argument("--model_to_test", type=str, required=True,
                   help="checkpoint path to evaluate")
    p.add_argument("--n_more_rollout", type=int, default=0,
                   help="extra beyond-horizon rollout windows")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
