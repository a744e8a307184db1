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


def plot_2d_system(pred, true, n=1, out_path="plots/plot2d.png", dpi=400):
    """The reference's 2x2 system heatmap figure (eval.py:25-69): ground
    truth left, prediction right, one row per component, fixed color scale
    [-3, 3], viridis, shared colorbar, Timestep/Grid Point axes."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    d = pred.shape[2]
    fig, axes = plt.subplots(ncols=2, nrows=max(d, 1), sharex=True,
                             sharey=True, figsize=(10, 5), squeeze=False)
    vmin, vmax, cmap = -3, 3, "viridis"
    axes[0][0].set_title("Ground Truth")
    axes[0][1].set_title("Prediction")
    for di in range(d):
        axes[di][0].imshow(true[n - 1, :, di, :].T, vmin=vmin, vmax=vmax,
                           cmap=cmap, aspect="auto")
        im = axes[di][1].imshow(pred[n - 1, :, di, :].T, vmin=vmin, vmax=vmax,
                                cmap=cmap, aspect="auto")
        axes[di][0].set_ylabel("Grid Point")
        twin = axes[di][1].twinx()
        twin.set_ylabel(rf"$u_{di + 1}$", fontsize=15, rotation=0, labelpad=8)
        twin.set_yticks([])
    for ax in axes[-1]:
        ax.set_xlabel("Timestep")
    fig.subplots_adjust(right=0.8)
    cbar_ax = fig.add_axes([0.93, 0.18, 0.01, 0.7])
    fig.colorbar(im, cax=cbar_ax)
    plt.tight_layout(rect=[0, 0, 0.95, 1])
    fig.savefig(out_path, dpi=dpi)
    plt.close(fig)


def plot_rollouts(preds, trues, t_grid, x, family: str, out_dir="plots",
                  start_step=50, dpi=400):
    """The reference eval figures (eval.py:381-478): per-timestep colored
    rollout curves (plot1d.png), pred/true heatmaps (plot2d.png), and the
    log-scale per-timestep relative-error curve (plot_relerror.png)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm
    import matplotlib.colors as mcolors
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    N, T, d, nx = preds.shape

    if d == 1:
        # 1D rollout curves, one per timestep, colored by time
        # (eval.py:395-409): Prediction panel above Ground Truth panel.
        fig, (ax1, ax2) = plt.subplots(2, sharex=True, sharey=True)
        cmap = plt.get_cmap("viridis")
        for ti in range(T):
            c = cmap(ti / max(T - 1, 1))
            ax1.plot(x, preds[0, ti, 0], color=c, lw=0.5)
            ax2.plot(x, trues[0, ti, 0], color=c, lw=0.5)
        ax1.set_title("Prediction")
        ax2.set_title("Ground Truth")
        ax1.set_ylabel(r"$u_{\theta}(x)$")
        ax2.set_ylabel(r"$u(x)$")
        ax2.set_xlabel(r"$x$")
        ax1.margins(x=0)
        ax2.margins(x=0)
        norm = mcolors.Normalize(vmin=0, vmax=T)
        cbar = fig.colorbar(cm.ScalarMappable(norm=norm, cmap=cmap),
                            ax=[ax1, ax2])
        cbar.set_label("Timestep", rotation=270, labelpad=16)
        fig.savefig(f"{out_dir}/plot1d.png", dpi=dpi)
        plt.close(fig)

        # stacked pred/true heatmaps [grid point, timestep] (eval.py:410-425)
        fig, (ax2, ax1) = plt.subplots(2, sharex=True, sharey=True)
        ax1.imshow(preds[0, :, 0].T, aspect="auto")
        ax2.imshow(trues[0, :, 0].T, aspect="auto")
        ax1.set_title("Prediction")
        ax2.set_title("Ground Truth")
        ax1.set_xlabel("Timestep")
        ax1.set_ylabel("Grid Point")
        ax2.set_ylabel("Grid Point")
        fig.savefig(f"{out_dir}/plot2d.png", dpi=dpi)
        plt.close(fig)
    else:
        # 2-component system: the reference's 2x2 plot_2D layout
        plot_2d_system(preds, trues, n=1, out_path=f"{out_dir}/plot2d.png",
                       dpi=dpi)
        # and a curves figure for the first component as plot1d
        fig, (ax1, ax2) = plt.subplots(2, sharex=True, sharey=True)
        cmap = plt.get_cmap("viridis")
        for ti in range(T):
            c = cmap(ti / max(T - 1, 1))
            ax1.plot(x, preds[0, ti, 0], color=c, lw=0.5)
            ax2.plot(x, trues[0, ti, 0], color=c, lw=0.5)
        ax1.set_title("Prediction ($u_1$)")
        ax2.set_title("Ground Truth ($u_1$)")
        ax2.set_xlabel(r"$x$")
        fig.savefig(f"{out_dir}/plot1d.png", dpi=dpi)
        plt.close(fig)

    # log-scale per-timestep relative error % (eval.py:426-446, 465-478)
    from msmp_pde_tpu.training.metrics import compute_space_l2_norms

    _, rel = compute_space_l2_norms(preds, trues)
    fig, ax = plt.subplots()
    ax.set_yscale("log")
    ax.set_xlabel("Timestep")
    ax.set_ylabel("Relative Error %")
    fig.suptitle("Rollout Relative Error")
    ax.plot(list(range(start_step, start_step + T)), 100 * rel)
    fig.tight_layout()
    fig.savefig(f"{out_dir}/plot_relerror.png", dpi=dpi)
    plt.close(fig)


def plot_ks_spectrum(pde, preds, trues, k_cut=2.0, out_path="plots/ks_spectrum.png",
                     dpi=400):
    """KS spectral diagnostics figure (--ks_spectrum): time-averaged energy
    spectrum Ek_k and total energy Ek_t (equations/ks.py::energy_spectrum,
    reference PDEs.py:773-804) for prediction vs ground truth, plus the
    low-pass filtered field and residual magnitude (space_filter,
    PDEs.py:807-817). preds/trues: [N, T, 1, nx]."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax.numpy as jnp

    p = jnp.asarray(preds[0, :, 0, :])  # [T, nx]
    t = jnp.asarray(trues[0, :, 0, :])
    ek_p = pde.energy_spectrum(p)
    ek_t = pde.energy_spectrum(t)
    filt_p, resid_p = pde.space_filter(p, k_cut)
    filt_t, resid_t = pde.space_filter(t, k_cut)

    k = np.abs(pde._k_grid())
    nhalf = p.shape[-1] // 2
    fig, axes = plt.subplots(2, 2, figsize=(11, 7))
    ax = axes[0][0]
    ax.loglog(k[1:nhalf], np.asarray(ek_t["Ek_k"])[1:nhalf], label="truth")
    ax.loglog(k[1:nhalf], np.asarray(ek_p["Ek_k"])[1:nhalf], "--",
              label="prediction")
    ax.set_xlabel(r"$|k|$")
    ax.set_ylabel(r"$E_k$ (time-averaged)")
    ax.legend()
    ax = axes[0][1]
    ax.plot(np.asarray(ek_t["Ek_t"]), label="truth")
    ax.plot(np.asarray(ek_p["Ek_t"]), "--", label="prediction")
    ax.set_xlabel("Timestep")
    ax.set_ylabel(r"$E(t)$")
    ax.legend()
    ax = axes[1][0]
    ax.imshow(np.asarray(filt_t).T, aspect="auto")
    ax.set_title(rf"truth, low-pass $|k|<{k_cut:g}$")
    ax.set_xlabel("Timestep")
    ax.set_ylabel("Grid Point")
    ax = axes[1][1]
    ax.plot(np.sqrt(np.mean(np.asarray(resid_t) ** 2, -1)), label="truth")
    ax.plot(np.sqrt(np.mean(np.asarray(resid_p) ** 2, -1)), "--",
            label="prediction")
    ax.set_xlabel("Timestep")
    ax.set_ylabel("residual RMS")
    ax.legend()
    fig.suptitle("KS spectral diagnostics")
    fig.tight_layout()
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path, dpi=dpi)
    plt.close(fig)


def main(args):
    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from msmp_pde_tpu.training import metrics
    from msmp_pde_tpu.training.setup import data_family, setup_experiment
    from msmp_pde_tpu.utils.checkpoint import restore_params

    # probe/wait for the backend before the multi-minute dataset load
    from msmp_pde_tpu.parallel.mesh import wait_for_backend

    wait_for_backend()
    print(f"Backend: {jax.default_backend()}, devices: {len(jax.devices())}")
    exp = setup_experiment(args, modes=("valid", "test"))
    trainer = exp.trainer
    t_res = exp.datasets["test"].nt
    nx_base = args.base_resolution[1]

    params = trainer.init_params(jax.random.PRNGKey(0),
                                 batch_size=args.batch_size)
    params = restore_params(args.model_to_test, trainer, params)
    print(f"Loaded checkpoint {args.model_to_test}")

    # Evaluation data-parallelism over the device mesh, mirroring the train
    # CLI: the metric programs shard their batch axis (metrics.py).
    import math

    from msmp_pde_tpu.parallel.mesh import make_mesh, replicate

    dp = math.gcd(getattr(args, "dp", 0) or len(jax.devices()),
                  args.batch_size)
    if dp > 1:
        trainer.mesh = make_mesh(dp)
        params = replicate(trainer.mesh, params)
        print(f"Evaluation data parallelism over {dp} devices")

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
    if args.short_horizon_windows:
        print(f"**Short-horizon L2 errors (first "
              f"{args.short_horizon_windows} rollout windows)**")
        metrics.compute_l2_norms(trainer, params, u_test, var_test,
                                 args.batch_size, args.nr_gt_steps, t_res,
                                 max_windows=args.short_horizon_windows)
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
                  data_family(args.experiment),
                  start_step=args.time_window * args.nr_gt_steps)
    print("Plots written to plots/")
    if getattr(args, "ks_spectrum", False):
        if args.experiment != "KS":
            raise ValueError("--ks_spectrum is a KS-family diagnostic")
        plot_ks_spectrum(exp.pde, preds[:, :horizon], trues[:, :horizon],
                         k_cut=args.ks_k_cut)
        print("KS spectral diagnostics: plots/ks_spectrum.png")
    if args.n_more_rollout:
        # the reference's long-rollout plot flow (eval.py:725-733 + plot_2D)
        plot_2d_system(preds, trues, n=1,
                       out_path="plots/long_rollout2d.png")
        np.save("plots/long_rollout_pred.npy", preds)
        print(f"Long rollout ({args.n_more_rollout} extra windows): "
              "plots/long_rollout2d.png + plots/long_rollout_pred.npy")
    return preds, trues


def build_parser():
    from msmp_pde_tpu.training.train import build_parser as train_parser

    p = train_parser()
    p.add_argument("--model_to_test", type=str, required=True,
                   help="checkpoint path to evaluate")
    p.add_argument("--n_more_rollout", type=int, default=0,
                   help="extra beyond-horizon rollout windows")
    # --short_horizon_windows comes from the shared train parser
    p.add_argument("--ks_spectrum", action="store_true",
                   help="KS family: write energy-spectrum / low-pass-filter "
                        "diagnostics (equations/ks.py, reference "
                        "PDEs.py:773-836) to plots/ks_spectrum.png")
    p.add_argument("--ks_k_cut", type=float, default=2.0,
                   help="wavenumber cutoff for the --ks_spectrum filter")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
