"""RPU interpolated-evaluation CLI.

Capability parity with /root/reference/experiments/eval_interpolated.py: a
model trained on the *interpolated* (uniform-grid) RPU dataset is evaluated
apples-to-apples against the original unstructured-grid ground truth — the
model rolls out on the uniform grid, each prediction is interpolated back
onto the unstructured grid, and the space-time L2 norms are computed there
(compute_L2_norms_U, eval_interpolated.py:27-146; dual dataset loading
:739-780).

On top of the interpolated-back metric this runs the reference's full
diagnostic battery on the interpolated route: one-step losses at every tw
multiple, unrolled forward + numerical-baseline losses, the figure set
(plot1d/plot2d/plot_relerror — test_unrolled_losses_plot,
eval_interpolated.py:195-499 writes at :532-599), the beyond-horizon
long rollout (:626-699), and an interp-back comparison figure on the
unstructured grid (a superset: the reference computes the interp-back
route for metrics only).

    python -m msmp_pde_tpu.data.interpolate --experiment=RPU     # once
    python -m msmp_pde_tpu.training.eval_interpolated --experiment=RPU \
        --model=FNO2DPU --model_to_test=models/<run>
"""
from __future__ import annotations

import copy
import os

import numpy as np


def plot_interp_back(preds_u, trues_u, x_unstructured, out_dir="plots",
                     dpi=400):
    """Unstructured-grid comparison figure for the interpolated route:
    interp-back prediction vs unstructured ground truth heatmaps (first
    component) plus the per-timestep relative error on the unstructured
    grid."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from msmp_pde_tpu.training.metrics import compute_space_l2_norms

    os.makedirs(out_dir, exist_ok=True)
    order = np.argsort(np.asarray(x_unstructured))
    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    axes[0].imshow(trues_u[0, :, 0][:, order].T, aspect="auto")
    axes[0].set_title("Ground Truth (unstructured)")
    axes[0].set_xlabel("Timestep")
    axes[0].set_ylabel("Grid Point (sorted)")
    axes[1].imshow(preds_u[0, :, 0][:, order].T, aspect="auto")
    axes[1].set_title("Prediction (interp back)")
    axes[1].set_xlabel("Timestep")
    _, rel = compute_space_l2_norms(preds_u, trues_u)
    axes[2].set_yscale("log")
    axes[2].plot(100 * rel)
    axes[2].set_title("Relative Error % (unstructured)")
    axes[2].set_xlabel("Timestep")
    fig.tight_layout()
    fig.savefig(f"{out_dir}/plot_interp_back.png", dpi=dpi)
    plt.close(fig)


def main(args):
    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from msmp_pde_tpu.data import PDEDataset, build_graph_spec
    from msmp_pde_tpu.training import metrics
    from msmp_pde_tpu.training.eval import plot_2d_system, plot_rollouts
    from msmp_pde_tpu.training.setup import data_family, setup_experiment
    from msmp_pde_tpu.utils.checkpoint import restore_params

    # uniform-grid (interpolated) experiment setup; RPU unstructured flag off
    # because the _I datasets live on a uniform grid.
    args_i = copy.deepcopy(args)
    # probe/wait for the backend before the multi-minute dataset load
    from msmp_pde_tpu.parallel.mesh import wait_for_backend

    wait_for_backend()
    print(f"Backend: {jax.default_backend()}, devices: {len(jax.devices())}")
    exp = setup_experiment(args_i, modes=("test",), data_dir="data")
    # swap the datasets for the interpolated files
    pde_uniform = copy.deepcopy(exp.pde)
    pde_uniform.unstructured_grid = False
    ds_uniform = PDEDataset(
        f"data/AD_{args.experiment}_I.h5", pde_uniform, "test",
        base_resolution=tuple(args.base_resolution),
        super_resolution=tuple(args.super_resolution),
    )
    ds_unstruct = exp.datasets["test"]

    trainer = exp.trainer
    # the model runs on the uniform grid: rebuild spec/trainer on it
    from msmp_pde_tpu.training.loop import Trainer

    spec_u = build_graph_spec(pde_uniform, ds_uniform, args.neighbors,
                              args.time_window)
    trainer = Trainer(model=exp.model, kind=exp.kind, spec=spec_u,
                      eq_norms=exp.eq_norms)

    params = trainer.init_params(jax.random.PRNGKey(0),
                                 batch_size=args.batch_size)
    params = restore_params(args.model_to_test, trainer, params)
    print(f"Loaded checkpoint {args.model_to_test}")

    t_res = ds_uniform.nt
    nx_base = args.base_resolution[1]
    u_uniform = jnp.asarray(ds_uniform.u_super)
    ub_uniform = jnp.asarray(ds_uniform.u_base)
    var_all = {k: jnp.asarray(v.astype(np.float32))
               for k, v in ds_uniform.variables.items()}

    # 0. the heaviest program — the full-horizon rollout over the test
    #    set — runs exactly ONCE; every rollout-derived metric and figure
    #    below reads this store (the one-step/unrolled losses are
    #    different programs and still run themselves).
    preds, trues = metrics.rollout_store(
        trainer, params, u_uniform, var_all, args.batch_size,
        args.nr_gt_steps, t_res, n_more_rollout=args.n_more_rollout,
    )
    horizon = preds.shape[1] - args.n_more_rollout * args.time_window

    # 1. the apples-to-apples interpolated-back metric (the unique
    #    capability of this CLI; eval_interpolated.py:27-146)
    print("**Interpolated-back L2 errors (test, unstructured grid)**")
    l2_u, rel_u = metrics.compute_l2_norms_u(
        trainer, params, u_uniform, var_all,
        ds_unstruct.u_super, ds_uniform.x, ds_unstruct.x,
        args.batch_size, args.nr_gt_steps, t_res,
        preds=preds[:, :horizon],
    )

    # 2. the standard battery on the interpolated (uniform-grid) route
    print("**Uniform-grid (interpolated route) diagnostics**")
    metrics.test_timestep_losses(trainer, params, u_uniform, var_all,
                                 args.batch_size, t_res)
    metrics.test_unrolled_losses(trainer, params, u_uniform, ub_uniform,
                                 var_all, args.batch_size, args.nr_gt_steps,
                                 t_res, nx_base)
    metrics.l2_norms_from_store(preds[:, :horizon], trues[:, :horizon])

    # 3. figure set + (optional) beyond-horizon long rollout
    plot_rollouts(preds[:, :horizon], trues[:, :horizon],
                  np.asarray(spec_u.t_grid), np.asarray(ds_uniform.x),
                  data_family(args.experiment),
                  start_step=args.time_window * args.nr_gt_steps)
    print("Plots written to plots/")

    # 4. interp-back comparison on the unstructured grid
    start = args.time_window * args.nr_gt_steps
    # AD datasets are [N, nt, d, nx] (data/dataset.py:144-146)
    trues_r = np.asarray(ds_unstruct.u_super)[:, start : start + horizon]
    preds_r = metrics.interp_rollout_to_unstructured(
        np.asarray(preds[:, :horizon]), ds_uniform.x, ds_unstruct.x
    )
    plot_interp_back(preds_r, trues_r, ds_unstruct.x)
    print("Interp-back comparison: plots/plot_interp_back.png")

    if args.n_more_rollout:
        plot_2d_system(preds, trues, n=1,
                       out_path="plots/long_rollout_interp2d.png")
        np.save("plots/long_rollout_interp_pred.npy", preds)
        print(f"Long rollout ({args.n_more_rollout} extra windows): "
              "plots/long_rollout_interp2d.png + "
              "plots/long_rollout_interp_pred.npy")
    return l2_u, rel_u


def build_parser():
    from msmp_pde_tpu.training.train import build_parser as train_parser

    p = train_parser()
    p.add_argument("--model_to_test", type=str, required=True)
    p.add_argument("--n_more_rollout", type=int, default=0,
                   help="extra beyond-horizon rollout windows")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
