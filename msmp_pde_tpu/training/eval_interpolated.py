"""RPU interpolated-evaluation CLI.

Capability parity with /root/reference/experiments/eval_interpolated.py: a
model trained on the *interpolated* (uniform-grid) RPU dataset is evaluated
apples-to-apples against the original unstructured-grid ground truth — the
model rolls out on the uniform grid, each prediction is interpolated back
onto the unstructured grid, and the space-time L2 norms are computed there
(compute_L2_norms_U, eval_interpolated.py:27-146; dual dataset loading
:739-780).

    python -m msmp_pde_tpu.data.interpolate --experiment=RPU     # once
    python -m msmp_pde_tpu.training.eval_interpolated --experiment=RPU \
        --model=FNO2DPU --model_to_test=models/<run>
"""
from __future__ import annotations

import copy

import numpy as np


def main(args):
    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from msmp_pde_tpu.data import PDEDataset, build_graph_spec
    from msmp_pde_tpu.training import metrics
    from msmp_pde_tpu.training.setup import setup_experiment
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

    u_uniform = jnp.asarray(ds_uniform.u_super)
    var_all = {k: jnp.asarray(v.astype(np.float32))
               for k, v in ds_uniform.variables.items()}

    print("**Interpolated-back L2 errors (test, unstructured grid)**")
    return metrics.compute_l2_norms_u(
        trainer, params, u_uniform, var_all,
        ds_unstruct.u_super, ds_uniform.x, ds_unstruct.x,
        args.batch_size, args.nr_gt_steps, ds_uniform.nt,
    )


def build_parser():
    from msmp_pde_tpu.training.train import build_parser as train_parser

    p = train_parser()
    p.add_argument("--model_to_test", type=str, required=True)
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
