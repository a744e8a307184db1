"""Worker for tests/test_dcn.py: one process of a multi-host DCN training
run on CPU devices.

Reads JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID from the
environment (absent => single-process baseline), initializes the production
``init_distributed()`` hook, builds the same tiny Trainer as
tests/test_training.py::small_trainer, runs the PRODUCTION
``Trainer.train_pass_fn`` over the global dp mesh, and prints the loss
trajectory as one JSON line (process 0 only, prefixed 'LOSSES:').
"""
import json
import os
import sys

os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count="
    f"{os.environ.get('DCN_LOCAL_DEVICES', '2')}"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from msmp_pde_tpu.parallel.mesh import (  # noqa: E402
    _put, init_distributed, make_mesh, replicate,
)


def main():
    started = init_distributed()
    if "JAX_COORDINATOR_ADDRESS" in os.environ:
        assert started, "coordinator env present but init_distributed no-op'd"

    from jax.sharding import NamedSharding, PartitionSpec as P

    from msmp_pde_tpu.data.graph import GraphSpec, build_neighbors_radius
    from msmp_pde_tpu.models import get_model
    from msmp_pde_tpu.training.loop import Trainer

    nx, tw, nt = 24, 20, 100
    x = np.linspace(0.0, 16.0, nx)
    idx_n, mask = build_neighbors_radius(x, 2)
    spec = GraphSpec(
        idx=jnp.asarray(idx_n), mask=jnp.asarray(mask),
        x=jnp.asarray(x.astype(np.float32)), tw=tw, n_components=1,
        t_grid=jnp.linspace(0, 4.0, nt, dtype=jnp.float32),
        L=16.0, tmax=4.0, dt=4.0 / (nt - 1),
    )
    m, kind = get_model("MP-PDE", tw=tw, n_eq_vars=0, L=16.0, tmax=4.0,
                        dt=spec.dt, n_layers=2)
    trainer = Trainer(model=m, kind=kind, spec=spec, eq_norms={})
    trainer.mesh = make_mesh()

    rng = np.random.default_rng(0)
    u_all = rng.normal(size=(16, nt, nx)).astype(np.float32)
    idx = (np.arange(24).reshape(3, 8) % 16).astype(np.int32)
    steps = np.asarray([[30, 40, 50, 35, 25, 45, 30, 55]] * 3, np.int32)
    flags = np.asarray([0, 1, 0], np.int32)

    params = trainer.init_params(jax.random.PRNGKey(0), batch_size=8)
    params = jax.tree.map(np.asarray, params)
    tx = trainer.make_optimizer(1e-4, 0.4, [1, 5], 100)
    opt_state = jax.tree.map(np.asarray, tx.init(params))

    mesh = trainer.mesh
    batch1 = NamedSharding(mesh, P(None, "dp"))
    p = replicate(mesh, params)
    o = replicate(mesh, opt_state)
    u = replicate(mesh, u_all)
    idx_g = _put(idx, batch1)
    steps_g = _put(steps, batch1)
    flags_g = _put(flags, NamedSharding(mesh, P()))

    fn = trainer.train_pass_fn(tx, 1)
    p2, _, losses = fn(p, o, u, {}, idx_g, steps_g, flags_g)
    losses = np.asarray(losses)
    leaf0 = np.asarray(jax.tree.leaves(p2)[0])

    if jax.process_index() == 0:
        print("LOSSES:" + json.dumps(
            {"losses": losses.tolist(), "leaf0_sum": float(leaf0.sum()),
             "n_devices": jax.device_count(),
             "n_processes": jax.process_count()}))
    if jax.process_count() > 1:
        jax.distributed.shutdown()


if __name__ == "__main__":
    main()
