"""Device-mesh data parallelism.

The reference is strictly single-process single-GPU (SURVEY.md §2.4: no
torch.distributed / NCCL / MPI anywhere); the distributed layer is therefore
a first-class NEW component of this framework, built the TPU way:

  * a 1-D ``jax.sharding.Mesh`` over the 'dp' axis;
  * parameters + the static graph replicated, batch arrays sharded on axis 0
    (trajectories are the natural data-parallel unit — both for training and
    for datagen);
  * gradients all-reduce over ICI automatically: the train step is jitted
    with NamedSharding constraints and GSPMD inserts the psum.

TP/PP/EP are intentionally out of scope at this model scale (~1M params,
~100 nodes/sample — SURVEY.md §2.4); the mesh API leaves room for extra
axes when they become meaningful.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed():
    """Multi-host initialization over DCN (jax.distributed). No-op unless the
    standard coordinator env vars are present — single-host runs (and this
    repo's CI) never touch it. SURVEY.md §2.4: within a slice collectives
    ride ICI; across slices jax.distributed coordinates over DCN."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or "COORDINATOR_ADDRESS" in os.environ:
        jax.distributed.initialize()


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Shard every array's leading (batch) axis across the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)


def dp_sharded_step(mesh: Mesh, step_fn, axis: str = "dp"):
    """Wrap a (params, opt_state, u_all, var_all, idx, steps) train step with
    DP shardings: params/opt/u_all replicated, idx/steps sharded. The jitted
    program gathers each device's shard of the batch and psums gradients."""
    repl = NamedSharding(mesh, P())
    batch = NamedSharding(mesh, P(axis))
    return jax.jit(
        step_fn,
        in_shardings=(repl, repl, repl, repl, batch, batch),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
