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


def init_distributed() -> bool:
    """Multi-host initialization over DCN (jax.distributed). No-op unless the
    standard coordinator env vars are present — single-host runs (and this
    repo's CI) never touch it. SURVEY.md §2.4: within a slice collectives
    ride ICI; across slices jax.distributed coordinates over DCN.

    On managed clusters (Cloud TPU, Slurm, Open MPI) ``initialize()``
    auto-detects everything from JAX_COORDINATOR_ADDRESS alone; for generic
    process launchers, JAX_NUM_PROCESSES / JAX_PROCESS_ID complete the spec
    (this is the path tests/test_dcn.py exercises with two local CPU
    processes). Returns True iff the distributed runtime was started."""
    import os

    addr = (os.environ.get("JAX_COORDINATOR_ADDRESS")
            or os.environ.get("COORDINATOR_ADDRESS"))
    if not addr:
        return False
    kwargs = {"coordinator_address": addr}
    if "JAX_NUM_PROCESSES" in os.environ:
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if "JAX_PROCESS_ID" in os.environ:
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)
    return True


def wait_for_backend(max_wait_s: Optional[float] = None,
                     interval_s: float = 30.0, log=print):
    """Probe ``jax.devices()``, retrying while the backend is unavailable.

    The first device op in a training run otherwise happens only AFTER the
    multi-minute dataset load (setup_experiment), so a dead accelerator
    tunnel wastes a full load per outer-queue retry — and a queued job
    restarting every ~30 min can miss the chip by up to a load's length.
    Probing here fails fast on a healthy-vs-dead decision and starts the
    run within ``interval_s`` of the chip returning.

    jax caches backend-init FAILURES (xla_bridge._backend_errors), so each
    retry must clear the backend state before probing again. Wait budget:
    ``max_wait_s`` arg, else env MSMP_BACKEND_WAIT_S, else 1800 s; re-raises
    the last init error once the budget is exhausted.
    """
    import os
    import time

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("MSMP_BACKEND_WAIT_S", "1800"))
    deadline = time.monotonic() + max_wait_s
    while True:
        try:
            return jax.devices()
        except RuntimeError as e:
            if time.monotonic() >= deadline:
                raise
            log(f"backend unavailable ({e}); retrying in {interval_s:.0f}s")
            try:
                from jax.extend.backend import clear_backends

                clear_backends()
            except Exception:
                pass
        time.sleep(interval_s)


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def _put(a, sh: NamedSharding):
    """Place an array under a sharding. Single-process: plain device_put.
    Multi-process (after init_distributed): the sharding spans devices this
    process cannot address, so build the global array from the host-local
    copy — every process holds the full value (replicated inputs, and the
    loader's per-pass index arrays are derived from a shared PRNG seed) and
    serves the shards its local devices own."""
    if jax.process_count() > 1:
        a = np.asarray(a)
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])
    return jax.device_put(a, sh)


def shard_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Shard every array's leading (batch) axis across the mesh."""
    sh = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: _put(a, sh), tree)


def shard_chunked_batch(mesh: Mesh, tree, axis: str = "dp"):
    """Shard axis 1 (batch) across the mesh, leaving the leading chunk axis
    whole — the [m, batch, ...] layout `lax.map` scans over."""
    sh = NamedSharding(mesh, P(None, axis))
    return jax.tree.map(lambda a: _put(a, sh), tree)


def replicate(mesh: Mesh, tree):
    sh = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: _put(a, sh), tree)


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
