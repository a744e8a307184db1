"""Programmatic tour of the msmp_pde_tpu library — no CLI, no files.

`examples/quickstart.sh` exercises the production CLI surface end-to-end;
this script is the same story through the Python API, at toy scale on CPU
(~2-4 min on one core):

  1. numerics   — build a viscous-Burgers RHS (`equations.ce.CE`) and
                  integrate a batch of sum-of-sines ICs with the jitted
                  fixed-step RK4 solver (`temporal.erk.solve_fixed`),
  2. model      — static padded neighbor lists (`data.graph`) + the
                  configurable MP solver lattice (`models.gnn.MPSolver`:
                  every 1D/2D GNN registry name is a config of this one
                  module),
  3. training   — `training.loop.Trainer`: the fused one-jit-call train
                  pass (lax.scan over batches, pushforward trick via
                  lax.switch) that all RESULTS.md runs use,
  4. rollout    — `training.metrics.rollout_store`: autoregressive
                  window-advance rollout, reference semantics
                  (train_helper.py:255-259), scored with relative L2.

Run:  python examples/api_tour.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# The ambient environment may pin JAX_PLATFORMS to a TPU plugin via a
# sitecustomize jax import; route around it the same way the CLIs'
# --platform flag does. Set MSMP_TOUR_PLATFORM=tpu to run on-chip.
import jax

jax.config.update("jax_platforms",
                  os.environ.get("MSMP_TOUR_PLATFORM", "cpu"))

import jax.numpy as jnp


def part1_numerics(key, n_traj, nt, nx, L, tmax):
    """Solve a batch of viscous-Burgers trajectories with the library's
    WENO5 + RK4 stack. Returns [n_traj, nt, nx] float32."""
    from msmp_pde_tpu.datagen.ics import sample_sinesum_ic
    from msmp_pde_tpu.equations.ce import CE
    from msmp_pde_tpu.temporal.erk import solve_fixed
    from msmp_pde_tpu.temporal.tableaux import RK4

    # CE is the general conservation-law RHS: du/dt = -alpha d(u^2/2)/dx
    # + beta u_xx - gamma u_xxx. alpha=1, beta=0.05, gamma=0 is viscous
    # Burgers (E1/E2/E3/kdv are other coefficient choices of the same CE).
    pde = CE(tmin=0.0, tmax=tmax, grid_size=(nt, nx), L=L,
             alpha=1.0, beta=0.05, gamma=0.0)
    rhs = pde.make_rhs()

    x = jnp.arange(nx, dtype=jnp.float32) * pde.dx  # periodic, dx = L/nx
    _, u0_fn = sample_sinesum_ic(key, n_traj, L)
    u0 = u0_fn(jnp.broadcast_to(x, (n_traj, nx)))[:, 0, :]  # 1 component

    ts = jnp.linspace(0.0, tmax, nt)
    t0 = time.perf_counter()
    traj = jax.jit(lambda y0: solve_fixed(rhs, y0, ts, RK4))(u0)
    traj.block_until_ready()
    print(f"[1] solved {n_traj} Burgers trajectories "
          f"({nt}x{nx}, WENO5+RK4, jit) in {time.perf_counter()-t0:.1f}s; "
          f"|u| range [{float(traj.min()):+.2f}, {float(traj.max()):+.2f}]")
    return np.asarray(traj, np.float32), x, ts, pde


def part2_model(x, ts, pde, tw):
    """A small MSMP-PDE (gated MP + LEM temporal encoder) over a static
    radius-2 neighbor list."""
    from msmp_pde_tpu.data.graph import GraphSpec, build_neighbors_radius
    from msmp_pde_tpu.models.gnn import MPSolver
    from msmp_pde_tpu.training.loop import Trainer

    idx, mask = build_neighbors_radius(np.asarray(x), 2)
    spec = GraphSpec(idx=jnp.asarray(idx), mask=jnp.asarray(mask),
                     x=jnp.asarray(x), tw=tw, n_components=1,
                     t_grid=jnp.asarray(ts), L=pde.L, tmax=pde.tmax,
                     dt=pde.dt)
    model = MPSolver(tw=tw, hidden=96, layers=2, encoder="lem",
                     gate="sigmoid", L=pde.L, tmax=pde.tmax, dt=pde.dt)
    trainer = Trainer(model=model, kind="graph", spec=spec, eq_norms={})
    print(f"[2] MSMP-PDE config: hidden=96, 2 gated MP layers, LEM "
          f"encoder, radius-2 neighbors over {len(np.asarray(x))} nodes")
    return trainer


def part3_train(trainer, u_train, tw, nt, B=8, n_passes=60, lr=2e-3):
    """The production fused train pass: one jit call per epoch-pass, a
    lax.scan over shuffled batches with the pushforward trick."""
    n = u_train.shape[0]
    n_batches = n // B
    rng = np.random.default_rng(0)

    params = trainer.init_params(jax.random.PRNGKey(1), batch_size=B)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # milestones are epoch numbers scaled by steps_per_epoch inside the
    # schedule — keep their product within int32 (here: decay far beyond
    # the ~180 steps this toy run takes).
    tx = trainer.make_optimizer(lr, 0.4, milestones=[1000],
                                steps_per_epoch=1000)
    opt_state = tx.init(params)
    fn = trainer.train_pass_fn(tx, max_unroll=1)

    u_all = jnp.asarray(u_train)
    first = last = None
    t0 = time.perf_counter()
    for i in range(n_passes):
        perm = rng.permutation(n)[: n_batches * B]
        perm = perm.reshape(n_batches, B).astype(np.int32)
        flags = rng.integers(0, 2, n_batches).astype(np.int32)
        steps = np.stack(
            [rng.integers(tw, nt - tw - tw * int(f) + 1, size=B)
             for f in flags]).astype(np.int32)
        # NB: the pass donates params/opt_state — rebind the returns.
        params, opt_state, losses = fn(
            params, opt_state, u_all, {}, jnp.asarray(perm),
            jnp.asarray(steps), jnp.asarray(flags))
        mean = float(jnp.mean(losses)) / B
        first = mean if first is None else first
        last = mean
        if i % 20 == 0:
            print(f"    pass {i:3d}: loss {mean:.4f}")
    print(f"[3] trained {n_params/1e3:.1f}k params, {n_passes} passes x "
          f"{n_batches} steps in {time.perf_counter()-t0:.1f}s "
          f"(incl. compile); loss {first:.4f} -> {last:.4f}")
    return params


def part4_rollout(trainer, params, u_test, nt):
    """Autoregressive rollout from one ground-truth window, reference
    window-advance semantics; relative space-time L2 over the horizon."""
    from msmp_pde_tpu.training.metrics import rollout_store

    preds, trues = rollout_store(trainer, params, jnp.asarray(u_test), {},
                                 batch_size=u_test.shape[0], nr_gt_steps=1,
                                 t_res=nt)
    rel = (np.linalg.norm(preds - trues)
           / max(np.linalg.norm(trues), 1e-30))
    print(f"[4] autoregressive rollout over {preds.shape[1]} steps: "
          f"relative L2 {100*rel:.1f}% "
          f"(untrained-model reference point is ~100%)")
    return rel


def main():
    print("backend:", jax.default_backend())
    # tw must be a reference decoder window (20/25/50 — models/common.py
    # DECODER_CONV) and hidden >= k1+s1*(tw-1) = 91 for tw=20.
    nt, nx, L, tmax, tw = 100, 64, 16.0, 2.0, 20
    key = jax.random.PRNGKey(0)
    traj, x, ts, pde = part1_numerics(key, n_traj=32, nt=nt, nx=nx, L=L,
                                      tmax=tmax)
    u_train, u_test = traj[:24], traj[24:]
    trainer = part2_model(x, ts, pde, tw)
    params = part3_train(trainer, u_train, tw, nt)
    rel = part4_rollout(trainer, params, u_test, nt)
    # Loose sanity gate so CI-style runs fail loudly if the stack breaks:
    # a few dozen toy passes should land well under the ~100% of an
    # untrained model.
    assert rel < 0.9, f"rollout rel-L2 {rel:.2f} — training had no effect?"
    print("api tour: OK")


if __name__ == "__main__":
    main()
