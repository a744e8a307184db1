"""Dataset generation CLI.

Capability parity with /root/reference/generate/generate_data.py:1158-1344:

    python -m msmp_pde_tpu.datagen.generate --experiment=E1 \
        --train_samples=2048 --valid_samples=128 --test_samples=128

TaskIDs: E1 E2 E3 kdv (combined equation), WE1 WE2 WE3 (wave equation),
KF (reaction-diffusion), KS (Kuramoto-Sivashinsky), RP RPU MSWG MSWG3
(linear advection system; RPU on the LCG unstructured grid).

TPU-native re-design (SURVEY.md §2.4 "batched datagen parallelism"):
  * whole sample chunks integrate in one jit'ed program per resolution
    (vmapped/batched arrays), replacing the reference's serial per-sample /
    per-coefficient-draw Python loops (generate_data.py:222-223, 607-628,
    808-809);
  * the wave equation uses the exact expm propagator (see equations/we.py)
    instead of per-sample scipy Radau solves — exact and batched;
  * coefficients are drawn once per ``--batch_size`` group exactly like the
    reference, so the data distribution is unchanged; the adaptive solver's
    error max is shared across the whole chunk (a strict superset of the
    reference's per-group sharing — steps are only ever *smaller*).

Precision: datagen defaults to float64 (the reference integrates in torch
fp64); pass --dtype=float32 to trade accuracy for TPU speed (KS benefits the
most; its outputs are stored complex64 by the reference anyway).

Output HDF5 schema is identical to the reference's (see hdf5_io.py).
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from datetime import datetime

import numpy as np


def _setup_jax(platform: str, dtype: str):
    import jax

    if platform == "tpu":
        # On hosts where the chip is reached through a tunnel plugin (e.g.
        # axon) the platform is not named "tpu": probe the local tpu
        # plugin, and on failure fall back to the ambient default (which
        # resolves to the tunnel's TPU backend).
        try:
            jax.config.update("jax_platforms", "tpu")
            jax.devices()
        except RuntimeError:
            jax.config.update("jax_platforms", None)
            dev = jax.devices()[0]
            if dev.platform not in ("tpu", "axon") and \
                    "TPU" not in str(dev.device_kind):
                raise
    elif platform != "default":
        jax.config.update("jax_platforms", platform)
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)


# Resolutions (nt, nx) per family (generate_data.py:862-863, 920-921,
# 985-986, 1054-1055, 1122-1123).
RES_CE = [(250, 200), (250, 100), (250, 50), (250, 40)]
RES_KF = RES_CE
RES_KS = RES_CE
RES_AD = RES_CE
RES_WE = [(250, 200), (250, 100), (250, 50), (250, 40), (250, 20)]

MODES = ("train", "valid", "test")


def _check_directory():
    os.makedirs("data/log", exist_ok=True)


def _maybe_log(args, family: str):
    if args.log:
        d = datetime.now()
        ts = f"{d.month}{d.day}{d.hour}{d.minute}"
        logfile = f"data/log/{family}_{args.experiment}_time{ts}.csv"
        print(f"Writing to log file {logfile}")
        sys.stdout = open(logfile, "w")


def _mode_counts(args):
    return {
        "train": args.train_samples,
        "valid": args.valid_samples,
        "test": args.test_samples,
    }


def _chunks(total: int, chunk: int):
    start = 0
    while start < total:
        yield start, min(chunk, total - start)
        start += min(chunk, total - start)


def _group_draw(key, n_groups, lo, hi, log_uniform=False):
    """One coefficient per group; fixed when lo == hi (reference :365-376)."""
    import jax
    import jax.numpy as jnp

    if np.isclose(lo, hi):
        return jnp.full((n_groups,), lo)
    if log_uniform:
        u = jax.random.uniform(key, (n_groups,))
        return jnp.exp(
            jnp.log(lo) + u * (jnp.log(hi) - jnp.log(lo))
        )
    return jax.random.uniform(key, (n_groups,), minval=lo, maxval=hi)


def _expand_groups(vals, batch_size):
    import jax.numpy as jnp

    return jnp.repeat(vals, batch_size).reshape(-1, 1, 1)



def _sharder():
    """Batch-axis sharding for multi-device datagen (SPMD over trajectories).

    Returns a function placing the leading axis of every array in a pytree
    across all visible devices; identity on a single device. The jitted
    solvers are shape-polymorphic in the batch axis, so GSPMD partitions the
    whole integration (the adaptive error max becomes an all-reduce)."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = jax.devices()
    if len(devs) <= 1:
        return lambda tree: tree
    import numpy as _np

    mesh = Mesh(_np.asarray(devs), ("dp",))
    sh = NamedSharding(mesh, P("dp"))

    def place(tree):
        import jax as _jax

        def put(a):
            if hasattr(a, "shape") and a.ndim >= 1 and a.shape[0] % len(devs) == 0:
                return _jax.device_put(a, sh)
            return a

        return _jax.tree.map(put, tree)

    return place


# --------------------------------------------------------------------- CE
def generate_ce(args, tmax: float, alpha, beta, gamma):
    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.datagen import ics
    from msmp_pde_tpu.datagen.hdf5_io import ModeWriter, open_for_mode
    from msmp_pde_tpu.equations import CE
    from msmp_pde_tpu.temporal import DOPRI45, solve_adaptive

    _maybe_log(args, "CE")
    shard = _sharder()
    pdes = {
        f"pde_{nt}-{nx}": CE(tmin=0.0, tmax=tmax, grid_size=(nt, nx))
        for nt, nx in RES_CE
    }
    key = jax.random.PRNGKey(args.seed)

    solvers = {}
    for k, pde in pdes.items():
        x = jnp.linspace(0.0, pde.L, pde.nx)
        ts = jnp.linspace(pde.tmin, pde.tmax, pde.nt)

        def make(pde=pde, x=x, ts=ts):
            def f(al, be, ga, A, omega, phi, l):
                def force(t):
                    arg = omega * t + 2.0 * jnp.pi * l * x[:, None] / pde.L + phi
                    return jnp.sum(A * jnp.sin(arg), axis=-1)[:, None, :]

                u0 = force(0.0)
                rhs = pde.make_rhs(al, be, ga, force)
                return solve_adaptive(rhs, u0, ts, DOPRI45)

            return jax.jit(f)

        solvers[k] = make()

    path = f"data/CE_{args.experiment}"
    h5f = open_for_mode(f"{path}.h5", "train")
    for mode in MODES:
        n = _mode_counts(args)[mode]
        res_meta = {
            k: dict(
                nt=p.nt, nx=p.nx, dt=p.dt, dx=p.dx, tmin=p.tmin, tmax=p.tmax,
                x=np.linspace(0.0, p.L, p.nx),
            )
            for k, p in pdes.items()
        }
        w = ModeWriter(h5f, mode, n, res_meta, ("alpha", "beta", "gamma"))
        print(f"Mode: {mode}  samples: {n}")
        for start, c in _chunks(n, args.chunk):
            groups = -(-c // args.batch_size)
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            al = _expand_groups(_group_draw(k1, groups, *alpha), args.batch_size)[:c]
            be = _expand_groups(_group_draw(k2, groups, *beta), args.batch_size)[:c]
            ga = _expand_groups(_group_draw(k3, groups, *gamma), args.batch_size)[:c]
            pde0 = next(iter(pdes.values()))
            A, omega, phi, l = ics.sample_sine_params(
                k4, c, pde0.n_waves, pde0.lmin, pde0.lmax
            )
            al, be, ga, A, omega, phi, l = shard(
                (al, be, ga, A, omega, phi, l)
            )
            for k, pde in pdes.items():
                t1 = time.time()
                traj = solvers[k](al, be, ga, A, omega, phi, l)
                traj.block_until_ready()
                print(f"{k}: {time.time() - t1:.4f}s")
                w.write(k, start, np.asarray(traj).reshape(c, pde.nt, pde.nx))
            w.write_scalar("alpha", start, np.asarray(al).ravel())
            # beta is stored negated by the training pipeline, not here
            w.write_scalar("beta", start, np.asarray(be).ravel())
            w.write_scalar("gamma", start, np.asarray(ga).ravel())
            print(f"Solved {start + c} / {n}")
            sys.stdout.flush()
    h5f.close()
    print("Data saved")


# --------------------------------------------------------------------- KF
def generate_kf(args, tmax: float, r_range, d_range):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.datagen import ics
    from msmp_pde_tpu.datagen.hdf5_io import ModeWriter, open_for_mode
    from msmp_pde_tpu.equations import KF
    from msmp_pde_tpu.temporal import DOPRI45, solve_adaptive

    _maybe_log(args, "KF")
    shard = _sharder()
    # torchdiffeq dopri5 default tolerances (reference :518)
    tab = dataclasses.replace(DOPRI45, rtol=1e-7, atol=1e-9)
    pdes = {
        f"pde_{nt}-{nx}": KF(tmin=0.0, tmax=tmax, grid_size=(nt, nx))
        for nt, nx in RES_KF
    }
    key = jax.random.PRNGKey(args.seed)

    solvers = {}
    for k, pde in pdes.items():
        x = jnp.linspace(0.0, pde.L, pde.nx)
        ts = jnp.linspace(pde.tmin, pde.tmax, pde.nt)

        def make(pde=pde, x=x, ts=ts):
            def f(r, D, A, l):
                # squared zero-phase sum-of-sines IC (reference :504-507)
                arg = 2.0 * jnp.pi * l * x[:, None] / pde.L
                u0 = jnp.sum(A * jnp.sin(arg), axis=-1) ** 2
                rhs = pde.make_rhs(r=r[:, None], D=D[:, None])
                return solve_adaptive(rhs, u0, ts, tab, max_depth=14)

            return jax.jit(f)

        solvers[k] = make()

    h5f = open_for_mode(f"data/KF_{args.experiment}.h5", "train")
    for mode in MODES:
        n = _mode_counts(args)[mode]
        res_meta = {
            k: dict(
                nt=p.nt, nx=p.nx, dt=p.dt, dx=p.dx, tmin=p.tmin, tmax=p.tmax,
                x=np.linspace(0.0, p.L, p.nx),
            )
            for k, p in pdes.items()
        }
        w = ModeWriter(h5f, mode, n, res_meta, ("r", "D"))
        print(f"Mode: {mode}  samples: {n}")
        for start, c in _chunks(n, args.chunk):
            groups = -(-c // args.batch_size)
            key, k1, k2, k3 = jax.random.split(key, 4)
            r = jnp.repeat(_group_draw(k1, groups, *r_range), args.batch_size)[:c]
            D = jnp.repeat(
                _group_draw(k2, groups, *d_range, log_uniform=True),
                args.batch_size,
            )[:c]
            pde0 = next(iter(pdes.values()))
            A, _, _, l = ics.sample_sine_params(
                k3, c, pde0.n_waves, pde0.lmin, pde0.lmax
            )
            r, D, A, l = shard((r, D, A, l))
            for k, pde in pdes.items():
                t1 = time.time()
                traj = solvers[k](r, D, A, l)
                traj.block_until_ready()
                print(f"{k}: {time.time() - t1:.4f}s")
                w.write(k, start, np.asarray(traj))
            w.write_scalar("r", start, np.asarray(r))
            w.write_scalar("D", start, np.asarray(D))
            print(f"Solved {start + c} / {n}")
            sys.stdout.flush()
    h5f.close()
    print("Data saved")


# --------------------------------------------------------------------- KS
def generate_ks(args, tend: float, dt_fine: float):
    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.datagen import ics
    from msmp_pde_tpu.datagen.hdf5_io import ModeWriter, open_for_mode
    from msmp_pde_tpu.equations import KS

    _maybe_log(args, "KS")
    shard = _sharder()
    # L = 22/(2 pi): chaotic regime (reference :923-925)
    L = 22.0 / (2.0 * np.pi)
    key = jax.random.PRNGKey(args.seed)

    kss = {}
    for nt, nx in RES_KS:
        dt_out = tend / nt
        kss[f"pde_{nt}-{nx}"] = KS(
            L=L, nx=nx, dt=dt_fine, tend=tend, tstart=0.0, dt_downsampled=dt_out
        )

    h5f = open_for_mode(f"data/KS_{args.experiment}.h5", "train")
    for mode in MODES:
        n = _mode_counts(args)[mode]
        res_meta = {
            k: dict(
                nt=p.nsteps_downsampled, nx=p.nx, dt=p.dt_downsampled, dx=p.dx,
                tmin=p.tstart, tmax=p.tend,
                x=np.linspace(0.0, 2 * np.pi * p.L, p.nx),
            )
            for k, p in kss.items()
        }
        w = ModeWriter(h5f, mode, n, res_meta)
        print(f"Mode: {mode}  samples: {n}")
        for start, c in _chunks(n, args.chunk):
            key, k1 = jax.random.split(key)
            for k, ks in kss.items():
                A, omega, phi, l = ics.sample_sine_params(
                    k1, c, ks.n_waves, ks.lmin, ks.lmax
                )
                x_lin = jnp.linspace(0.0, 2 * np.pi * ks.L, ks.nx)
                arg = 2.0 * jnp.pi * l * (x_lin / (2 * np.pi))[:, None] / ks.L + phi
                u0 = shard(jnp.sum(A * jnp.sin(arg), axis=-1))
                # transient removal + temporal downsampling (reference :620-625)
                transient = int(2.0 / ks.dt) + 1
                idx = np.round(
                    np.linspace(0, ks.nsteps - transient, ks.nsteps_downsampled)
                ).astype(int)
                save_steps = transient + idx
                t1 = time.time()
                traj, valid = ks.simulate(u0, save_steps)
                traj.block_until_ready()
                print(f"{k}: {time.time() - t1:.4f}s  valid={int(valid.sum())}/{c}")
                w.write(k, start, np.asarray(traj))
            print(f"Solved {start + c} / {n}")
            sys.stdout.flush()
    h5f.close()
    print("Data saved")


# --------------------------------------------------------------------- AD
def generate_rp(args, tend: float, a_range, b_range, initial_condition,
                unstructured_grid=False):
    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.datagen import ics
    from msmp_pde_tpu.datagen.hdf5_io import ModeWriter, open_for_mode
    from msmp_pde_tpu.equations import AD
    from msmp_pde_tpu.equations.ad import exact_solution_batch

    _maybe_log(args, "RP")
    gaussian = initial_condition in ("gaussian", "gaussian_triple")
    L = 2 * np.pi if gaussian else 16.0
    pdes = {
        f"pde_{nt}-{nx}": AD(tmin=0.0, tmax=tend, grid_size=(nt, nx), L=L)
        for nt, nx in RES_AD
    }
    key = jax.random.PRNGKey(args.seed)

    def grid_for(pde):
        if unstructured_grid:
            return jnp.asarray(ics.pseudo_random_grid(0.0, pde.L, pde.nx))
        return jnp.linspace(0.0, pde.L, pde.nx)

    h5f = open_for_mode(f"data/AD_{args.experiment}.h5", "train")
    for mode in MODES:
        n = _mode_counts(args)[mode]
        res_meta = {
            k: dict(
                nt=p.nt, nx=p.nx, dt=p.dt, dx=p.dx, tmin=p.tmin, tmax=p.tmax,
                x=np.asarray(grid_for(p)),
            )
            for k, p in pdes.items()
        }
        w = ModeWriter(h5f, mode, n, res_meta, ("a", "b"), components=2)
        print(f"Mode: {mode}  samples: {n}")
        for start, c in _chunks(n, args.chunk):
            groups = -(-c // args.batch_size)
            key, k1, k2, k3 = jax.random.split(key, 4)
            a = jnp.repeat(_group_draw(k1, groups, *a_range), args.batch_size)[:c]
            b = jnp.repeat(_group_draw(k2, groups, *b_range), args.batch_size)[:c]
            pde0 = next(iter(pdes.values()))
            if initial_condition == "square":
                _, u0_fn = ics.sample_square_ic(k3, c, pde0.nx, L)
            elif initial_condition == "sinesum":
                _, u0_fn = ics.sample_sinesum_ic(
                    k3, c, L, pde0.n_waves, pde0.lmin, pde0.lmax
                )
            elif initial_condition == "gaussian":
                _, u0_fn = ics.sample_gaussian_ic(k3, c, L)
            elif initial_condition == "gaussian_triple":
                _, u0_fn = ics.sample_gaussian_triple_ic(k3, c, L)
            else:
                raise ValueError(initial_condition)
            for k, pde in pdes.items():
                x = grid_for(pde)
                ts = jnp.linspace(pde.tmin, pde.tmax, pde.nt)
                t1 = time.time()
                traj = exact_solution_batch(u0_fn, x, ts, a, b)
                traj.block_until_ready()
                print(f"{k}: {time.time() - t1:.4f}s")
                w.write(k, start, np.asarray(traj))
            w.write_scalar("a", start, np.asarray(a))
            w.write_scalar("b", start, np.asarray(b))
            print(f"Solved {start + c} / {n}")
            sys.stdout.flush()
    h5f.close()
    print("Data saved")


def _we_radau_solve(pde, x, u0_state, t_eval, c, tol=1e-3):
    """Strict-parity fallback: scipy Radau on the Chebyshev RHS, exactly the
    reference's integrator and tolerances (generate_data.py:264). Kept for
    one-to-one data comparisons; the default expm path is exact and batched."""
    from scipy.integrate import solve_ivp

    sol = solve_ivp(
        pde.chebdx, [t_eval[0], t_eval[-1]], u0_state, method="Radau",
        t_eval=t_eval, args=(x, c), rtol=tol, atol=tol,
    )
    return sol.y.T  # [nt, 2nx]


# --------------------------------------------------------------------- WE
def generate_we(args, boundary_condition: str, tend: float, wave_speed: float):
    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.datagen.hdf5_io import ModeWriter, open_for_mode
    from msmp_pde_tpu.equations import WE

    _maybe_log(args, "WE")
    pdes = {
        f"pde_{nt}-{nx}": WE(tmin=0.0, tmax=tend, grid_size=(nt, nx))
        for nt, nx in RES_WE
    }
    key = jax.random.PRNGKey(args.seed)
    c = float(wave_speed)

    @jax.jit
    def rollout(P, states):
        def step(s, _):
            s2 = s @ P.T
            return s2, s2

        _, traj = jax.lax.scan(step, states, None, length=249)
        return jnp.concatenate([states[None], traj], axis=0)  # [nt, B, 2n]

    h5f = open_for_mode(f"data/WE_{args.experiment}.h5", "train")
    for mode in MODES:
        n = _mode_counts(args)[mode]
        res_meta = {
            k: dict(
                nt=p.nt, nx=p.nx, dt=p.dt, dx=p.dx, tmin=p.tmin, tmax=p.tmax,
                x=p.x,
            )
            for k, p in pdes.items()
        }
        w = ModeWriter(
            h5f, mode, n, res_meta, ("bc_left", "bc_right", "c"),
            scalar_dtypes={"bc_left": int, "bc_right": int},
        )
        print(f"Mode: {mode}  samples: {n}")

        # Per-sample BC draws (reference :231-241; the 'mixed' branch's
        # double-assignment quirk leaves bc_right always dirichlet).
        key, kbc, kstart = jax.random.split(key, 3)
        if boundary_condition == "dirichlet":
            bc_l = np.zeros(n, dtype=int)
        elif boundary_condition == "neumann":
            bc_l = np.ones(n, dtype=int)
        elif boundary_condition == "mixed":
            bc_l = np.asarray(jax.random.randint(kbc, (2, n), 0, 2))[1]
        else:
            raise ValueError(boundary_condition)
        bc_r = bc_l if boundary_condition != "mixed" else np.zeros(n, dtype=int)
        starts = np.asarray(
            jax.random.uniform(kstart, (n,), minval=-4.0, maxval=4.0)
        )

        use_radau = getattr(args, "we_solver", "expm") == "radau"
        for k, pde in pdes.items():
            x = pde.x
            t1 = time.time()
            out = np.empty((n, pde.nt, pde.nx))
            for bl in np.unique(bc_l):
                for br in np.unique(bc_r):
                    sel = np.where((bc_l == bl) & (bc_r == br))[0]
                    if len(sel) == 0:
                        continue
                    pde.bc_left = "dirichlet" if bl == 0 else "neumann"
                    pde.bc_right = "dirichlet" if br == 0 else "neumann"
                    u = np.exp(-((x[None, :] - starts[sel, None]) ** 2))
                    v = -2.0 * c * (x[None, :] - starts[sel, None]) * u
                    if use_radau:
                        # strict-parity path: per-sample scipy Radau, but
                        # process-parallel across samples (vs the reference's
                        # serial loop, generate_data.py:225-264)
                        from concurrent.futures import ThreadPoolExecutor

                        t_eval = np.linspace(pde.tmin, pde.tmax, pde.nt)

                        def solve_one(i):
                            s0 = np.concatenate([u[i], v[i]])
                            y = _we_radau_solve(pde, x, s0, t_eval, c)
                            return y[:, : pde.nx]

                        with ThreadPoolExecutor(max_workers=8) as ex:
                            trajs = list(ex.map(solve_one, range(len(sel))))
                        traj = np.stack(trajs)  # [B, nt, nx]
                    else:
                        P = jnp.asarray(pde.propagator(c=c))
                        states = jnp.asarray(np.concatenate([u, v], axis=1))
                        traj = np.asarray(rollout(P, states))  # [nt, B, 2n]
                        traj = np.moveaxis(traj[..., : pde.nx], 1, 0)
                    # reference stores trajectories time-reversed
                    # (solved.y.T[::-1], generate_data.py:269) — replicate.
                    out[sel] = traj[:, ::-1, :]
            print(f"{k}: {time.time() - t1:.4f}s")
            w.write(k, 0, out)
        w.write_scalar("bc_left", 0, bc_l)
        w.write_scalar("bc_right", 0, bc_r)
        w.write_scalar("c", 0, np.full(n, c))
        print(f"Solved {n} / {n}")
        sys.stdout.flush()
    h5f.close()
    print("Data saved")


# ------------------------------------------------------------------ main
def main(args):
    _setup_jax(args.platform, args.dtype)
    from msmp_pde_tpu.parallel.mesh import wait_for_backend

    wait_for_backend()  # probe/wait for the accelerator before any work
    _check_directory()
    e = args.experiment
    if e == "E1":
        generate_ce(args, 4.0, (1.0, 1.0), (0.0, 0.0), (0.0, 0.0))
    elif e == "E2":
        generate_ce(args, 4.0, (1.0, 1.0), (0.0, 0.2), (0.0, 0.0))
    elif e == "E3":
        generate_ce(args, 2.0, (0.0, 6.0), (0.1, 0.4), (0.0, 1.0))
    elif e == "kdv":
        generate_ce(args, 2.0, (3.0, 3.0), (0.0, 0.0), (1.0, 1.0))
    elif e == "WE1":
        generate_we(args, "dirichlet", 100.0, args.wave_speed)
    elif e == "WE2":
        generate_we(args, "neumann", 100.0, args.wave_speed)
    elif e == "WE3":
        generate_we(args, "mixed", 100.0, args.wave_speed)
    elif e == "KF":
        generate_kf(args, 5.0, (0.0, 2.0), (1e-6, 1e-2))
    elif e == "KS":
        generate_ks(args, 100.0, 0.00025)
    elif e == "RP":
        generate_rp(args, 4.0, (0.1, 1.0), (1.0, 10.0), "sinesum")
    elif e == "RPU":
        generate_rp(args, 4.0, (0.1, 1.0), (1.0, 10.0), "sinesum",
                    unstructured_grid=True)
    elif e == "MSWG":
        generate_rp(args, 3.0, (0.1, 1.0), (1.0, 10.0), "gaussian")
    elif e == "MSWG3":
        generate_rp(args, 1.0, (0.1, 0.5), (8.0, 10.0), "gaussian_triple")
    else:
        raise ValueError(f"unknown experiment {e!r}")


def build_parser():
    p = argparse.ArgumentParser(description="Generate PDE training data")
    p.add_argument("--experiment", type=str, default="")
    p.add_argument("--train_samples", type=int, default=2**5)
    p.add_argument("--valid_samples", type=int, default=2**5)
    p.add_argument("--test_samples", type=int, default=2**5)
    p.add_argument("--batch_size", type=int, default=4,
                   help="coefficient-group size (distribution parity)")
    p.add_argument("--chunk", type=int, default=128,
                   help="samples integrated per jit call")
    p.add_argument("--wave_speed", type=float, default=2.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", type=str, default="cpu",
                   choices=["cpu", "tpu", "default"],
                   help="'default' keeps the ambient JAX platform")
    p.add_argument("--dtype", type=str, default="float64",
                   choices=["float64", "float32"])
    p.add_argument("--log", type=eval, default=False)
    p.add_argument("--we_solver", type=str, default="expm",
                   choices=["expm", "radau"],
                   help="wave equation integrator: exact expm propagator "
                        "(default) or strict-parity scipy Radau")
    return p


if __name__ == "__main__":
    main(build_parser().parse_args())
