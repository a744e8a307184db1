"""Paired ABAB A/B: mp_remat on/off for the full production train pass.

Motivation (round 5): the bench_mfu --mp_remat sweep measured remat
1.61x FASTER than the plain backward at hidden=256 (17.99 vs 28.94
ms/step) — the per-edge stash traffic the plain backward writes/reads
dominates at width. This asks the same question at the headline E1
config (hidden=128, B=16): if remat wins >=5% there too, it becomes the
production default and the next step-time cut; if it loses, the stash
is cheap at this width and the default stands.

Method: compile both arms first (cold compiles through the tunnel are
minutes), then SIGSTOP any live tpu_queue_* trees (bench.py's pause
machinery — the axon tunnel multiplexes concurrent clients) only for
the measurement window, and interleave the arms ABAB x n_reps so tunnel
drift hits both equally. Reports per-arm best/mean and the ratio.

Run: python experiments/bench_remat_ab.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_pass(mp_remat: bool, hidden: int):
    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.data.graph import GraphSpec, build_neighbors_radius
    from msmp_pde_tpu.models.gnn import MPSolver
    from msmp_pde_tpu.training.loop import Trainer

    nx, tw, nt = 100, 25, 250
    x = np.linspace(0.0, 16.0, nx)
    idx, mask = build_neighbors_radius(x, 3)
    spec = GraphSpec(
        idx=jnp.asarray(idx), mask=jnp.asarray(mask),
        x=jnp.asarray(x.astype(np.float32)), tw=tw, n_components=1,
        t_grid=jnp.linspace(0.0, 4.0, nt, dtype=jnp.float32),
        L=16.0, tmax=4.0, dt=4.0 / (nt - 1),
    )
    # both arms use mp_impl="auto": the plain arm resolves to the fused
    # Pallas pair kernels on TPU, the remat arm to the XLA layer path
    # (mp_remat composes only with XLA layer math) — i.e. this A/Bs the
    # PRODUCTION alternatives, not just the stash policy
    model = MPSolver(tw=tw, hidden=hidden, layers=6, encoder="lem",
                     gate="sigmoid", L=16.0, tmax=4.0, dt=spec.dt,
                     mp_impl="auto", mp_remat=mp_remat)
    return Trainer(model=model, kind="graph", spec=spec, eq_norms={})


def main():
    import jax
    import jax.numpy as jnp

    hidden = int(sys.argv[sys.argv.index("--hidden") + 1]) \
        if "--hidden" in sys.argv else 128
    B = int(sys.argv[sys.argv.index("--batch") + 1]) \
        if "--batch" in sys.argv else 16
    print("backend:", jax.default_backend(),
          f"hidden={hidden} B={B}", flush=True)
    nx, nt, tw = 100, 250, 25
    n_steps, n_passes, n_reps = 64, 2, 3
    rng = np.random.default_rng(0)
    u_all = jnp.asarray(rng.normal(size=(256, nt, nx)).astype(np.float32))

    def pass_inputs():
        i = jnp.asarray(rng.integers(0, 256, (n_steps, B)), jnp.int32)
        s = jnp.asarray(rng.integers(tw, nt - 3 * tw, (n_steps, B)),
                        jnp.int32)
        f = jnp.asarray(rng.integers(0, 2, n_steps), jnp.int32)
        return i, s, f

    arms = {}
    for name, remat in (("plain", False), ("remat", True)):
        tr = make_pass(remat, hidden)
        params = tr.init_params(jax.random.PRNGKey(0), batch_size=B)
        tx = tr.make_optimizer(1e-4, 0.4, [1, 5, 10, 15], 10**6)
        fn = tr.train_pass_fn(tx, max_unroll=1)
        st = tx.init(params)
        t0 = time.perf_counter()
        # train_pass_fn donates params/opt_state — keep the RETURNED
        # buffers, the inputs are dead after this call
        params, st, losses = fn(params, st, u_all, {}, *pass_inputs())
        losses.block_until_ready()
        print(f"{name}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)
        arms[name] = (fn, params, st)

    # measurement window: uncontended
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_qp", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    paused = bench._pause_queues()
    try:
        times = {"plain": [], "remat": []}
        inputs = [pass_inputs() for _ in range(n_passes)]
        for rep in range(n_reps):
            for name in ("plain", "remat"):
                fn, params, st = arms[name]
                t0 = time.perf_counter()
                for inp in inputs:
                    params, st, losses = fn(params, st, u_all, {}, *inp)
                losses.block_until_ready()
                dt = time.perf_counter() - t0
                arms[name] = (fn, params, st)  # inputs were donated
                ms = 1000 * dt / (n_passes * n_steps)
                times[name].append(ms)
                print(f"rep {rep} {name}: {ms:.3f} ms/step", flush=True)
    finally:
        bench._resume_queues(paused)

    bp, br = min(times["plain"]), min(times["remat"])
    mp_, mr = np.mean(times["plain"]), np.mean(times["remat"])
    print(f"plain: best {bp:.3f} ms mean {mp_:.3f} | "
          f"remat: best {br:.3f} ms mean {mr:.3f} | "
          f"remat speedup best {bp/br:.3f}x mean {mp_/mr:.3f}x", flush=True)


if __name__ == "__main__":
    main()
