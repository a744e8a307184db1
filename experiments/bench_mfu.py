"""Width/batch MFU scaling of the production fused train pass.

PERF.md §4: the reference-config step (hidden=128, B=16, ~1.3M params on
1,600 nodes) is latency-bound on its sequential op chain, so MFU is
single-digit *by construction*. This bench scales the SAME production
pass in width and batch — FLOPs/step grow ~quadratically in hidden while
the chain length stays constant — to locate where the step migrates from
latency-bound to MXU-bound, i.e. to show the ceiling is the workload's
arithmetic intensity, not the framework.

Per config it reports ms/step, samples/s, cost_analysis FLOPs/step, and
MFU vs the v5e bf16/f32 peaks (same method as bench.py: FLOPs from the
mathematically identical mp_impl=xla lowering, wall-clock from the
production mp_impl=auto run).

Run while the chip is free: python experiments/bench_mfu.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_F32_FLOPS = 49.2e12
V5E_HBM_BW = 819e9  # bytes/s


def make_trainer(hidden: int, mp_impl: str, nx=100, tw=25, n_layers=6,
                 mp_remat=False):
    import jax.numpy as jnp

    from msmp_pde_tpu.data.graph import GraphSpec, build_neighbors_radius
    from msmp_pde_tpu.models.gnn import MPSolver
    from msmp_pde_tpu.training.loop import Trainer

    x = np.linspace(0.0, 16.0, nx)
    idx, mask = build_neighbors_radius(x, 3)
    nt = 250
    spec = GraphSpec(
        idx=jnp.asarray(idx), mask=jnp.asarray(mask),
        x=jnp.asarray(x.astype(np.float32)), tw=tw, n_components=1,
        t_grid=jnp.linspace(0.0, 4.0, nt, dtype=jnp.float32),
        L=16.0, tmax=4.0, dt=4.0 / (nt - 1),
    )
    # MSMP-PDE config (encoder=lem, gate=sigmoid) at an overridden width.
    model = MPSolver(tw=tw, hidden=hidden, layers=n_layers, encoder="lem",
                     gate="sigmoid", L=16.0, tmax=4.0, dt=spec.dt,
                     mp_impl=mp_impl, mp_remat=mp_remat)
    return Trainer(model=model, kind="graph", spec=spec, eq_norms={})


def bench_config(hidden: int, B: int, n_steps=64, n_passes=3,
                 mp_remat=False):
    import jax
    import jax.numpy as jnp

    tw, nx, nt = 25, 100, 250
    rng = np.random.default_rng(0)
    u_all = jnp.asarray(rng.normal(size=(256, nt, nx)).astype(np.float32))

    def pass_inputs():
        idx = jnp.asarray(rng.integers(0, 256, (n_steps, B)), jnp.int32)
        steps = jnp.asarray(rng.integers(tw, nt - 3 * tw, (n_steps, B)),
                            jnp.int32)
        flags = jnp.asarray(rng.integers(0, 2, n_steps), jnp.int32)
        return idx, steps, flags

    trainer = make_trainer(hidden, "auto", mp_remat=mp_remat)
    params = trainer.init_params(jax.random.PRNGKey(0), batch_size=B)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    tx = trainer.make_optimizer(1e-4, 0.4, [1, 5, 10, 15], 10**6)
    opt_state = tx.init(params)
    fn = trainer.train_pass_fn(tx, max_unroll=1)

    t0 = time.perf_counter()
    i, s, f = pass_inputs()
    params, opt_state, losses = fn(params, opt_state, u_all, {}, i, s, f)
    losses.block_until_ready()
    compile_s = time.perf_counter() - t0

    inputs = [pass_inputs() for _ in range(n_passes)]
    t0 = time.perf_counter()
    for i, s, f in inputs:
        params, opt_state, losses = fn(params, opt_state, u_all, {}, i, s, f)
    losses.block_until_ready()
    dt = time.perf_counter() - t0
    ms_per_step = 1000 * dt / (n_passes * n_steps)
    sps = n_passes * n_steps * B / dt

    # FLOPs from the mathematically identical all-XLA lowering
    # (cost_analysis cannot see inside Pallas custom calls). Same method
    # as bench.py: lower the SINGLE optimizer step at each pushforward
    # depth and weight by the measured flag mix — cost_analysis counts a
    # lax.scan body ONCE regardless of trip count, so lowering the scanned
    # pass and dividing by n_steps understates FLOPs by ~n_steps.
    try:
        tr_x = make_trainer(hidden, "xla")
        params_x = tr_x.init_params(jax.random.PRNGKey(0), batch_size=B)
        step_flops, step_bytes = {}, {}
        for u in (0, 1):
            fn_u = tr_x.train_step_fn(tx, unrolled=u)
            compiled = fn_u.lower(params_x, tx.init(params_x), u_all, {},
                                  i[0], s[0]).compile()
            ca = compiled.cost_analysis()
            step_flops[u] = float(ca["flops"])
            step_bytes[u] = float(ca.get("bytes accessed", 0.0))
        all_flags = np.concatenate([np.asarray(f) for _, _, f in inputs])
        p1 = float(all_flags.mean())
        flops_per_step = (1.0 - p1) * step_flops[0] + p1 * step_flops[1]
        bytes_per_step = (1.0 - p1) * step_bytes[0] + p1 * step_bytes[1]
    except Exception as e:
        flops_per_step = bytes_per_step = None
        print(f"# cost_analysis unavailable at hidden={hidden}: {e!r}",
              file=sys.stderr, flush=True)

    tag = " remat" if mp_remat else ""
    if flops_per_step:
        sustained = flops_per_step / (ms_per_step / 1e3)
        mfu_bf16 = 100.0 * sustained / V5E_PEAK_BF16_FLOPS
        mfu_f32 = 100.0 * sustained / V5E_PEAK_F32_FLOPS
        gf = flops_per_step / 1e9
        gb = (bytes_per_step or 0.0) / 1e9
        hbm = 100.0 * (bytes_per_step or 0.0) / (ms_per_step / 1e3) / V5E_HBM_BW
        print(f"hidden={hidden:4d} B={B:4d}{tag} params={n_params/1e6:6.2f}M | "
              f"compile {compile_s:5.1f}s | {ms_per_step:8.3f} ms/step | "
              f"{sps:8.0f} samples/s | {gf:8.2f} GFLOP/step | "
              f"MFU {mfu_bf16:5.2f}% bf16 / {mfu_f32:5.2f}% f32 | "
              f"{gb:6.2f} GB/step HBM {hbm:5.1f}%", flush=True)
    else:
        print(f"hidden={hidden:4d} B={B:4d}{tag} params={n_params/1e6:6.2f}M | "
              f"compile {compile_s:5.1f}s | {ms_per_step:8.3f} ms/step | "
              f"{sps:8.0f} samples/s | FLOPs n/a", flush=True)


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    if "--mp_remat" in sys.argv:
        # PERF.md §4: fire the HBM lever at the exact shape it was built
        # for — the hidden=512 boundary where the plain backward OOMs —
        # plus hidden=256 under remat for a like-for-like MFU comparison
        # against the plain path's 49.9% f32 figure.
        configs = ((256, 64), (512, 64), (512, 256))
        remat = True
    else:
        # (hidden, B): reference config first, then width scaling at a
        # batch large enough that per-core work isn't trivially small,
        # then the biggest config that still fits HBM comfortably.
        configs = ((128, 16), (128, 64), (256, 64), (512, 64), (512, 256))
        remat = False
    for hidden, B in configs:
        try:
            bench_config(hidden, B, mp_remat=remat)
        except Exception as e:  # noqa: BLE001 — a config that OOMs HBM is
            # itself a sweep datum, not a sweep failure (observed: the
            # hidden=512 backward's f32[B*nx(4),3H] temps exhaust the 16 GB
            # v5e HBM); print the row in the standard format so the queue's
            # completion guard ("hidden= 512 B= 256") still matches.
            msg = repr(e).replace("\n", " ")[:160]
            print(f"hidden={hidden:4d} B={B:4d} FAILED: {msg}", flush=True)


if __name__ == "__main__":
    main()
