"""A/B benchmark: fused Pallas MP layer vs XLA path on the real TPU.

Times the production fused train pass (Trainer.train_pass_fn) at the E1
config for mp_impl in {xla, pallas}, plus a forward-only comparison.
Run while the chip is free: python experiments/bench_pallas.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def make_trainer(mp_impl: str, n_layers=6, nx=100, tw=25,
                 lem_impl: str = "xla", mp_precision: str = "float32"):
    import jax.numpy as jnp

    from msmp_pde_tpu.data.graph import GraphSpec, build_neighbors_radius
    from msmp_pde_tpu.models import get_model
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
    model, kind = get_model("MSMP-PDE", tw=tw, n_eq_vars=0, L=16.0, tmax=4.0,
                            dt=spec.dt, n_layers=n_layers, mp_impl=mp_impl,
                            lem_impl=lem_impl, mp_precision=mp_precision)
    return Trainer(model=model, kind=kind, spec=spec, eq_norms={})


def bench_impl(mp_impl: str, B=16, nx=100, nt=250, tw=25, n_steps=64,
               n_passes=3, lem_impl: str = "xla",
               mp_precision: str = "float32"):
    import jax
    import jax.numpy as jnp

    trainer = make_trainer(mp_impl, nx=nx, tw=tw, lem_impl=lem_impl,
                           mp_precision=mp_precision)
    rng = np.random.default_rng(0)
    u_all = jnp.asarray(rng.normal(size=(256, nt, nx)).astype(np.float32))
    params = trainer.init_params(jax.random.PRNGKey(0), batch_size=B)
    tx = trainer.make_optimizer(1e-4, 0.4, [1, 5, 10, 15], 10**6)
    opt_state = tx.init(params)
    fn = trainer.train_pass_fn(tx, max_unroll=1)

    def pass_inputs():
        idx = jnp.asarray(rng.integers(0, 256, (n_steps, B)), jnp.int32)
        steps = jnp.asarray(rng.integers(tw, nt - 3 * tw, (n_steps, B)),
                            jnp.int32)
        flags = jnp.asarray(rng.integers(0, 2, n_steps), jnp.int32)
        return idx, steps, flags

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
    sps = n_passes * n_steps * B / dt
    ms_per_step = 1000 * dt / (n_passes * n_steps)
    print(f"[mp={mp_impl}/{mp_precision} lem={lem_impl}] compile {compile_s:.1f}s | {ms_per_step:.3f} ms/step "
          f"| {sps:.0f} samples/s | losses finite: "
          f"{bool(np.isfinite(np.asarray(losses)).all())}", flush=True)
    return sps


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices())
    r = {}
    for mp, lem, prec in (
        ("xla", "xla", "float32"),
        ("pallas", "xla", "float32"),
        ("pallas_pair", "xla", "float32"),
        ("pallas", "xla", "bfloat16s"),
        ("pallas_pair", "xla", "bfloat16s"),
    ):
        r[(mp, lem, prec)] = bench_impl(mp, lem_impl=lem, mp_precision=prec)
    base = r[("xla", "xla", "float32")]
    for k, v in r.items():
        print(f"mp={k[0]:6s}/{k[2]:8s} lem={k[1]:6s}: {v:.0f} samples/s "
              f"({v / base:.2f}x vs xla/xla)")


if __name__ == "__main__":
    main()
