"""Production-step perf capture for the 2-component (2D) model family.

PERF.md characterizes the 1D headline step (E1, MSMP-PDE) down to a
speed-of-light closure, but the 2D family — the n_components=2 gated
variants that produce the MSWG3 master-table rows (reference:
experiments/train.py 2D branches + models_gnn.py two-component
MP-PDE variants) — had no perf row at all. This times the SAME
production fused train pass (`Trainer.train_pass_fn`) that
`training/train.py::fit` runs, on the real MSWG3 dataset, per model:

  * ms/step + samples/s at the reference config (B=16, nx=100, tw=25),
  * cost_analysis FLOPs/bytes of the mathematically identical
    mp_impl=xla lowering (same basis as bench.py / bench_mfu.py:
    per-pushforward-depth single-step lowerings weighted by the
    measured flag mix; the wall-clock stays the production auto path),
  * MFU vs the v5e bf16/f32 peaks and the implied HBM utilization.

Run while the chip is free (a queue stage, not alongside a trainer —
both stage the ~1.2 GB trajectory pool):
  python experiments/bench_2d.py [Gated2D MSMP-PDE2D ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_F32_FLOPS = 49.2e12
V5E_HBM_BW = 819e9  # bytes/s

EXPERIMENT = "MSWG3"
DEFAULT_MODELS = ("Gated2D", "MSMP-PDE2D", "MSGMP-PDE2D", "MP-PDE2D")


def bench_model(name: str, n_passes: int = 3):
    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.training.loop import Trainer
    from msmp_pde_tpu.training.setup import setup_experiment
    from msmp_pde_tpu.training.train import build_parser

    args = build_parser().parse_args(
        ["--experiment", EXPERIMENT, "--model", name, "--batch_size", "16"]
    )
    exp = setup_experiment(args, modes=("train",))
    ds = exp.datasets["train"]
    # MSMP_BENCH2D_SAMPLES=N truncates the trajectory pool — CPU smoke
    # tests only; leave unset for the measurement (pool size feeds the
    # per-step gather but not the per-step math).
    n_sub = int(os.environ.get("MSMP_BENCH2D_SAMPLES", "0"))
    u_sup = ds.u_super[:n_sub] if n_sub else ds.u_super
    u_all = jnp.asarray(u_sup)
    var_all = {k: jnp.asarray(v[:n_sub].astype(np.float32) if n_sub
                              else v.astype(np.float32))
               for k, v in ds.variables.items()}

    trainer = exp.trainer
    tw, t_res, B = trainer.tw, exp.t_res, args.batch_size
    n = int(u_all.shape[0])
    n_batches = n // B

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    params = trainer.init_params(key, batch_size=B)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    tx = trainer.make_optimizer(args.lr, args.lr_decay, [1, 5, 10, 15],
                                t_res * n_batches)
    opt_state = tx.init(params)
    fn = trainer.train_pass_fn(tx, max_unroll=1)

    def pass_inputs():
        # exactly train_epoch's sampling (training/loop.py:329-339)
        perm = rng.permutation(n)[: n_batches * B]
        perm = perm.reshape(n_batches, B).astype(np.int32)
        flags = rng.integers(0, 2, n_batches).astype(np.int32)
        steps = np.stack(
            [rng.integers(tw, t_res - tw - tw * int(f) + 1, size=B)
             for f in flags]
        ).astype(np.int32)
        return jnp.asarray(perm), jnp.asarray(steps), jnp.asarray(flags)

    t0 = time.perf_counter()
    i, s, f = pass_inputs()
    params, opt_state, losses = fn(params, opt_state, u_all, var_all, i, s, f)
    losses.block_until_ready()
    compile_s = time.perf_counter() - t0

    inputs = [pass_inputs() for _ in range(n_passes)]
    t0 = time.perf_counter()
    for i, s, f in inputs:
        params, opt_state, losses = fn(params, opt_state, u_all, var_all,
                                       i, s, f)
    losses.block_until_ready()
    dt = time.perf_counter() - t0
    ms_per_step = 1000 * dt / (n_passes * n_batches)
    sps = n_passes * n_batches * B / dt

    # FLOPs from the mathematically identical all-XLA lowering when the
    # model carries Pallas kernels (cost_analysis cannot see inside custom
    # calls); grid-kind models (FNO2D) lower without Pallas, so their
    # production step is costed directly.
    flops_per_step = bytes_per_step = None
    try:
        if hasattr(exp.model, "mp_impl"):
            model_x = exp.model.clone(mp_impl="xla")
            tr_x = Trainer(model=model_x, kind=exp.kind, spec=exp.spec,
                           eq_norms=exp.eq_norms,
                           unstructured_x=trainer.unstructured_x)
        else:
            tr_x = trainer
        params_x = tr_x.init_params(jax.random.PRNGKey(0), batch_size=B)
        step_flops, step_bytes = {}, {}
        for u in (0, 1):
            fn_u = tr_x.train_step_fn(tx, unrolled=u)
            compiled = fn_u.lower(params_x, tx.init(params_x), u_all,
                                  var_all, i[0], s[0]).compile()
            ca = compiled.cost_analysis()
            step_flops[u] = float(ca["flops"])
            step_bytes[u] = float(ca.get("bytes accessed", 0.0))
        all_flags = np.concatenate([np.asarray(f) for _, _, f in inputs])
        p1 = float(all_flags.mean())
        flops_per_step = (1 - p1) * step_flops[0] + p1 * step_flops[1]
        bytes_per_step = (1 - p1) * step_bytes[0] + p1 * step_bytes[1]
    except Exception as e:  # noqa: BLE001 — per-backend availability
        print(f"# cost_analysis unavailable for {name}: {e!r}",
              file=sys.stderr, flush=True)

    if flops_per_step:
        sustained = flops_per_step / (ms_per_step / 1e3)
        mfu_bf16 = 100 * sustained / V5E_PEAK_BF16_FLOPS
        mfu_f32 = 100 * sustained / V5E_PEAK_F32_FLOPS
        hbm = 100 * bytes_per_step / (ms_per_step / 1e3) / V5E_HBM_BW
        print(f"{name:13s} params={n_params/1e6:5.2f}M | "
              f"compile {compile_s:5.1f}s | {ms_per_step:7.3f} ms/step | "
              f"{sps:7.0f} samples/s | {flops_per_step/1e9:7.2f} GFLOP/step | "
              f"MFU {mfu_bf16:5.2f}% bf16 / {mfu_f32:5.2f}% f32 | "
              f"{bytes_per_step/1e9:5.2f} GB/step HBM {hbm:5.1f}%",
              flush=True)
    else:
        print(f"{name:13s} params={n_params/1e6:5.2f}M | "
              f"compile {compile_s:5.1f}s | {ms_per_step:7.3f} ms/step | "
              f"{sps:7.0f} samples/s | FLOPs n/a", flush=True)


def main():
    import jax

    # MSMP_BENCH2D_PLATFORM=cpu for smoke tests: the ambient environment
    # pins JAX_PLATFORMS to the TPU plugin via a sitecustomize jax import,
    # so an env-var override is too late — go through jax.config like
    # tests/conftest.py (valid until first backend initialization).
    plat = os.environ.get("MSMP_BENCH2D_PLATFORM", "")
    if plat:
        jax.config.update("jax_platforms", plat)
    print("backend:", jax.default_backend(), flush=True)
    for name in (sys.argv[1:] or DEFAULT_MODELS):
        try:
            bench_model(name)
        except Exception as e:  # noqa: BLE001 — one failing model is a
            # datum, not a sweep failure
            msg = repr(e).replace("\n", " ")[:200]
            print(f"{name:13s} FAILED: {msg}", flush=True)


if __name__ == "__main__":
    main()
