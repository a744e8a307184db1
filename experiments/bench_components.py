"""Component-level timing + HBM-traffic decomposition of the MSMP-PDE
train step on the real TPU (PERF.md §3, VERDICT r5 #6).

Decomposes the production step (E1 config: B=16, nx=100, tw=25, 6 gated MP
pairs, hidden=128, mp=auto→Pallas, lem=auto→nohoist_remat) by timing:

  * the full model fwd / fwd+bwd (6 gated MP pairs)
  * a layers=0 variant (encoder + decoder only) → MP stack share by
    subtraction
  * the standalone LEM temporal encoder (T=25 scan over [25, 1600, 3])
  * the AdamW update alone (full param tree)
  * window slicing (per-sample dynamic windows out of the [256,250,100]
    resident trajectory pool — the loader's on-device share)

and, per component, XLA's own cost_analysis "bytes accessed" / flops of
the mathematically identical mp_impl=xla lowering (cost_analysis cannot
see inside Pallas custom calls; the wall-clock stays the production
measurement), so step-time and step-traffic decompose on the same table.

Run while the chip is free: python experiments/bench_components.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return 1000 * (time.perf_counter() - t0) / n


def cost(jfn, *args):
    """(GFLOP, GB) from the compiled program's own cost model, or Nones."""
    try:
        ca = jfn.lower(*args).compile().cost_analysis()
        return (float(ca.get("flops", 0.0)) / 1e9,
                float(ca.get("bytes accessed", 0.0)) / 1e9)
    except Exception as e:  # noqa: BLE001 — availability differs per backend
        print(f"# cost_analysis unavailable: {e!r}", file=sys.stderr)
        return None, None


def model_times(n_layers, mp_impl="auto"):
    import jax
    import jax.numpy as jnp

    from experiments.bench_pallas import make_trainer

    B, nx, tw = 16, 100, 25
    trainer = make_trainer(mp_impl, n_layers=n_layers, nx=nx, tw=tw,
                           lem_impl="auto")
    model, spec = trainer.model, trainer.spec
    rng = np.random.default_rng(0)
    window = jnp.asarray(rng.normal(size=(B, nx, tw)).astype(np.float32))
    pos_x = jnp.broadcast_to(spec.x, (B, nx))
    t = jnp.zeros((B,), jnp.float32)
    var = jnp.zeros((B, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), window, pos_x, t, var,
                        spec.idx, spec.mask)

    @jax.jit
    def fwd(p, w):
        out, _ = model.apply(p, w, pos_x, t, var, spec.idx, spec.mask)
        return out

    @jax.jit
    def fwdbwd(p, w):
        def loss(p):
            out, _ = model.apply(p, w, pos_x, t, var, spec.idx, spec.mask)
            return jnp.mean(out ** 2)
        return jax.value_and_grad(loss)(p)

    tf = timeit(fwd, params, window)
    tb = timeit(fwdbwd, params, window)
    return tf, tb, fwdbwd, (params, window), trainer, params


def main():
    import jax
    import jax.numpy as jnp
    import optax

    print("backend:", jax.default_backend(), flush=True)
    B, nx, nt, tw, H = 16, 100, 250, 25, 128

    res = {}  # name -> (ms, GFLOP|None, GB|None)

    # production wall-clock; traffic from the xla-lowered twin
    tf6, tb6, _, _, trainer, params = model_times(6, "auto")
    _, _, fb6x, args6x, _, _ = model_times(6, "xla")
    gf6, gb6 = cost(fb6x, *args6x)
    res["model fwd (6 layers)"] = (tf6, None, None)
    res["model fwd+bwd (6 layers)"] = (tb6, gf6, gb6)
    tf0, tb0, fb0x, args0x, _, _ = model_times(0, "xla")
    gf0, gb0 = cost(fb0x, *args0x)
    res["model fwd (0 layers)"] = (tf0, None, None)
    res["model fwd+bwd (0 layers)"] = (tb0, gf0, gb0)

    # standalone LEM encoder core (production impl resolution)
    from msmp_pde_tpu.models.lem import LEM

    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.normal(size=(tw, B * nx, 3)).astype(np.float32))
    lem = LEM(hidden=H, impl="auto")
    lp = lem.init(jax.random.PRNGKey(0), seq, None)

    @jax.jit
    def lem_fwd(p, s):
        y, _ = lem.apply(p, s, None)
        return y

    @jax.jit
    def lem_bwd(p, s):
        def loss(p):
            y, _ = lem.apply(p, s, None)
            return jnp.mean(y ** 2)
        return jax.value_and_grad(loss)(p)

    lgf, lgb = cost(lem_bwd, lp, seq)
    res["LEM fwd"] = (timeit(lem_fwd, lp, seq), None, None)
    res["LEM fwd+bwd"] = (timeit(lem_bwd, lp, seq), lgf, lgb)

    # optimizer update alone (full param tree)
    tx = trainer.make_optimizer(1e-4, 0.4, [1, 5, 10, 15], 10**6)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def opt(p, s, g):
        updates, s2 = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s2

    ogf, ogb = cost(opt, params, opt_state, grads)
    res["adamw update"] = (timeit(opt, params, opt_state, grads), ogf, ogb)

    # window slicing: the on-device loader share — gather B dynamic
    # [tw + 2*tw]-length windows from the resident trajectory pool
    # (training/loop.py slices input window + rollout targets per step)
    u_all = jnp.asarray(rng.normal(size=(256, nt, nx)).astype(np.float32))
    idxs = jnp.asarray(rng.integers(0, 256, (B,)), jnp.int32)
    steps = jnp.asarray(rng.integers(tw, nt - 3 * tw, (B,)), jnp.int32)

    @jax.jit
    def slice_windows(u, i, s):
        def one(ii, ss):
            traj = u[ii]
            win = jax.lax.dynamic_slice_in_dim(traj, ss - tw, 3 * tw, axis=0)
            return win
        return jax.vmap(one)(i, s)

    sgf, sgb = cost(slice_windows, u_all, idxs, steps)
    res["window slicing"] = (timeit(slice_windows, u_all, idxs, steps),
                             sgf, sgb)

    print(f"{'component':26s}  {'ms':>8s}  {'GFLOP':>7s}  {'GB':>7s}",
          flush=True)
    for k, (ms, gf, gb) in res.items():
        gfs = f"{gf:7.2f}" if gf is not None else "      -"
        gbs = f"{gb:7.3f}" if gb is not None else "      -"
        print(f"{k:26s}: {ms:8.3f}  {gfs}  {gbs}", flush=True)
    print(f"MP stack share (fwd+bwd)  : {tb6 - tb0:7.3f} ms"
          + (f"  {gf6 - gf0:7.2f} GFLOP  {gb6 - gb0:7.3f} GB"
             if gf6 is not None and gf0 is not None else ""))
    print(f"encoder+decoder (fwd+bwd) : {tb0:7.3f} ms "
          f"(LEM core {res['LEM fwd+bwd'][0]:.3f})")


if __name__ == "__main__":
    main()
