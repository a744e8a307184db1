"""Component-level timing of the MSMP-PDE train step on the real TPU.

The fused optimizer step is 2.318 ms (mp=pallas_pair). To target the next
optimization, decompose the step at the production E1 config by timing:

  * the full model fwd / fwd+bwd (6 gated MP pairs)
  * a layers=0 variant (encoder + decoder only) -> MP stack share by
    subtraction
  * the standalone LEM temporal encoder (T=25 scan over [25, 1600, 3])
  * the AdamW update alone

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


def model_times(n_layers):
    import jax
    import jax.numpy as jnp

    from experiments.bench_pallas import make_trainer

    B, nx, tw = 16, 100, 25
    trainer = make_trainer("pallas_pair", n_layers=n_layers, nx=nx, tw=tw)
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
    return tf, tb, trainer, params


def main():
    import jax
    import jax.numpy as jnp
    import optax

    print("backend:", jax.default_backend(), flush=True)
    B, nx, tw, H = 16, 100, 25, 128

    res = {}
    tf6, tb6, trainer, params = model_times(6)
    res["model fwd (6 layers)"] = tf6
    res["model fwd+bwd (6 layers)"] = tb6
    tf0, tb0, _, _ = model_times(0)
    res["model fwd (0 layers)"] = tf0
    res["model fwd+bwd (0 layers)"] = tb0

    # standalone LEM encoder core
    from msmp_pde_tpu.models.lem import LEM

    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.normal(size=(tw, B * nx, 3)).astype(np.float32))
    lem = LEM(hidden=H, impl="xla")
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

    res["LEM fwd"] = timeit(lem_fwd, lp, seq)
    res["LEM fwd+bwd"] = timeit(lem_bwd, lp, seq)

    # optimizer update alone (full param tree)
    tx = trainer.make_optimizer(1e-4, 0.4, [1, 5, 10, 15], 10**6)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)

    @jax.jit
    def opt(p, s, g):
        updates, s2 = tx.update(g, s, p)
        return optax.apply_updates(p, updates), s2

    res["adamw update"] = timeit(opt, params, opt_state, grads)

    for k, v in res.items():
        print(f"{k:26s}: {v:7.3f} ms", flush=True)
    print(f"MP stack share (fwd+bwd)  : {tb6 - tb0:7.3f} ms")
    print(f"encoder+decoder (fwd+bwd) : {tb0:7.3f} ms "
          f"(LEM core {res['LEM fwd+bwd']:.3f})")


if __name__ == "__main__":
    main()
