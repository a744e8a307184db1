import time, numpy as np, jax, jax.numpy as jnp
from __graft_entry__ import _make_trainer

trainer = _make_trainer(tw=25, nx=100, n_layers=6)
rng = np.random.default_rng(0)
u_all = jnp.asarray(rng.normal(size=(256, 250, 100)).astype(np.float32))
params0 = trainer.init_params(jax.random.PRNGKey(0), batch_size=2)
print("init done", flush=True)
tx = trainer.make_optimizer(1e-4, 0.4, [1,5,10,15], 10**6)

for B in (16, 64, 256):
    params = jax.tree.map(jnp.copy, params0)
    opt_state = jax.tree.map(jnp.asarray, tx.init(params))
    fn = trainer.train_step_fn(tx, unrolled=1)
    idx = jnp.arange(B, dtype=jnp.int32) % 256
    steps = jnp.full((B,), 50, jnp.int32)
    t0 = time.perf_counter()
    params, opt_state, loss = fn(params, opt_state, u_all, {}, idx, steps)
    loss.block_until_ready()
    print(f"B={B}: compile {time.perf_counter()-t0:.1f}s", flush=True)
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        params, opt_state, loss = fn(params, opt_state, u_all, {}, idx, steps)
    loss.block_until_ready()
    dt = (time.perf_counter() - t0) / n
    print(f"B={B}: {dt*1e3:.2f} ms/step, {B/dt:.0f} samples/s", flush=True)
