"""Benchmark: MSMP-PDE training throughput on one chip.

Measures the full jitted optimizer step (window slicing + pushforward
rollout + forward + backward + AdamW) for the flagship MSMP-PDE model at the
reference's default E1 training config (batch_size=16, nx=100, tw=25,
6 gated layer pairs, hidden=128 — experiments/train.py:452-498) and reports
trajectories(windows)/sec/chip.

vs_baseline compares against an estimated torch reference throughput on
A100: the reference rebuilds a PyG graph on host every batch
(common/utils.py:320-428) and runs ~1.2M-param gated GNN fwd+bwd over 1600
nodes / ~19k edges; we estimate ~30 ms/step (~533 samples/s) for the CUDA
implementation including its host-side graph construction. BASELINE.md
records that the repository itself publishes no numbers.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 533.0  # estimated A100 torch reference (see above)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_trainer

    B, nx, nt, tw = 16, 100, 250, 25
    trainer = _make_trainer(tw=tw, nx=nx, n_layers=6)

    rng = np.random.default_rng(0)
    u_all = jnp.asarray(rng.normal(size=(256, nt, nx)).astype(np.float32))
    var_all = {}

    params = trainer.init_params(jax.random.PRNGKey(0), batch_size=B)
    tx = trainer.make_optimizer(1e-4, 0.4, [1, 5, 10, 15], 10**6)
    opt_state = tx.init(params)
    # the production path: a whole loader pass (scan of optimizer steps with
    # per-batch pushforward depth) fused into one jit call
    fn = trainer.train_pass_fn(tx, max_unroll=1)

    n_steps = 64

    def pass_inputs():
        idx = jnp.asarray(rng.integers(0, 256, (n_steps, B)), jnp.int32)
        steps = jnp.asarray(rng.integers(tw, nt - 3 * tw, (n_steps, B)), jnp.int32)
        flags = jnp.asarray(rng.integers(0, 2, n_steps), jnp.int32)
        return idx, steps, flags

    # warmup / compile
    idx, steps, flags = pass_inputs()
    params, opt_state, losses = fn(params, opt_state, u_all, var_all, idx,
                                   steps, flags)
    losses.block_until_ready()

    n_passes = 4
    inputs = [pass_inputs() for _ in range(n_passes)]
    t0 = time.perf_counter()
    for idx, steps, flags in inputs:
        params, opt_state, losses = fn(
            params, opt_state, u_all, var_all, idx, steps, flags
        )
    losses.block_until_ready()
    dt = time.perf_counter() - t0

    samples_per_sec = n_passes * n_steps * B / dt
    print(
        json.dumps(
            {
                "metric": "MSMP-PDE train throughput (E1 cfg, bs=16, nx=100, pushforward=1)",
                "value": round(samples_per_sec, 2),
                "unit": "samples/sec/chip",
                "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
