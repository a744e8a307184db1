"""A/B the Pallas LEM scan tile sizes vs the unrolled XLA scan on the TPU.

Round-2 measured the R=512 Pallas scan LOSING to XLA (0.84x in the full
pass). Hypothesis: 100 sequential grid steps (4 row tiles x 25 timesteps)
pay per-step overhead that larger row tiles amortize, and the primal path
now skips the [T,N,H] state stashes entirely. This measures:

  1. standalone LEM fwd / fwd+bwd: xla vs pallas at several
     (rows_fwd, rows_bwd) tilings, production shapes [25, 1600, 128];
  2. the full MSMP-PDE fused train pass with lem=pallas-best vs lem=xla
     (mp=pallas_pair both sides).

Run while the chip is free: python experiments/bench_lem.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, *args, n=100):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return 1000 * (time.perf_counter() - t0) / n


def standalone():
    import functools

    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.models.lem import LEM
    from msmp_pde_tpu.ops import lem_pallas

    T, N, I, H = 25, 1600, 3, 128
    rng = np.random.default_rng(0)
    seq = jnp.asarray(rng.normal(size=(T, N, I)).astype(np.float32))

    def bench_impl(label, impl, rows=None):
        if rows is not None:
            orig = lem_pallas.lem_scan

            def patched(*a, **k):
                k.setdefault("rows_fwd", rows[0])
                k.setdefault("rows_bwd", rows[1])
                return orig(*a, **k)

            lem_pallas.lem_scan = patched
        try:
            lem = LEM(hidden=H, impl=impl)
            p = lem.init(jax.random.PRNGKey(0), seq, None)

            @jax.jit
            def fwd(p, s):
                y, _ = lem.apply(p, s, None)
                return y

            @jax.jit
            def fwdbwd(p, s):
                def loss(p):
                    y, _ = lem.apply(p, s, None)
                    return jnp.mean(y ** 2)
                return jax.value_and_grad(loss)(p)

            tf = timeit(fwd, p, seq)
            tb = timeit(fwdbwd, p, seq)
            print(f"{label:24s}: fwd {tf:7.3f} ms | fwd+bwd {tb:7.3f} ms",
                  flush=True)
            return tb
        finally:
            if rows is not None:
                lem_pallas.lem_scan = orig

    results = {}
    results["xla"] = bench_impl("lem=xla", "xla")
    for rows in ((512, 512), (1024, 512), (2048, 512), (1024, 1024),
                 (2048, 1024)):
        key = f"pallas R{rows[0]}/{rows[1]}"
        try:
            results[key] = bench_impl(f"lem={key}", "pallas", rows)
        except Exception as e:
            print(f"lem={key}: FAILED {type(e).__name__}: {e}", flush=True)
    best = min(results, key=results.get)
    print(f"best: {best} ({results[best]:.3f} ms)", flush=True)
    return best, results


def full_pass(best_rows):
    from experiments.bench_pallas import bench_impl
    from msmp_pde_tpu.ops import lem_pallas

    sps_x = bench_impl("pallas_pair", lem_impl="xla")
    orig = lem_pallas.lem_scan

    def patched(*a, **k):
        k.setdefault("rows_fwd", best_rows[0])
        k.setdefault("rows_bwd", best_rows[1])
        return orig(*a, **k)

    lem_pallas.lem_scan = patched
    try:
        sps_p = bench_impl("pallas_pair", lem_impl="pallas")
    finally:
        lem_pallas.lem_scan = orig
    print(f"full pass: lem=xla {sps_x:.0f} vs lem=pallas {sps_p:.0f} "
          f"samples/s ({sps_p / sps_x:.3f}x)", flush=True)


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    best, results = standalone()
    if best == "xla":
        print("pallas loses standalone at every tiling; skipping full pass",
              flush=True)
        return
    rows = tuple(int(x) for x in best.split("R")[1].split("/"))
    full_pass(rows)


if __name__ == "__main__":
    main()
