"""Per-chunk timing distribution for the datagen sub-bench (VERDICT r4 #7).

probe1 showed: dispatch RTT 0.19 ms, n_chunks=2 -> 25.3 samples/s,
n_chunks=8 -> 214 samples/s in the same process. The 2-chunk headline is
therefore dominated by a first-executions overhead, not steady-state
compute. This probe times each chunk-pair individually to localize it.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.datagen import ics
    from msmp_pde_tpu.equations import CE
    from msmp_pde_tpu.temporal import DOPRI45, solve_adaptive

    B = 16
    pdes = [CE(tmin=0.0, tmax=4.0, grid_size=(250, nx)) for nx in (200, 100)]
    solvers = []
    for pde in pdes:
        x = jnp.linspace(0.0, pde.L, pde.nx)
        ts = jnp.linspace(pde.tmin, pde.tmax, pde.nt)

        def make(pde=pde, x=x, ts=ts):
            def f(A, omega, phi, l):
                def force(t):
                    arg = omega * t + 2.0 * jnp.pi * l * x[:, None] / pde.L + phi
                    return jnp.sum(A * jnp.sin(arg), axis=-1)[:, None, :]

                rhs = pde.make_rhs(
                    jnp.ones((B, 1, 1)), jnp.zeros((B, 1, 1)),
                    jnp.zeros((B, 1, 1)), force,
                )
                return solve_adaptive(rhs, force(0.0), ts, DOPRI45)

            return jax.jit(f)

        solvers.append(make())

    key = jax.random.PRNGKey(0)
    pde0 = pdes[0]

    def draw(key):
        return ics.sample_sine_params(key, B, pde0.n_waves, pde0.lmin,
                                      pde0.lmax)

    # warmup/compile, exactly as bench_datagen_e1 does
    t0 = time.perf_counter()
    for s in solvers:
        s(*draw(key)).block_until_ready()
    warm_s = time.perf_counter() - t0

    per_solver_ms = []  # [ [nx200_ms, nx100_ms], ... ] per chunk
    for i in range(10):
        key, k = jax.random.split(key)
        p = draw(k)
        row = []
        for s in solvers:
            t0 = time.perf_counter()
            s(*p).block_until_ready()
            row.append(round((time.perf_counter() - t0) * 1e3, 1))
        per_solver_ms.append(row)
    print(json.dumps({"warmup_s": round(warm_s, 2),
                      "chunk_ms": per_solver_ms}))


if __name__ == "__main__":
    main()
