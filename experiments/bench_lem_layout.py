"""A/B: LEM input-projection layout on the real chip (round-4 VERDICT #3).

The hoisted layout materializes gx/zx [T, N, 4H] (~80 MB at the E1 config)
to HBM between the projection matmul and the unrolled scan; 'nohoist'
computes [x_t, y] @ W.T inside each step (the lem_cuda layout) and streams
only the [T, N, I] raw inputs (I ~ 5). 'remat' variants wrap the scan step
in jax.checkpoint so the backward recomputes each cell's gates from the
saved (y, z) carries instead of stashing ~3x more per-cell intermediates —
a traffic-for-FLOPs trade for the HBM-bound regime (PERF.md §2).
Exact-parity tests: tests/test_lem_pallas.py::{test_nohoist_parity,
test_remat_parity}. Times the production fused
train pass at the E1 config (the reliable measurement; standalone
micro-benches through the tunnel are not — NOTES_ROUND3.md).

Run while the chip is free: python experiments/bench_lem_layout.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_pallas import bench_impl  # noqa: E402


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices())
    r = {}
    for mp, lem in (
        ("pallas_pair", "xla"),            # round-3 production
        ("pallas_pair", "nohoist"),        # candidate: no [T,N,4H] HBM hop
        ("pallas_pair", "remat"),          # candidate: no per-cell gate stash
        ("pallas_pair", "nohoist_remat"),  # both traffic cuts
        ("xla", "nohoist"),
        ("xla", "xla"),
    ):
        r[(mp, lem)] = bench_impl(mp, lem_impl=lem, n_passes=4)
    base = r[("pallas_pair", "xla")]
    best = max(r, key=r.get)
    for k, v in r.items():
        print(f"mp={k[0]:12s} lem={k[1]:8s}: {v:.0f} samples/s "
              f"({v / base:.3f}x vs production)")
    print(f"BEST: mp={best[0]} lem={best[1]} at {r[best]:.0f} samples/s "
          f"({1000 * 16 / r[best]:.3f} ms/step)")


if __name__ == "__main__":
    main()
