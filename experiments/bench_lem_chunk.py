"""Paired ABAB A/B: lem nohoist_remat (per-step checkpoint, the current
TPU auto default) vs nohoist_chunked (sqrt-style: carries saved at chunk
boundaries only, C=5 at tw=25 — ~80% less carry-stash HBM traffic for one
extra chunk-forward of recompute, ~1% of step FLOPs).

Both arms run back-to-back in one process so tunnel contention (the axon
tunnel multiplexes concurrent clients) hits them equally; the relative
signal decides whether auto moves to the chunked variant. Parity:
tests/test_lem_pallas.py::test_remat_parity.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_pallas import bench_impl  # noqa: E402


def main():
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("--tw", type=int, default=25,
                    help="temporal-bundling window (25 = headline E1 "
                         "config; 50 = the kdv config where the carry "
                         "stash is 2x and chunking is predicted to win)")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), jax.devices())
    print(f"tw={args.tw}")
    r = {}
    for lem in ("nohoist_remat", "nohoist_chunked",
                "nohoist_remat", "nohoist_chunked"):  # ABAB: expose drift
        r.setdefault(lem, []).append(
            bench_impl("pallas_pair", tw=args.tw, lem_impl=lem))
    a, b = max(r["nohoist_remat"]), max(r["nohoist_chunked"])
    print(f"nohoist_remat best {a:.0f} samples/s | nohoist_chunked best "
          f"{b:.0f} samples/s | ratio {b / a:.3f}x")
    print(f"BEST: {'nohoist_chunked' if b > a else 'nohoist_remat'}")


if __name__ == "__main__":
    main()
