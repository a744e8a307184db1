"""Corrected scoped-VMEM A/B (2 arms, small enough to slot between queue
stages): the axon backend hard-rejects --xla_tpu_scoped_vmem_limit_kib
(F-level "Unknown flag" abort — experiments/log/bench_vmem_budget.log), so
this raises only OUR per-kernel estimate budget (MSMP_PALLAS_VMEM_BUDGET_MB,
set by the caller: fwd bb 4->8, bwd 2->4) against the backend's default
scoped-vmem limit; a Mosaic allocation failure is itself the A/B answer.

Arms: production (mp=pallas_pair, lem=nohoist_remat after d2f18e2) at the
caller's budget, vs the same config re-measured here as the in-process
control when the env is unset.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_pallas import bench_impl  # noqa: E402


def main():
    import jax

    budget = os.environ.get("MSMP_PALLAS_VMEM_BUDGET_MB", "10 (default)")
    print("backend:", jax.default_backend(), jax.devices(),
          "| MSMP_PALLAS_VMEM_BUDGET_MB =", budget)
    r = bench_impl("pallas_pair", lem_impl="nohoist_remat")
    print(f"BEST: budget={budget} -> {r:.0f} samples/s "
          f"(compare the unset-budget pair/nohoist_remat arm in "
          f"experiments/log/bench_lem_layout.log)")


if __name__ == "__main__":
    main()
