"""Clean paired scoped-VMEM-budget A/B: both arms in ONE process,
back-to-back, so whatever tunnel contention exists hits both equally
(the axon tunnel multiplexes concurrent clients at program granularity —
observed 2026-08-18 when bench_vmem2.py completed while bench_mfu.py held
the chip — so single-arm absolute timings can be contaminated; a paired
relative signal is robust).

MSMP_PALLAS_VMEM_BUDGET_MB is read from os.environ at TRACE time
(ops/mp_pallas.py::best_batch_block), so toggling it between bench_impl
calls re-blocks the kernels: 10 MB (default, fwd bb=4 / bwd bb=2 at the
E1 config) vs 20 MB (fwd bb=8 / bwd bb=4). The backend's own scoped-VMEM
compile limit stays at its default — axon hard-rejects
--xla_tpu_scoped_vmem_limit_kib — so a Mosaic allocation failure in the
20 MB arm would itself be the answer (it compiled fine in bench_vmem2).
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench_pallas import bench_impl  # noqa: E402


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices())
    r = {}
    for budget in ("10", "20", "10", "20"):  # ABAB to expose drift
        os.environ["MSMP_PALLAS_VMEM_BUDGET_MB"] = budget
        r.setdefault(budget, []).append(
            bench_impl("pallas_pair", lem_impl="nohoist_remat"))
    m10, m20 = max(r["10"]), max(r["20"])  # best-of under contention
    print(f"budget=10MB best {m10:.0f} samples/s | budget=20MB best "
          f"{m20:.0f} samples/s | ratio {m20 / m10:.3f}x")
    print(f"BEST: budget={'20' if m20 > m10 else '10'}MB")


if __name__ == "__main__":
    main()
