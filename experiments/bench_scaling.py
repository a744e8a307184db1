"""Batch-size scaling of the fused train pass on one v5e chip.

The reference trains at batch_size=16 (A100, host-built PyG graphs). On a
TPU that leaves the MXU underfilled: this measures samples/s and ms/step
for the production fused pass at growing batch sizes (the Pallas MP kernel
batch-blocks at bb<=8, so larger B just means more grid steps; the LEM/
decoder matmuls get proportionally taller and more efficient).

Run while the chip is free: python experiments/bench_scaling.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from experiments.bench_pallas import bench_impl  # noqa: E402


def main():
    import jax

    print("backend:", jax.default_backend(), flush=True)
    base = None
    for B in (16, 32, 64, 128):
        sps = bench_impl("auto", B=B)
        base = base or sps
        print(f"B={B:4d}: {sps:8.0f} samples/s ({sps / base:.2f}x vs B=16)",
              flush=True)


if __name__ == "__main__":
    main()
