"""Root-cause the datagen sub-bench drift (VERDICT r4 #7).

BENCH_r02 recorded datagen_e1_samples_per_sec_chip = 31.2; the r4g and
round-5 captures read 25.2-25.3 even with the queue paused, so contention
is ruled out. Remaining suspects:
  (a) fixed per-dispatch tunnel latency (the sub-bench is 4 dispatch+
      barrier round trips for 32 samples; ~60 ms/dispatch extra fully
      explains 31->25),
  (b) a real compute regression in the adaptive WENO5+Dopri45 path.
Discriminator: re-run the identical measurement at n_chunks=2 (headline
config) and n_chunks=8 (amortizes dispatch latency 4x), plus measure the
raw dispatch RTT with a trivial add. If throughput recovers toward 31 at
n_chunks=8 and the RTT is tens of ms, the drift is (a): a boot/tunnel
property, not a code regression.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import bench_datagen_e1  # noqa: E402  (side-effect free: bench's work is __main__-gated)


def dispatch_rtt(n=20):
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128))
    f(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        x = f(x)
        x.block_until_ready()
    return (time.perf_counter() - t0) / n


def main():
    rtt = dispatch_rtt()
    out = {"dispatch_rtt_ms": round(rtt * 1e3, 2)}
    for n_chunks in (2, 8):
        sps = bench_datagen_e1(n_chunks=n_chunks)
        out[f"datagen_sps_chunks{n_chunks}"] = round(sps, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
