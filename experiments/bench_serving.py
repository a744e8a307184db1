"""Serving-path benchmark: rollout latency/throughput per batch bucket.

Loads the newest trained E1 MSMP-PDE checkpoint, builds the production
RolloutEngine (uniform-grid metadata — no dataset load), and measures the
full 8-window autoregressive rollout (the E1 eval horizon: nr_gt_steps=2,
t_res=250, tw=25) per bucket. One JSON line per bucket plus a summary line.

The measurement is END-TO-END per request — engine.rollout() returns host
numpy, so every rep pays the full dispatch + device-to-host transfer round
trip through the axon tunnel. That is deliberate: it is the latency a
serving client actually observes (unlike bench.py's fused training pass,
which amortizes dispatch on purpose). ``--reps`` requests are averaged to
tame tunnel jitter.
"""
import argparse
import glob
import json
import os
import sys
import time

import numpy as np

# runnable as a plain script from the repo root (the package is not
# installed; python puts experiments/ on sys.path, not the CWD)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def newest_checkpoint(pattern="models/MSMP-PDE_CE_E1_*"):
    cands = sorted(glob.glob(pattern), key=os.path.getmtime)
    if not cands:
        raise SystemExit(f"no checkpoint matches {pattern}")
    return cands[-1]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 4, 16])
    p.add_argument("--n_windows", type=int, default=8)
    p.add_argument("--reps", type=int, default=32)
    p.add_argument("--platform", type=str, default="default",
                   help="e.g. cpu for a hardware-free sanity run")
    args = p.parse_args()

    import jax

    if args.platform != "default":
        jax.config.update("jax_platforms", args.platform)

    from msmp_pde_tpu.parallel.mesh import wait_for_backend
    from msmp_pde_tpu.serving.engine import (
        RolloutEngine,
        build_serving_trainer,
    )
    from msmp_pde_tpu.utils.checkpoint import restore_params

    wait_for_backend()
    ckpt = args.checkpoint or newest_checkpoint()
    trainer = build_serving_trainer("E1", "MSMP-PDE")
    params = trainer.init_params(jax.random.PRNGKey(0))
    params = restore_params(os.path.abspath(ckpt), trainer, params)
    engine = RolloutEngine(trainer, params, batch_buckets=tuple(args.buckets))
    nx, tw = int(trainer.spec.x.shape[-1]), trainer.tw

    rng = np.random.default_rng(0)
    rows = []
    for b in sorted(args.buckets):
        window = rng.normal(size=(b, nx, tw)).astype(np.float32)
        engine.rollout(window, start_step=2 * tw,
                       n_windows=args.n_windows)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = engine.rollout(window, start_step=2 * tw,
                                 n_windows=args.n_windows)
        dt = (time.perf_counter() - t0) / args.reps
        rows.append({
            "bucket": b,
            "latency_ms": round(1e3 * dt, 3),
            "trajectories_per_sec": round(b / dt, 2),
            "timesteps_per_sec": round(b * args.n_windows * tw / dt, 1),
        })
        print(json.dumps(
            {"metric": f"serving rollout (E1, {args.n_windows} windows)",
             **rows[-1]}))
        sys.stdout.flush()
    best = max(rows, key=lambda r: r["trajectories_per_sec"])
    print(json.dumps({
        "metric": "serving rollout summary (E1 MSMP-PDE, full eval horizon)",
        "checkpoint": ckpt,
        "n_windows": args.n_windows,
        "best_bucket": best["bucket"],
        "best_trajectories_per_sec": best["trajectories_per_sec"],
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
