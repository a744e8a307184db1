"""Benchmark: MSMP-PDE training throughput on one chip.

Measures the full jitted optimizer step (window slicing + pushforward
rollout + forward + backward + AdamW) for the flagship MSMP-PDE model at the
reference's default E1 training config (batch_size=16, nx=100, tw=25,
6 gated layer pairs, hidden=128 — experiments/train.py:452-498) and reports
trajectories(windows)/sec/chip.

vs_baseline is ESTIMATE-FREE: it is the measured ratio of our single-chip
E1 datagen throughput to the torch reference's own datagen throughput,
MEASURED on this host by running generate/generate_data.py unmodified
(experiments/torchref_e1.py; RESULTS.md). The A100 train-step comparison
(the reference rebuilds a PyG graph on host every batch and runs a
~1.2M-param gated GNN fwd+bwd; ~30 ms/step estimated) is an ESTIMATE —
the repo publishes no numbers (BASELINE.md) and its CUDA deps are not
installable here — so it is demoted to a clearly-labeled secondary key.

MFU: FLOPs per fused optimizer pass come from XLA's own
compiled.cost_analysis() (no hand counting); peaks are v5e datasheet
numbers (197 TFLOP/s bf16; ~49 TFLOP/s f32-via-MXU-passes). Matmuls run
at Precision.DEFAULT (single bf16 MXU pass with f32 accumulation), so
mfu_pct against the bf16 peak is the honest utilization number; the f32
ratio is reported alongside.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Outage-proofing (round 5 — cache-FIRST): the very first thing this script
does is print the last-known-good cached result as a complete JSON line
marked "provisional": true, flushed, BEFORE importing jax or probing the
backend. Whatever happens afterwards (probe timeout, cold-compile overrun,
tunnel wedge, SIGKILL from the driver's window), stdout already carries a
parseable line. A fresh capture is then attempted under one global budget
(MSMP_BENCH_TOTAL_S, default 420 s — sized to fit the driver window): the
backend probe is bounded and runs in killable subprocesses (a downed
backend makes an in-process jax init hang ~25 min), a watchdog emits the
cache and hard-exits if the run wedges, and when the remaining budget runs
low the MFU-lowering and datagen sub-benches are skipped with their keys
carried from cache (marked *_carried_from_cache). A successful fresh
capture prints a second, final JSON line (drivers that parse the last line
get the fresh number; drivers that parse the first line get the cache —
either parses).
"""
import glob
import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

# The driver invokes bench.py WITHOUT the queue's environment, so without
# this the driver-time run re-compiles every program cold through the
# tunnel (~7 min) while the queue's own runs sit on a warm disk cache in
# the same boot. Must be set before jax is imported (it is imported
# lazily, inside main()).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")

CACHE_PATH = os.environ.get(
    "MSMP_BENCH_CACHE_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "experiments", "bench_cache.json"))

BASELINE_SAMPLES_PER_SEC = 533.0  # estimated A100 torch reference (see above)

# run-watchdog progress marker (list so main() can mutate it in place);
# a cold-cache compile advances milestones, a wedged tunnel does not.
_MILESTONE = ["start"]

# pids of queue processes paused for this measurement (module-level so the
# run watchdog's fire() can resume them before hard-exiting)
_PAUSED = []

# v5e datasheet peaks (jax-ml.github.io/scaling-book hardware tables)
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_F32_FLOPS = 49.2e12
V5E_HBM_BW = 819e9  # bytes/s

# ESTIMATE-FREE secondary comparison: E1 datagen throughput. The torch
# reference's own datagen (generate/generate_data.py, run unmodified via
# experiments/torchref_e1.py) was MEASURED in this container: 2304 samples
# (2048/128/128) at the two training resolutions (250x200 + 250x100),
# batch 16, f64 CPU: 1077.7 s wall -> 2.138 samples/s. No estimates.
TORCH_REF_DATAGEN_SAMPLES_PER_SEC_MEASURED = 2304 / 1077.7


def bench_datagen_e1(n_chunks: int = 4, B: int = 16) -> float:
    """Our E1 datagen throughput on the current backend: adaptive
    WENO5+Dopri45 solves at both training resolutions, batched per chunk
    (mirrors msmp_pde_tpu.datagen.generate::generate_ce). Steady-state
    device throughput: compiles AND the eager IC-draw path are warmed
    before the timer (end-to-end full-run numbers incl. HDF5 writes are
    the RESULTS.md datagen wall-clock table)."""
    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.datagen import ics
    from msmp_pde_tpu.equations import CE
    from msmp_pde_tpu.temporal import DOPRI45, solve_adaptive

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

    # warmup/compile — including the eager IC-sampling path: the first
    # jax.random.split/sample call in a process triggers per-op remote
    # compiles (~1 s through the tunnel) which used to land INSIDE the
    # timed region and dwarf the ~190 ms of actual solve time. That is
    # what the historical 31.2 (r2) and 25.3 (r4) captures measured —
    # the drift between them was remote eager-compile latency noise,
    # not a datagen regression (probe: experiments/datagen_drift_probe*.py;
    # steady-state solves are ~60-110 ms per 16-sample chunk-pair).
    for s in solvers:
        s(*draw(key)).block_until_ready()
    key, k = jax.random.split(key)
    for a in draw(k):
        a.block_until_ready()
    t0 = time.perf_counter()
    for i in range(n_chunks):
        key, k = jax.random.split(key)
        p = draw(k)
        for s in solvers:
            s(*p).block_until_ready()
    dt = time.perf_counter() - t0
    return n_chunks * B / dt


def main(remaining=None, cached=None):
    """Fresh capture. `remaining()` -> seconds left in the global budget;
    when it runs low the MFU-lowering and datagen sub-benches are skipped
    and their keys carried from `cached` (the loaded cache payload), so the
    headline throughput number always lands inside the driver window."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _make_trainer

    if remaining is None:
        remaining = lambda: float("inf")
    cached_result = (cached or {}).get("result", {})
    _MILESTONE[0] = "jax imported, backend up"

    B, nx, nt, tw = 16, 100, 250, 25
    trainer = _make_trainer(tw=tw, nx=nx, n_layers=6)

    rng = np.random.default_rng(0)
    u_all = jnp.asarray(rng.normal(size=(256, nt, nx)).astype(np.float32))
    var_all = {}

    _MILESTONE[0] = "trainer built (tracing next)"
    params = trainer.init_params(jax.random.PRNGKey(0), batch_size=B)
    _MILESTONE[0] = "params initialized (train-pass compile next)"
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
    _MILESTONE[0] = "train pass compiled+warm"

    n_passes = 4
    inputs = [pass_inputs() for _ in range(n_passes)]
    t0 = time.perf_counter()
    for idx, steps, flags in inputs:
        params, opt_state, losses = fn(
            params, opt_state, u_all, var_all, idx, steps, flags
        )
    losses.block_until_ready()
    dt = time.perf_counter() - t0
    _MILESTONE[0] = "throughput timed"

    samples_per_sec = n_passes * n_steps * B / dt

    # MFU from XLA's own cost model. CRITICAL METHOD NOTE: cost_analysis
    # counts a lax.scan body ONCE regardless of trip count (verified:
    # identical "flops" for 2- and 4-step passes), so lowering the scanned
    # pass and dividing by n_steps understates FLOPs by ~n_steps — the bug
    # behind the r3-cached 0.18% figure. Instead we lower the SINGLE
    # optimizer step at each pushforward depth (the model's internal LEM/
    # LSTM scans are unroll=True, so nothing inside is trip-undercounted)
    # and weight by the measured flag mix. cost_analysis cannot see inside
    # Pallas custom calls, so the FLOPs come from the mathematically
    # identical mp_impl="xla" lowering; the wall-clock stays the production
    # (Pallas) measurement.
    mfu_carried = remaining() < 150.0  # 2 tunnel compiles don't fit
    try:
        if mfu_carried:
            raise TimeoutError(
                f"budget low ({remaining():.0f}s): MFU lowerings skipped, "
                "keys carried from cache")
        trainer_x = _make_trainer(tw=tw, nx=nx, n_layers=6, mp_impl="xla")
        params_x = trainer_x.init_params(jax.random.PRNGKey(0), batch_size=B)
        idx1, steps1 = idx[0], steps[0]
        step_flops, step_bytes = {}, {}
        for u in (0, 1):
            fn_u = trainer_x.train_step_fn(tx, unrolled=u)
            compiled = fn_u.lower(params_x, tx.init(params_x), u_all,
                                  var_all, idx1, steps1).compile()
            ca = compiled.cost_analysis()
            step_flops[u] = float(ca["flops"])
            step_bytes[u] = float(ca.get("bytes accessed", 0.0))
        # empirical pushforward-flag mix over the timed inputs
        all_flags = np.concatenate([np.asarray(f) for _, _, f in inputs])
        p1 = float(all_flags.mean())
        flops_per_step = (1.0 - p1) * step_flops[0] + p1 * step_flops[1]
        bytes_per_step = (1.0 - p1) * step_bytes[0] + p1 * step_bytes[1]
    except Exception as e:  # cost_analysis availability differs per backend
        flops_per_step = bytes_per_step = None
        print(f"# cost_analysis unavailable: {e!r}", file=sys.stderr)
    step_dt = dt / (n_passes * n_steps)
    if flops_per_step and np.isfinite(flops_per_step) and flops_per_step > 0:
        sustained = flops_per_step / step_dt
        mfu_bf16 = round(100.0 * sustained / V5E_PEAK_BF16_FLOPS, 2)
        mfu_f32 = round(100.0 * sustained / V5E_PEAK_F32_FLOPS, 2)
    else:
        flops_per_step = mfu_bf16 = mfu_f32 = None
    if bytes_per_step and np.isfinite(bytes_per_step) and bytes_per_step > 0:
        hbm_util = round(100.0 * (bytes_per_step / step_dt) / V5E_HBM_BW, 2)
    else:
        bytes_per_step = hbm_util = None
    if mfu_carried:
        # FLOPs/step is shape-determined, not run-determined, so carrying
        # cached cost_analysis numbers against THIS run's wall-clock is
        # sound as long as the config hash hasn't changed.
        cf = cached_result.get("flops_per_step")
        cb = cached_result.get("bytes_per_step")
        if cf:
            flops_per_step = cf
            mfu_bf16 = round(100.0 * (cf / step_dt) / V5E_PEAK_BF16_FLOPS, 2)
            mfu_f32 = round(100.0 * (cf / step_dt) / V5E_PEAK_F32_FLOPS, 2)
        if cb:
            bytes_per_step = cb
            hbm_util = round(100.0 * (cb / step_dt) / V5E_HBM_BW, 2)
    _MILESTONE[0] = "MFU lowered"

    datagen_carried = remaining() < 100.0
    if datagen_carried:
        datagen_sps = cached_result.get("datagen_e1_samples_per_sec_chip")
        print(f"# budget low ({remaining():.0f}s): datagen sub-bench "
              "skipped, key carried from cache", file=sys.stderr)
    else:
        datagen_sps = bench_datagen_e1()
    _MILESTONE[0] = "datagen timed"
    # vs_baseline refers to the SAME quantity as "value" (train throughput,
    # vs the clearly-labeled A100 torch-reference ESTIMATE — the repo
    # publishes no numbers and its CUDA deps are not installable here).
    # The estimate-free MEASURED comparison is the datagen ratio, reported
    # under its own key datagen_vs_torch_ref_measured.
    result = {
        "metric": "MSMP-PDE train throughput (E1 cfg, bs=16, nx=100, pushforward=1)",
        "value": round(samples_per_sec, 2),
        "unit": "samples/sec/chip",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 2),
        "vs_baseline_provenance": (
            "ESTIMATE: value / 533 samples/s, an estimated A100 torch "
            "reference train step (~30 ms: host-side PyG graph rebuild per "
            "batch + ~1.2M-param gated GNN fwd+bwd; the repo publishes no "
            "numbers — BASELINE.md). The estimate-free MEASURED comparison "
            "is datagen_vs_torch_ref_measured."
        ),
        "mfu_pct": mfu_bf16,
        "mfu_pct_vs_f32_peak": mfu_f32,
        "mfu_provenance": (
            "cost_analysis() FLOPs of the mathematically identical "
            "mp_impl=xla lowering (cost_analysis cannot see inside "
            "Pallas custom calls) / measured production wall-clock; "
            "v5e peaks 197 TFLOP/s bf16 (matmuls run at "
            "Precision.DEFAULT = single bf16 MXU pass) and 49.2 f32"
        ),
        "flops_per_step": flops_per_step,
        "bytes_per_step": bytes_per_step,
        "hbm_util_pct": hbm_util,
        "hbm_provenance": (
            "cost_analysis() 'bytes accessed' of the mp_impl=xla lowering "
            "on this backend / measured wall-clock / 819 GB/s v5e HBM; "
            "the production Pallas kernels fuse away some of this "
            "traffic, so it is an upper-bound traffic model"
        ),
        "datagen_vs_torch_ref_measured": round(
            datagen_sps / TORCH_REF_DATAGEN_SAMPLES_PER_SEC_MEASURED, 2
        ) if datagen_sps else None,
        "datagen_vs_torch_ref_provenance": (
            "MEASURED: our E1 datagen samples/s on one chip divided by the "
            "unmodified torch reference's datagen samples/s measured on "
            "this host (experiments/torchref_e1.py) — no estimates. Ours "
            "is steady-state solve throughput (compiles + eager IC draws "
            "warmed; captures before 2026-08-19 included ~1 s of one-time "
            "remote eager-op compiles in the timed window, reading 25-31); "
            "the torch number amortizes its overheads over 2304 samples."
        ),
        "datagen_e1_samples_per_sec_chip": (round(datagen_sps, 2)
                                            if datagen_sps else None),
        "datagen_torch_ref_measured_samples_per_sec": round(
            TORCH_REF_DATAGEN_SAMPLES_PER_SEC_MEASURED, 3
        ),
        "backend_down": False,
    }
    if mfu_carried:
        result["mfu_carried_from_cache"] = True
    if datagen_carried:
        result["datagen_carried_from_cache"] = True
    try:
        import jax

        result["device"] = str(jax.devices()[0].device_kind)
    except Exception:
        pass
    return result


# --- queue pause ------------------------------------------------------------
# The axon tunnel MULTIPLEXES concurrent clients (a second process's programs
# interleave rather than failing init — NOTES_ROUND4), so a driver-time bench
# run while a tpu_queue_* training stage is on the chip would silently measure
# ~half the real throughput. Pause the queue's process tree (SIGSTOP) for the
# measurement window and resume it after. Robustness: (a) our own ancestor
# chain is excluded, so when the QUEUE ITSELF runs bench.py nothing is frozen;
# (b) a detached failsafe resumer process SIGCONTs the stopped pids when this
# process exits by ANY means (including SIGKILL), so the queue can never stay
# frozen.

# argv: <bench_pid> <bench_start_time|0> <deadline_s> <pid>...
# Guards (ADVICE r4): (a) a pid-recycling race — if /proc/<bench>/stat's
# start time no longer matches the recorded one, the bench is gone even
# though some process answers kill(pid, 0); (b) a hard deadline after
# which the resumer unconditionally SIGCONTs and exits, so a bench that
# wedges (but stays alive) can never keep the queue frozen forever.
_RESUMER_SRC = """
import os, signal, sys, time
bench = int(sys.argv[1]); bstart = float(sys.argv[2])
deadline = time.monotonic() + float(sys.argv[3])
pids = [int(x) for x in sys.argv[4:]]
def start_time(pid):
    try:
        with open("/proc/stat") as f:
            btime = next(int(l.split()[1]) for l in f if l.startswith("btime"))
        with open(f"/proc/{pid}/stat") as f:
            rest = f.read().rsplit(")", 1)[1].split()
        return btime + int(rest[19]) / os.sysconf("SC_CLK_TCK")
    except (OSError, StopIteration, IndexError, ValueError):
        return None
while time.monotonic() < deadline:
    try:
        os.kill(bench, 0)
    except ProcessLookupError:
        break
    st = start_time(bench)
    if bstart and (st is None or abs(st - bstart) > 2.0):
        break  # pid recycled: the real bench is gone
    time.sleep(5)
for p in pids:
    try:
        os.kill(p, signal.SIGCONT)
    except ProcessLookupError:
        pass
"""


def _proc_tree(pid: int) -> list:
    out, stack = [], [pid]
    while stack:
        p = stack.pop()
        if not os.path.exists(f"/proc/{p}"):
            continue
        out.append(p)
        for tf in glob.glob(f"/proc/{p}/task/*/children"):
            try:
                with open(tf) as f:
                    stack += [int(c) for c in f.read().split()]
            except OSError:
                pass
    return out


def _ancestors() -> set:
    anc, pid = set(), os.getpid()
    while pid > 1:
        anc.add(pid)
        try:
            with open(f"/proc/{pid}/status") as f:
                ppid = next(int(l.split()[1]) for l in f
                            if l.startswith("PPid:"))
        except (OSError, StopIteration):
            break
        if ppid == pid:
            break
        pid = ppid
    return anc


def _start_time(pid: int):
    """Unix timestamp the process started, or None if unreadable."""
    try:
        with open("/proc/stat") as f:
            btime = next(int(l.split()[1]) for l in f
                         if l.startswith("btime"))
        with open(f"/proc/{pid}/stat") as f:
            # comm (field 2) may contain spaces — split after its ')'.
            rest = f.read().rsplit(")", 1)[1].split()
        return btime + int(rest[19]) / os.sysconf("SC_CLK_TCK")
    except (OSError, StopIteration, IndexError, ValueError):
        return None


def _pause_queues() -> list:
    """SIGSTOP every live tpu_queue_* process tree; returns stopped pids.

    Guards against bogus/stale pidfiles: a pidfile naming pid<=1 (or an
    unreadable pid) is ignored — walking the tree from init would
    SIGSTOP the entire system — and a pid that STARTED AFTER its
    pidfile was written is a recycled pid (the re-imaged host reuses
    low pids), not the queue that wrote the file.
    """
    stopped, anc = [], _ancestors()
    for pf in glob.glob("/tmp/tpu_queue_*.pid"):
        try:
            with open(pf) as f:
                qpid = int(f.read().strip())
            mtime = os.stat(pf).st_mtime
        except (OSError, ValueError):
            continue
        if qpid <= 1:
            continue
        st = _start_time(qpid)
        if st is None or st > mtime + 2.0:  # +2 s clock slack
            continue
        # Walk-then-stop fixed point (ADVICE r4): a child forked by an
        # already-walked-but-not-yet-stopped process escapes the first
        # SIGSTOP pass; stopped parents cannot fork, so re-walking until
        # no new pids appear converges (normally in <=2 passes).
        seen = set()
        for _ in range(8):
            fresh = [p for p in _proc_tree(qpid)
                     if p > 1 and p not in anc and p != os.getpid()
                     and p not in seen]
            if not fresh:
                break
            for p in fresh:
                seen.add(p)
                try:
                    os.kill(p, signal.SIGSTOP)
                    stopped.append(p)
                except (ProcessLookupError, PermissionError):
                    pass
    if stopped:
        print(f"# paused queue pids for the measurement: {stopped}",
              file=sys.stderr)
        run_s = float(os.environ.get("MSMP_BENCH_TOTAL_S", "420"))
        subprocess.Popen(
            [sys.executable, "-c", _RESUMER_SRC, str(os.getpid()),
             str(_start_time(os.getpid()) or 0.0), str(2.0 * run_s)]
            + [str(p) for p in stopped],
            start_new_session=True,
        )
    return stopped


def _resume_queues(stopped: list) -> None:
    for p in stopped:
        try:
            os.kill(p, signal.SIGCONT)
        except (ProcessLookupError, PermissionError):
            pass
    if stopped:
        print(f"# resumed queue pids: {stopped}", file=sys.stderr)


def _probe_backend(budget_s: float) -> bool:
    """True iff an accelerator backend initializes within budget_s.

    Probes in a killable subprocess: while the backend is down, an
    in-process jax init attempt hangs on a ~25-min RPC timeout (seen in the
    Aug 17-18 outage), far past any sane bench window.
    """
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            return False
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d=jax.devices(); "
                 "assert d[0].platform != 'cpu'; print('BENCH_BACKEND_UP')"],
                capture_output=True, text=True, timeout=remaining,
            )
            if "BENCH_BACKEND_UP" in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            return False
        print(f"# backend probe {attempt} failed; "
              f"{deadline - time.monotonic():.0f}s budget left",
              file=sys.stderr)
        time.sleep(min(20.0, max(0.0, deadline - time.monotonic())))


def _load_cache():
    try:
        with open(CACHE_PATH) as f:
            return json.load(f)
    except Exception:
        return None


def _cached_line(reason: str, provisional: bool = False) -> dict:
    """The last-known-good result as a complete, self-describing JSON
    object (or a null-value shell if no cache exists)."""
    cached = _load_cache()
    if cached:
        result = dict(cached["result"])
        result["cache_provenance"] = (
            f"{reason}; numbers are the last successful run's "
            f"({cached.get('recorded_at', 'unknown time')}, "
            f"git {cached.get('git_rev', '?')})"
        )
    else:
        result = {
            "metric": "MSMP-PDE train throughput (E1 cfg, bs=16, nx=100, pushforward=1)",
            "value": None,
            "unit": "samples/sec/chip",
            "vs_baseline": None,
            "cache_provenance": f"{reason}; no cache available",
        }
    if provisional:
        result["provisional"] = True
    else:
        result["backend_down"] = True
    return result


def _emit_cached(reason: str) -> None:
    """Emit the last-known-good result marked backend_down instead of
    producing no JSON at all (round-3 failure mode: rc=124, parsed=null)."""
    print(json.dumps(_cached_line(reason)))
    sys.stdout.flush()


def _save_cache(result: dict) -> None:
    try:
        rev = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True,
                             cwd=os.path.dirname(CACHE_PATH)).stdout.strip()
    except Exception:
        rev = "?"
    payload = {
        "result": result,
        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "git_rev": rev,
    }
    tmp = CACHE_PATH + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
    os.replace(tmp, CACHE_PATH)


def _arm_run_watchdog(run_budget_s: float) -> None:
    """A wedged device RPC mid-bench hangs without raising (the observed
    tunnel failure mode: threads futex-blocked, no exception) — the
    except-clause below never fires and the driver would get rc=124 with
    no output. This daemon thread emits the cache and hard-exits instead."""
    import threading

    def fire():
        _resume_queues(_PAUSED)
        _emit_cached(f"bench run exceeded {run_budget_s:.0f}s "
                     f"(wedged backend? last milestone: {_MILESTONE[0]})")
        sys.stdout.flush()
        os._exit(0)

    t = threading.Timer(run_budget_s, fire)
    t.daemon = True
    t.start()
    return t


if __name__ == "__main__":
    t_start = time.monotonic()
    # ONE global budget sized to fit the driver window (the r4 failure:
    # worst-case probe 600 s + run watchdog 2100 s > the window, so the
    # driver SIGKILLed the process before any JSON was printed).
    total_s = float(os.environ.get("MSMP_BENCH_TOTAL_S", "420"))

    def _remaining():
        return total_s - (time.monotonic() - t_start)

    # STEP 0 — before anything can hang: the last-known-good cache as a
    # complete, parseable JSON line. Even a SIGKILL one second from now
    # leaves the driver with a number.
    print(json.dumps(_cached_line("provisional line printed at startup; "
                                  "a fresh capture follows if it fits the "
                                  "budget", provisional=True)))
    sys.stdout.flush()

    # probe: bounded below the global budget, leaving >=60 s to run
    probe_budget = min(float(os.environ.get("MSMP_BENCH_WAIT_S", "300")),
                       max(0.0, _remaining() - 60.0))
    if not _probe_backend(probe_budget):
        _emit_cached(f"backend did not initialize within {probe_budget:.0f}s")
        sys.exit(0)
    # watchdog: whatever budget the probe left (plus a small grace so the
    # provisional line vs watchdog line race is not a coin flip)
    wd = _arm_run_watchdog(max(30.0, _remaining()))
    _PAUSED[:] = _pause_queues()
    try:
        result = main(remaining=_remaining, cached=_load_cache())
    except RuntimeError as e:
        msg = repr(e)
        if ("jellyfish" in msg or "Unable to initialize backend" in msg
                or "UNAVAILABLE" in msg):
            _emit_cached(f"backend lost mid-run: {msg[:120]}")
            sys.exit(0)
        raise
    finally:
        _resume_queues(_PAUSED)
    wd.cancel()
    if _PAUSED:
        result["queue_paused_for_measurement"] = True
    # print FIRST: a cache-write failure must not discard a good run
    print(json.dumps(result))
    sys.stdout.flush()
    try:
        _save_cache(result)
    except OSError as e:
        print(f"# cache save failed: {e!r}", file=sys.stderr)
