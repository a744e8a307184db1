"""bench.py outage machinery: the driver must ALWAYS get one valid JSON
line (round-3 failure mode: rc=124 with no output while the backend was
down). Tests the cache emit/save paths without touching any backend."""
import importlib.util
import io
import json
import os
import sys
from contextlib import redirect_stdout


def _load_bench(tmp_path, cache_content=None):
    spec = importlib.util.spec_from_file_location(
        "bench_under_test",
        os.path.join(os.path.dirname(__file__), "..", "bench.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.CACHE_PATH = str(tmp_path / "bench_cache.json")
    if cache_content is not None:
        with open(mod.CACHE_PATH, "w") as f:
            json.dump(cache_content, f)
    return mod


def _emit(mod, reason):
    buf = io.StringIO()
    with redirect_stdout(buf):
        mod._emit_cached(reason)
    lines = [l for l in buf.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1, "must print exactly ONE JSON line"
    return json.loads(lines[0])


def test_emit_cached_with_cache(tmp_path):
    cached = {
        "result": {"metric": "m", "value": 123.0, "unit": "u",
                   "vs_baseline": 2.0, "mfu_pct": 0.5,
                   "backend_down": False},
        "recorded_at": "2026-08-17T00:00:00Z",
        "git_rev": "abc1234",
    }
    mod = _load_bench(tmp_path, cached)
    out = _emit(mod, "backend did not initialize within 300s")
    assert out["value"] == 123.0
    assert out["mfu_pct"] == 0.5
    assert out["backend_down"] is True
    assert "abc1234" in out["cache_provenance"]


def test_emit_cached_without_cache(tmp_path):
    mod = _load_bench(tmp_path)
    out = _emit(mod, "backend down")
    # still valid JSON with the required keys, nulls where unknown
    assert out["backend_down"] is True
    assert out["value"] is None
    assert "metric" in out and "unit" in out and "vs_baseline" in out


def test_emit_cached_with_corrupt_cache(tmp_path):
    mod = _load_bench(tmp_path)
    with open(mod.CACHE_PATH, "w") as f:
        f.write("{not json")
    out = _emit(mod, "backend down")
    assert out["backend_down"] is True and out["value"] is None


def test_save_then_emit_roundtrip(tmp_path):
    mod = _load_bench(tmp_path)
    result = {"metric": "m", "value": 7.0, "unit": "u", "vs_baseline": 1.1,
              "backend_down": False}
    mod._save_cache(result)
    out = _emit(mod, "outage")
    assert out["value"] == 7.0 and out["backend_down"] is True
    # the persisted file itself is valid and carries provenance fields
    with open(mod.CACHE_PATH) as f:
        payload = json.load(f)
    assert payload["result"]["value"] == 7.0
    assert "recorded_at" in payload and "git_rev" in payload


def test_queue_pause_resume(tmp_path, monkeypatch):
    """bench pauses a live tpu_queue_* process tree for the measurement
    window (the axon tunnel multiplexes clients — a concurrent training
    stage silently halves the measured throughput) and resumes it after;
    a detached failsafe resumer covers abnormal bench exits."""
    import subprocess
    import time

    mod = _load_bench(tmp_path)
    q = subprocess.Popen(["bash", "-c", "sleep 60 & wait"])
    try:
        time.sleep(0.2)
        pidfile = tmp_path / "tpu_queue_test.pid"
        pidfile.write_text(str(q.pid))
        # isolate: only our fake queue's pidfile is visible
        real_glob = mod.glob.glob
        monkeypatch.setattr(
            mod.glob, "glob",
            lambda pat: ([str(pidfile)] if "tpu_queue" in pat
                         else real_glob(pat)))
        stopped = mod._pause_queues()
        assert q.pid in stopped and len(stopped) >= 2  # bash + sleep child
        deadline = time.time() + 5
        while time.time() < deadline:
            states = []
            for p in stopped:
                with open(f"/proc/{p}/status") as f:
                    states.append(next(l for l in f
                                       if l.startswith("State:")).split()[1])
            if all(s == "T" for s in states):
                break
            time.sleep(0.05)
        assert all(s == "T" for s in states), states
        mod._resume_queues(stopped)
        deadline = time.time() + 5
        while time.time() < deadline:
            with open(f"/proc/{q.pid}/status") as f:
                st = next(l for l in f if l.startswith("State:")).split()[1]
            if st != "T":
                break
            time.sleep(0.05)
        assert st != "T", "queue must be running again after resume"
    finally:
        q.kill()
        q.wait()


def _fake_only_pidfile(mod, monkeypatch, pidfile):
    real_glob = mod.glob.glob
    monkeypatch.setattr(
        mod.glob, "glob",
        lambda pat: ([str(pidfile)] if "tpu_queue" in pat
                     else real_glob(pat)))


def test_queue_pause_skips_own_ancestors(tmp_path, monkeypatch):
    """When the queue itself runs bench.py, the pidfile points at bench's
    own ancestor chain — nothing may be frozen (a frozen parent would
    deadlock the queue waiting on its stopped self). Pointing the
    pidfile at THIS process stands in for that: the walk starts inside
    our own chain, and self+ancestors must be excluded."""
    import os

    mod = _load_bench(tmp_path)
    pidfile = tmp_path / "tpu_queue_self.pid"
    pidfile.write_text(str(os.getpid()))
    _fake_only_pidfile(mod, monkeypatch, pidfile)
    stopped = mod._pause_queues()
    try:
        assert os.getpid() not in stopped
        assert not set(stopped) & mod._ancestors()
    finally:
        mod._resume_queues(stopped)


def test_queue_pause_ignores_init_pidfile(tmp_path, monkeypatch):
    """A bogus pidfile naming pid 1 must be ignored outright — walking
    the tree from init would SIGSTOP every process on the host
    (including this test's own session). Regression: a reparented-
    under-nohup test once wrote its ppid (=1) here and froze the world
    for a measurement window."""
    mod = _load_bench(tmp_path)
    pidfile = tmp_path / "tpu_queue_bogus.pid"
    pidfile.write_text("1")
    _fake_only_pidfile(mod, monkeypatch, pidfile)
    assert mod._pause_queues() == []


def test_cached_line_provisional_flag(tmp_path):
    cached = {
        "result": {"metric": "m", "value": 9.0, "unit": "u",
                   "vs_baseline": 1.0, "backend_down": False},
        "recorded_at": "2026-08-19T00:00:00Z", "git_rev": "r5",
    }
    mod = _load_bench(tmp_path, cached)
    prov = mod._cached_line("startup", provisional=True)
    assert prov["provisional"] is True and prov["value"] == 9.0
    final = mod._cached_line("outage")
    assert "provisional" not in final and final["backend_down"] is True


def _run_bench_subprocess(tmp_path, cache_content, env_extra, timeout_cmd=()):
    import subprocess

    cache = tmp_path / "cache.json"
    if cache_content is not None:
        cache.write_text(json.dumps(cache_content))
    env = dict(os.environ)
    env.update({
        "MSMP_BENCH_CACHE_PATH": str(cache),
        "JAX_PLATFORMS": "cpu",  # probe requires non-cpu -> fails fast
        **env_extra,
    })
    bench = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    return subprocess.run(
        list(timeout_cmd) + [sys.executable, bench],
        capture_output=True, text=True, env=env, timeout=120,
    )


CACHE = {
    "result": {"metric": "m", "value": 8053.0, "unit": "samples/sec/chip",
               "vs_baseline": 15.1, "mfu_pct": 14.4, "backend_down": False},
    "recorded_at": "2026-08-19T00:00:00Z", "git_rev": "r5cache",
}


def test_driver_run_backend_down_prints_two_parseable_lines(tmp_path):
    """End-to-end driver scenario, backend unavailable: stdout must carry
    the provisional cache line FIRST, then the final backend_down line;
    both parse and both carry the cached number (round-5 hard
    requirement: BENCH_r05 parsed != null in every failure mode)."""
    r = _run_bench_subprocess(
        tmp_path, CACHE,
        {"MSMP_BENCH_WAIT_S": "1", "MSMP_BENCH_TOTAL_S": "30"})
    lines = [l for l in r.stdout.splitlines() if l.strip().startswith("{")]
    assert len(lines) == 2, r.stdout + r.stderr
    prov, final = json.loads(lines[0]), json.loads(lines[1])
    assert prov["provisional"] is True and prov["value"] == 8053.0
    assert final["backend_down"] is True and final["value"] == 8053.0
    assert r.returncode == 0


def test_driver_sigkill_leaves_parseable_line_cold_cache(tmp_path):
    """The r4 failure mode: the driver's window expires and SIGKILLs the
    process mid-probe. Even with NO cache on disk, the provisional line
    (value=null but structurally complete) must already be on stdout.
    Deterministic under host load: read the first stdout line (bench
    flushes it before touching any backend), THEN SIGKILL — a fixed kill
    delay raced interpreter startup on a contended 1-core host."""
    import signal
    import subprocess

    env = dict(os.environ)
    env.update({
        "MSMP_BENCH_CACHE_PATH": str(tmp_path / "missing.json"),
        "JAX_PLATFORMS": "cpu",
        "MSMP_BENCH_WAIT_S": "120", "MSMP_BENCH_TOTAL_S": "420",
    })
    bench = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    p = subprocess.Popen([sys.executable, bench], stdout=subprocess.PIPE,
                         stderr=subprocess.DEVNULL, text=True, env=env)
    try:
        first = p.stdout.readline()  # blocks until the provisional line
        p.send_signal(signal.SIGKILL)  # mid-probe, as the driver would
        p.wait(timeout=60)
    finally:
        p.kill()
        p.wait()
    prov = json.loads(first)
    assert prov["provisional"] is True
    assert "metric" in prov and "unit" in prov and "vs_baseline" in prov


def test_queue_pause_catches_forked_child(tmp_path, monkeypatch):
    """Fixed-point re-walk (ADVICE r4): a child that appears between the
    first walk and the SIGSTOP pass must still end up stopped. Simulated
    deterministically: _proc_tree reports the late-forked child only from
    the second walk onwards (real clock-based racing would be flaky)."""
    import subprocess
    import time

    mod = _load_bench(tmp_path)
    parent = subprocess.Popen(["sleep", "60"])
    child = subprocess.Popen(["sleep", "60"])  # stands in for a late fork
    try:
        pidfile = tmp_path / "tpu_queue_fork.pid"
        pidfile.write_text(str(parent.pid))
        _fake_only_pidfile(mod, monkeypatch, pidfile)
        calls = {"n": 0}

        def fake_tree(pid):
            calls["n"] += 1
            return ([parent.pid] if calls["n"] == 1
                    else [parent.pid, child.pid])

        monkeypatch.setattr(mod, "_proc_tree", fake_tree)
        stopped = mod._pause_queues()
        assert set(stopped) == {parent.pid, child.pid}
        assert calls["n"] >= 3  # walked until a pass found nothing new
        deadline = time.time() + 5
        while time.time() < deadline:
            with open(f"/proc/{child.pid}/status") as f:
                st = next(l for l in f if l.startswith("State:")).split()[1]
            if st == "T":
                break
            time.sleep(0.05)
        assert st == "T", "late-forked child must be stopped"
    finally:
        mod._resume_queues([parent.pid, child.pid])
        parent.kill()
        child.kill()
        parent.wait()
        child.wait()


def test_queue_pause_ignores_recycled_pid(tmp_path, monkeypatch):
    """A pid that started AFTER its pidfile was written is a recycled
    pid, not the queue that wrote the file — must be skipped."""
    import os
    import subprocess
    import sys
    import time

    mod = _load_bench(tmp_path)
    q = subprocess.Popen([sys.executable, "-c", "import time; time.sleep(60)"])
    try:
        pidfile = tmp_path / "tpu_queue_stale.pid"
        pidfile.write_text(str(q.pid))
        past = time.time() - 3600
        os.utime(pidfile, (past, past))  # file predates the process
        _fake_only_pidfile(mod, monkeypatch, pidfile)
        assert mod._pause_queues() == []
        assert mod._start_time(q.pid) is not None
    finally:
        q.kill()
        q.wait()
