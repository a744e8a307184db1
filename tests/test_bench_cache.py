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
