"""Serving subsystem: engine vs direct forward loop, bucket padding and
chunking, trajectory layout, jax.export roundtrip, HTTP server roundtrip,
and the dataset-light trainer construction."""
import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msmp_pde_tpu.data.graph import advance_windows
from msmp_pde_tpu.serving.engine import (
    RolloutEngine,
    build_serving_trainer,
    grid_from_h5,
    uniform_grid,
    windows_to_trajectory,
)

from test_training import small_trainer


def _engine(buckets=(4,), model="MP-PDE"):
    trainer = small_trainer(model=model)
    params = trainer.init_params(jax.random.PRNGKey(1), batch_size=2)
    return RolloutEngine(trainer, params, batch_buckets=buckets)


def _manual_rollout(engine, window, start, n_windows):
    """Reference loop: per-sample forward chain through advance_windows."""
    trainer, params = engine.trainer, engine.params
    tw, d = trainer.tw, trainer.d
    nt = int(trainer.spec.t_grid.shape[0])
    w = jnp.asarray(window, jnp.float32)
    steps = jnp.full((w.shape[0],), start, jnp.int32)
    preds, state = [], None
    for i in range(n_windows):
        s = jnp.clip(steps + i * tw, tw, nt - tw)
        pred, state = trainer.forward(params, w, s, {}, lem_state=state)
        preds.append(pred)
        w = advance_windows(w, pred, d, tw)
    return np.stack([np.asarray(p) for p in preds], axis=1)


def test_rollout_matches_direct_loop():
    eng = _engine()
    rng = np.random.default_rng(0)
    window = rng.normal(size=(4, 24, 20)).astype(np.float32)
    got = eng.rollout(window, start_step=20, n_windows=3)
    want = _manual_rollout(eng, window, 20, 3)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_bucket_padding_is_invisible():
    """B=3 through a 4-bucket must equal the unpadded computation — pad
    rows must not leak into real rows."""
    eng = _engine(buckets=(4,))
    rng = np.random.default_rng(1)
    window = rng.normal(size=(3, 24, 20)).astype(np.float32)
    got = eng.rollout(window, start_step=20, n_windows=2)
    assert got.shape[0] == 3
    want = _manual_rollout(eng, window, 20, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_oversize_request_chunks_over_largest_bucket():
    eng = _engine(buckets=(2,))
    rng = np.random.default_rng(2)
    window = rng.normal(size=(5, 24, 20)).astype(np.float32)
    got = eng.rollout(window, start_step=20, n_windows=2)
    want = _manual_rollout(eng, window, 20, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # exactly one compiled program: every chunk (4+1 -> 2+2+1pad) reuses
    # the same 2-bucket jit entry
    assert len(eng._programs) == 1


def test_time_feature_clamps_beyond_horizon():
    """Past the data horizon the time feature freezes at nt - tw (the eval
    long-rollout convention) instead of indexing out of bounds."""
    eng = _engine()
    rng = np.random.default_rng(3)
    window = rng.normal(size=(2, 24, 20)).astype(np.float32)
    n_windows = 6  # start=80, tw=20, nt=100 -> steps run past nt
    got = eng.rollout(window, start_step=80, n_windows=n_windows)
    want = _manual_rollout(eng, window, 80, n_windows)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_trajectory_layout():
    eng = _engine()
    rng = np.random.default_rng(4)
    window = rng.normal(size=(2, 24, 20)).astype(np.float32)
    preds = eng.rollout(window, start_step=20, n_windows=3)
    traj = windows_to_trajectory(preds, d=1, tw=20)
    assert traj.shape == (2, 60, 1, 24)
    # window s, time offset k of sample b lands at traj[b, s*tw + k]
    np.testing.assert_allclose(traj[1, 2 * 20 + 7, 0], preds[1, 2, :, 7])


def test_strict_equation_variable_validation():
    """Misspelled or partial equation variables must raise, not silently
    condition the model on zeros."""
    trainer = _small_trainer_2d()
    params = trainer.init_params(jax.random.PRNGKey(2), batch_size=2)
    eng = RolloutEngine(trainer, params, batch_buckets=(2,))
    window = np.zeros((2, 16, 40), np.float32)
    ab = {"a": np.ones((2,), np.float32), "b": np.ones((2,), np.float32)}
    eng.rollout(window, variables=ab, n_windows=1)  # exact set: fine
    with pytest.raises(ValueError, match="mismatch"):
        eng.rollout(window, variables={"aplha": ab["a"], "b": ab["b"]},
                    n_windows=1)
    with pytest.raises(ValueError, match="mismatch"):
        eng.rollout(window, variables={"a": ab["a"]}, n_windows=1)


def test_grid_model_engine_rollout():
    """The engine is model-kind-agnostic: a grid model (FNO) rolls out
    through the same bucketed path as graph models."""
    trainer = small_trainer(model="FNO", nx=40)  # rfft >= the 16 FNO modes
    params = trainer.init_params(jax.random.PRNGKey(3), batch_size=2)
    eng = RolloutEngine(trainer, params, batch_buckets=(4,))
    rng = np.random.default_rng(10)
    window = rng.normal(size=(3, 40, 20)).astype(np.float32)
    got = eng.rollout(window, start_step=20, n_windows=2)
    want = _manual_rollout(eng, window, 20, 2)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _small_trainer_2d(nx=16, tw=20, nt=100):
    from msmp_pde_tpu.data.graph import GraphSpec, build_neighbors_radius
    from msmp_pde_tpu.models import get_model
    from msmp_pde_tpu.training.loop import Trainer

    x = np.linspace(0.0, 16.0, nx)
    idx, mask = build_neighbors_radius(x, 2)
    spec = GraphSpec(
        idx=jnp.asarray(idx), mask=jnp.asarray(mask),
        x=jnp.asarray(x.astype(np.float32)), tw=tw, n_components=2,
        t_grid=jnp.linspace(0, 4.0, nt, dtype=jnp.float32),
        L=16.0, tmax=4.0, dt=4.0 / (nt - 1),
    )
    eq = {"a": 1.0, "b": 1.0}
    m, kind = get_model("MSMP-PDE2D", tw=tw, n_eq_vars=len(eq), L=16.0,
                        tmax=4.0, dt=spec.dt, n_layers=2,
                        eq_var_names=tuple(eq))
    return Trainer(model=m, kind=kind, spec=spec, eq_norms=eq)


def test_2d_system_rollout_with_eq_variables():
    """2-component engine path: per-component window advance, eq-variable
    plumbing, and the d=2 trajectory layout."""
    trainer = _small_trainer_2d()
    params = trainer.init_params(jax.random.PRNGKey(2), batch_size=2)
    eng = RolloutEngine(trainer, params, batch_buckets=(2,))
    rng = np.random.default_rng(9)
    window = rng.normal(size=(2, 16, 40)).astype(np.float32)
    variables = {"a": np.array([0.3, 0.5], np.float32),
                 "b": np.array([9.0, 8.5], np.float32)}
    got = eng.rollout(window, variables=variables, start_step=20,
                      n_windows=3)
    # manual chain with the same variables
    w = jnp.asarray(window)
    steps = jnp.full((2,), 20, jnp.int32)
    vj = {k: jnp.asarray(v) for k, v in variables.items()}
    preds, state = [], None
    for i in range(3):
        s = jnp.clip(steps + i * 20, 20, 80)
        pred, state = trainer.forward(params, w, s, vj, lem_state=state)
        preds.append(np.asarray(pred))
        w = advance_windows(w, pred, 2, 20)
    np.testing.assert_allclose(got, np.stack(preds, axis=1),
                               rtol=1e-6, atol=1e-6)
    traj = windows_to_trajectory(got, d=2, tw=20)
    assert traj.shape == (2, 60, 2, 16)
    # component c of window s, offset k: traj[b, s*20+k, c] = preds[b,s,:,c*20+k]
    np.testing.assert_allclose(traj[0, 1 * 20 + 3, 1], got[0, 1, :, 20 + 3])


def test_engine_matches_eval_rollout_store():
    """Serving must reproduce the validated eval path: feeding the engine
    the first ground-truth window of a trajectory gives the same rollout
    as metrics.rollout_store (same forward chain, same window advance)."""
    import jax.numpy as jnp

    from msmp_pde_tpu.data.graph import slice_windows
    from msmp_pde_tpu.serving.engine import windows_to_trajectory
    from msmp_pde_tpu.training.metrics import rollout_store

    trainer = small_trainer()
    tw, nt, nx = trainer.tw, 100, 24
    params = trainer.init_params(jax.random.PRNGKey(1), batch_size=2)
    rng = np.random.default_rng(8)
    u_all = jnp.asarray(rng.normal(size=(4, nt, nx)).astype(np.float32))
    nr_gt_steps = 1
    preds_ref, _ = rollout_store(trainer, params, u_all, {}, batch_size=4,
                                 nr_gt_steps=nr_gt_steps, t_res=nt)

    eng = RolloutEngine(trainer, params, batch_buckets=(4,))
    start = tw * nr_gt_steps
    window, _ = slice_windows(u_all, jnp.full((4,), start, jnp.int32), tw)
    n_windows = (nt - tw) // tw - nr_gt_steps + 1
    preds = eng.rollout(np.asarray(window), start_step=start,
                        n_windows=n_windows)
    traj = windows_to_trajectory(preds, trainer.d, tw)
    np.testing.assert_allclose(traj, preds_ref, rtol=1e-5, atol=1e-6)


def test_stateful_engine_matches_rollout_store_beyond_horizon():
    """Save*-model eval parity PAST the data horizon: rollout_store's
    long-rollout loop calls forward without accumulated LEM state
    (metrics.py:225-228, eval.py:502-575), so the engine must zero-reset
    the state for beyond-horizon windows — threading it silently diverges
    from the published eval numbers (review finding, round 3)."""
    import jax.numpy as jnp

    from msmp_pde_tpu.data.graph import slice_windows
    from msmp_pde_tpu.training.metrics import rollout_store

    trainer = small_trainer(model="SaveMSMP-PDE")
    tw, nt, nx = trainer.tw, 100, 24
    params = trainer.init_params(jax.random.PRNGKey(3), batch_size=2)
    rng = np.random.default_rng(11)
    u_all = jnp.asarray(rng.normal(size=(4, nt, nx)).astype(np.float32))
    nr_gt_steps, n_more = 1, 2
    preds_ref, _ = rollout_store(trainer, params, u_all, {}, batch_size=4,
                                 nr_gt_steps=nr_gt_steps, t_res=nt,
                                 n_more_rollout=n_more)

    eng = RolloutEngine(trainer, params, batch_buckets=(4,))
    start = tw * nr_gt_steps
    window, _ = slice_windows(u_all, jnp.full((4,), start, jnp.int32), tw)
    n_windows = (nt - tw) // tw - nr_gt_steps + 1 + n_more
    preds = eng.rollout(np.asarray(window), start_step=start,
                        n_windows=n_windows)
    traj = windows_to_trajectory(preds, trainer.d, tw)
    np.testing.assert_allclose(traj, preds_ref, rtol=1e-5, atol=1e-6)


def test_wrong_grid_window_rejected():
    """A window whose nx or d*tw doesn't match the engine's spec must fail
    loudly — grid models would otherwise rebuild their coordinate grid from
    the input shape and serve wrong-grid predictions, and every novel shape
    would compile a fresh program (review finding, round 3)."""
    eng = _engine()
    with pytest.raises(ValueError, match="window must be"):
        eng.rollout(np.zeros((2, 32, 20), np.float32))  # wrong nx
    with pytest.raises(ValueError, match="window must be"):
        eng.rollout(np.zeros((2, 24, 25), np.float32))  # wrong d*tw
    with pytest.raises(ValueError, match="window must be"):
        eng.rollout(np.zeros((2, 24), np.float32))  # wrong rank


def test_export_roundtrip_matches_engine(tmp_path):
    eng = _engine()
    from msmp_pde_tpu.serving.export import export_rollout, load_exported

    path = str(tmp_path / "rollout.jaxexport")
    export_rollout(eng, batch=4, n_windows=2, path=path)
    exported = load_exported(path)
    rng = np.random.default_rng(5)
    window = rng.normal(size=(4, 24, 20)).astype(np.float32)
    steps = np.full((4,), 20, np.int32)
    got = exported(window, steps, {})
    want = eng.rollout(window, start_step=20, n_windows=2)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_http_server_roundtrip():
    from http.server import ThreadingHTTPServer

    from msmp_pde_tpu.serving.serve import make_handler, request_rollout

    eng = _engine()
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(eng, {"experiment": "unit"})
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        rng = np.random.default_rng(6)
        window = rng.normal(size=(3, 24, 20)).astype(np.float32)
        steps = np.full((3,), 20, np.int32)
        got = request_rollout("127.0.0.1", port, window, steps=steps,
                              n_windows=2)
        want = eng.rollout(window, start_step=20, n_windows=2)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        traj = request_rollout("127.0.0.1", port, window, steps=steps,
                               n_windows=2, as_trajectory=True)
        np.testing.assert_allclose(
            traj, windows_to_trajectory(want, 1, 20), rtol=1e-6, atol=1e-6
        )
        # malformed inputs -> 400, not a hung server / closed socket
        import http.client

        def post(path, body):
            conn = http.client.HTTPConnection("127.0.0.1", port)
            conn.request("POST", path, body=body)
            status = conn.getresponse().status
            conn.close()
            return status

        assert post("/v1/rollout", b"not-an-npz") == 400
        buf = __import__("io").BytesIO()
        np.savez(buf, window=window, bogus=np.ones((3,), np.float32))
        assert post("/v1/rollout", buf.getvalue()) == 400  # unknown array
        buf2 = __import__("io").BytesIO()
        np.savez(buf2, window=window)
        assert post("/v1/rollout?n_windows=100000",
                    buf2.getvalue()) == 400  # compile-bomb guard
    finally:
        srv.shutdown()
        srv.server_close()


def test_http_server_resource_and_variable_guards():
    """Server-side limits (review findings, round 3): a model WITH equation
    variables must 400 on a request that omits them ALL (not silently serve
    zero-conditioned predictions); oversize batches and oversize bodies are
    rejected before touching the device."""
    import http.client
    import io as _io
    from http.server import ThreadingHTTPServer

    from msmp_pde_tpu.serving.serve import make_handler, request_rollout

    trainer = _small_trainer_2d()
    params = trainer.init_params(jax.random.PRNGKey(4), batch_size=2)
    eng = RolloutEngine(trainer, params, batch_buckets=(2,))
    srv = ThreadingHTTPServer(
        ("127.0.0.1", 0),
        make_handler(eng, {"experiment": "unit"}, max_batch=4, max_body_mb=1),
    )
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        port = srv.server_address[1]
        rng = np.random.default_rng(12)
        window = rng.normal(size=(2, 16, 40)).astype(np.float32)
        variables = {"a": np.array([0.3, 0.5], np.float32),
                     "b": np.array([9.0, 8.5], np.float32)}
        # complete request works
        got = request_rollout("127.0.0.1", port, window,
                              variables=variables, n_windows=1)
        assert got.shape == (2, 1, 16, 40)

        def post(path, body):
            conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
            conn.request("POST", path, body=body)
            status = conn.getresponse().status
            conn.close()
            return status

        # ALL equation variables omitted -> 400 (silent-zeros guard)
        buf = _io.BytesIO()
        np.savez(buf, window=window)
        assert post("/v1/rollout", buf.getvalue()) == 400
        # batch over max_batch -> 400
        big = np.zeros((5, 16, 40), np.float32)
        buf2 = _io.BytesIO()
        np.savez(buf2, window=big,
                 a=np.zeros((5,), np.float32), b=np.zeros((5,), np.float32))
        assert post("/v1/rollout", buf2.getvalue()) == 400
        # body over max_body_mb -> 400 (before np.load; batch is legal)
        huge = np.zeros((4, 16, 40 * 300), np.float32)  # ~3 MiB
        buf3 = _io.BytesIO()
        np.savez(buf3, window=huge,
                 a=np.zeros((4,), np.float32), b=np.zeros((4,), np.float32))
        assert post("/v1/rollout", buf3.getvalue()) == 400

        # /metrics reflects the traffic above: 1 ok (2 samples), 3 errors
        import json as _json
        import urllib.request as _rq

        with _rq.urlopen(f"http://127.0.0.1:{port}/metrics", timeout=60) as r:
            m = _json.load(r)
        assert m["requests"] == 4 and m["errors"] == 3
        assert m["samples"] == 2 and m["windows"] == 2
        assert m["latency_s"]["n"] == 1 and m["latency_s"]["p50"] > 0
    finally:
        srv.shutdown()
        srv.server_close()


def test_dp_mesh_rollout_matches_single_device():
    """An 8-device dp-sharded serving engine must match the unsharded
    engine. GSPMD partitioning reassociates a few reductions (float-level
    drift ~1e-7 per window, compounding through the autoregressive
    horizon), so the check is a tight allclose rather than bit-equality."""
    from msmp_pde_tpu.parallel.mesh import make_mesh

    trainer = small_trainer()
    params = trainer.init_params(jax.random.PRNGKey(1), batch_size=2)
    plain = RolloutEngine(trainer, params, batch_buckets=(8,))
    sharded = RolloutEngine(trainer, params, batch_buckets=(8,),
                            mesh=make_mesh(8))
    rng = np.random.default_rng(7)
    window = rng.normal(size=(6, 24, 20)).astype(np.float32)
    a = plain.rollout(window, start_step=20, n_windows=3)
    b = sharded.rollout(window, start_step=20, n_windows=3)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_uniform_grid_matches_pde_conventions():
    from msmp_pde_tpu.training.setup import pde_for_experiment

    pde = pde_for_experiment("E1", (250, 100))
    g = uniform_grid(pde, (250, 100))
    assert g.nt == 250 and g.n_components == 1
    np.testing.assert_allclose(g.x, np.linspace(0, 16.0, 100), rtol=1e-6)
    np.testing.assert_allclose(g.dt, 4.0 / 249)
    with pytest.raises(ValueError):
        uniform_grid(pde_for_experiment("WE1", (250, 40)), (250, 40))
    with pytest.raises(ValueError):
        uniform_grid(pde_for_experiment("RPU", (250, 100)), (250, 100))


def test_grid_from_h5_and_serving_trainer(tmp_path):
    """A minimal file with the datagen writer's attrs schema round-trips
    through grid_from_h5 + build_serving_trainer."""
    import h5py

    from msmp_pde_tpu.training.setup import pde_for_experiment

    path = str(tmp_path / "CE_E1.h5")
    x_base = np.linspace(0, 16.0, 40)
    with h5py.File(path, "w") as f:
        g = f.create_group("test")
        for key, nx in (("pde_250-40", 40), ("pde_250-80", 80)):
            ds = g.create_dataset(key, shape=(1, 250, nx), dtype="f4")
            ds.attrs["nt"] = 250
            ds.attrs["dt"] = 4.0 / 249
            ds.attrs["dx"] = 16.0 / nx
            ds.attrs["tmin"] = 0.0
            ds.attrs["tmax"] = 4.0
            ds.attrs["x"] = np.linspace(0, 16.0, nx)
    pde = pde_for_experiment("E1", (250, 40))
    grid = grid_from_h5(path, pde, "test", (250, 40), (250, 80))
    np.testing.assert_allclose(grid.x, x_base, rtol=1e-6)
    assert grid.nt == 250 and grid.n_components == 1

    trainer = build_serving_trainer(
        "E1", "MSMP-PDE", base_resolution=(250, 40),
        super_resolution=(250, 80), data_path=path, n_graph_layers=2,
    )
    params = trainer.init_params(jax.random.PRNGKey(0), batch_size=2)
    eng = RolloutEngine(trainer, params, batch_buckets=(2,))
    out = eng.rollout(np.zeros((2, 40, 25), np.float32), n_windows=2)
    assert out.shape == (2, 2, 40, 25)
    assert np.isfinite(out).all()
