"""Metric-formula parity tests against the reference's torch implementations
(compute_spacetime_L2_norms / compute_space_L2_norms, train_helper.py:298-360),
plus rollout bookkeeping checks."""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

HAS_REF = os.path.isdir("/root/reference")
ref_only = pytest.mark.skipif(not HAS_REF, reason="reference repo not mounted")


@ref_only
def test_spacetime_l2_formula_parity():
    """Our L2 aggregation must equal the reference's torch formula on random
    pred/true tensors."""
    # train_helper imports the GNN model zoo (lem_cuda, torch_geometric) at
    # module scope, which is unavailable here; the two jit.script'ed metric
    # functions are self-contained — inline them verbatim in torch semantics
    # (train_helper.py:298-360).
    import torch

    def compute_spacetime_L2_norms(losses, norms):
        losses = torch.sum(losses, dim=2)
        norms = torch.sum(norms, dim=2)
        losses = torch.mean(losses, dim=(1, 2))
        norms = torch.mean(norms, dim=(1, 2))
        losses = torch.sqrt(losses)
        norms = torch.sqrt(norms)
        losses = torch.mean(losses)
        norms = torch.mean(norms)
        return losses, losses / norms

    def compute_space_L2_norms(losses, norms):
        losses = torch.sum(losses, dim=2)
        norms = torch.sum(norms, dim=2)
        losses = torch.mean(losses, dim=2)
        norms = torch.mean(norms, dim=2)
        losses = torch.sqrt(losses)
        norms = torch.sqrt(norms)
        losses = torch.mean(losses, dim=0)
        norms = torch.mean(norms, dim=0)
        return losses, losses / norms

    rng = np.random.default_rng(0)
    B, T, d, nx = 6, 50, 2, 30
    pred = rng.normal(size=(B, T, d, nx))
    true = rng.normal(size=(B, T, d, nx))

    want_l, want_rel = compute_spacetime_L2_norms(
        torch.tensor((pred - true) ** 2), torch.tensor(true**2)
    )

    # ours: per-sample spacetime L2, then mean; rel = mean_l / mean_m
    sq_err = np.sum((pred - true) ** 2, axis=2)
    sq_norm = np.sum(true**2, axis=2)
    l = np.sqrt(np.mean(sq_err, axis=(1, 2))).mean()
    m = np.sqrt(np.mean(sq_norm, axis=(1, 2))).mean()
    assert abs(l - float(want_l)) < 1e-10
    assert abs(l / m - float(want_rel)) < 1e-10

    # per-timestep curve parity
    from msmp_pde_tpu.training.metrics import compute_space_l2_norms

    got_l, got_rel = compute_space_l2_norms(pred, true, log=lambda *a: None)
    want_lc, want_relc = compute_space_L2_norms(
        torch.tensor((pred - true) ** 2), torch.tensor(true**2)
    )
    np.testing.assert_allclose(got_l, want_lc.numpy(), rtol=1e-12)
    np.testing.assert_allclose(got_rel, want_relc.numpy(), rtol=1e-12)


def test_rollout_collect_covers_expected_steps():
    """For the 250/25 config with nr_gt_steps=2 the rollout must produce 8
    window predictions covering label steps 50, 75, ..., 225."""
    from msmp_pde_tpu.data.graph import GraphSpec, build_neighbors_radius
    from msmp_pde_tpu.models import get_model
    from msmp_pde_tpu.training.loop import Trainer
    from msmp_pde_tpu.training.metrics import _rollout_collect

    nx, tw, nt = 16, 25, 250
    x = np.linspace(0, 16, nx)
    idx, mask = build_neighbors_radius(x, 2)
    spec = GraphSpec(
        idx=jnp.asarray(idx), mask=jnp.asarray(mask),
        x=jnp.asarray(x.astype(np.float32)), tw=tw, n_components=1,
        t_grid=jnp.linspace(0, 4, nt, dtype=jnp.float32), L=16.0, tmax=4.0,
        dt=4.0 / 249,
    )
    model, kind = get_model("MP-PDE", tw=tw, n_eq_vars=0, L=16.0, tmax=4.0,
                            dt=spec.dt, n_layers=1)
    trainer = Trainer(model=model, kind=kind, spec=spec, eq_norms={})
    u = jnp.asarray(np.arange(2 * nt * nx, dtype=np.float32).reshape(2, nt, nx))
    params = trainer.init_params(jax.random.PRNGKey(0), batch_size=2)
    preds, labs = _rollout_collect(trainer, params, u, {}, 2, nt)
    assert preds.shape == (8, 2, nx, tw)
    # labels of window s cover steps [50 + s*25, 75 + s*25)
    for s in range(8):
        want = np.asarray(u[0, 50 + s * 25 : 75 + s * 25]).T
        np.testing.assert_allclose(np.asarray(labs[s][0]), want)


def test_store_based_metrics_match_rerolling():
    """eval_interpolated feeds every rollout-derived metric from ONE
    rollout_store call; the store-based reducers must equal the re-rolling
    implementations exactly."""
    from msmp_pde_tpu.data.graph import GraphSpec, build_neighbors_radius
    from msmp_pde_tpu.models import get_model
    from msmp_pde_tpu.training.loop import Trainer
    from msmp_pde_tpu.training import metrics

    nx, tw, nt = 16, 25, 250
    x = np.linspace(0, 16, nx)
    idx, mask = build_neighbors_radius(x, 2)
    spec = GraphSpec(
        idx=jnp.asarray(idx), mask=jnp.asarray(mask),
        x=jnp.asarray(x.astype(np.float32)), tw=tw, n_components=1,
        t_grid=jnp.linspace(0, 4, nt, dtype=jnp.float32), L=16.0, tmax=4.0,
        dt=4.0 / 249,
    )
    model, kind = get_model("MP-PDE", tw=tw, n_eq_vars=0, L=16.0, tmax=4.0,
                            dt=spec.dt, n_layers=1)
    trainer = Trainer(model=model, kind=kind, spec=spec, eq_norms={})
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(4, nt, nx)).astype(np.float32))
    params = trainer.init_params(jax.random.PRNGKey(0), batch_size=2)

    preds, trues = metrics.rollout_store(trainer, params, u, {}, 2, 2, nt)

    # l2_norms_from_store == compute_l2_norms (which re-rolls internally)
    silent = lambda *a, **k: None
    l_ref, rel_ref = metrics.compute_l2_norms(trainer, params, u, {}, 2, 2,
                                              nt, log=silent)
    l_got, rel_got = metrics.l2_norms_from_store(preds, trues, log=silent)
    assert abs(l_got - l_ref) < 1e-5 * max(1.0, abs(l_ref))
    assert abs(rel_got - rel_ref) < 1e-5 * max(1.0, abs(rel_ref))

    # compute_l2_norms_u(preds=...) == compute_l2_norms_u() re-rolling
    x_r = np.sort(rng.uniform(0, 16, nx)).astype(np.float32)
    u_r = np.asarray(rng.normal(size=(4, nt, 1, nx)).astype(np.float32))
    ref = metrics.compute_l2_norms_u(trainer, params, u, {}, u_r,
                                     np.asarray(x), x_r, 2, 2, nt,
                                     log=silent)
    got = metrics.compute_l2_norms_u(trainer, params, u, {}, u_r,
                                     np.asarray(x), x_r, 2, 2, nt,
                                     log=silent, preds=preds)
    np.testing.assert_allclose(got, ref, rtol=1e-6)
