"""Tests for the explicit RK integrators (fixed and adaptive)."""
import numpy as np
import jax.numpy as jnp
import pytest

from msmp_pde_tpu.temporal import (
    FORWARD_EULER,
    EXPLICIT_MIDPOINT,
    RK3,
    RK4,
    DOPRI45,
    solve_fixed,
    solve_adaptive,
)


def _decay(t, y):
    return -y


def _order_on_decay(tab):
    """Measured convergence order on y' = -y over [0, 1]."""
    errs = []
    for nt in (9, 17):
        ts = jnp.linspace(0.0, 1.0, nt)
        y0 = jnp.ones((1, 1))
        traj = solve_fixed(_decay, y0, ts, tab)
        errs.append(abs(float(traj[0, -1, 0]) - np.exp(-1.0)))
    return np.log2(errs[0] / errs[1])


@pytest.mark.parametrize(
    "tab,order",
    [(FORWARD_EULER, 1), (EXPLICIT_MIDPOINT, 2), (RK3, 3), (RK4, 4)],
)
def test_fixed_step_orders(tab, order):
    rate = _order_on_decay(tab)
    assert rate > order - 0.3, f"{tab.name}: rate {rate} < {order}"


def test_dopri45_fixed_high_accuracy():
    ts = jnp.linspace(0.0, 1.0, 11)
    y0 = jnp.ones((1, 1))
    traj = solve_fixed(_decay, y0, ts, DOPRI45)
    assert abs(float(traj[0, -1, 0]) - np.exp(-1.0)) < 1e-8


def test_adaptive_matches_exact_on_stiffish_problem():
    """Adaptive Dopri45 must subdivide on a fast-decay problem where a single
    step per interval would be unstable, and land near the exact solution."""
    lam = 80.0

    def f(t, y):
        return -lam * y

    ts = jnp.linspace(0.0, 1.0, 6)  # dt = 0.2, lam*dt = 16 >> stability limit
    y0 = jnp.ones((1, 1))
    traj = solve_adaptive(f, y0, ts, DOPRI45)
    got = np.asarray(traj[0, :, 0])
    want = np.exp(-lam * np.asarray(ts))
    # absolute tolerance: solution decays below atol=1e-5 quickly
    assert np.max(np.abs(got - want)) < 1e-4, (got, want)


def test_adaptive_no_subdivision_identical_to_fixed():
    """When the error criterion passes on the first try, adaptive == one
    plain Dopri45 step per interval."""
    ts = jnp.linspace(0.0, 0.5, 6)
    y0 = jnp.full((2, 3), 0.7)
    a = solve_adaptive(_decay, y0, ts, DOPRI45)
    b = solve_fixed(_decay, y0, ts, DOPRI45)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=1e-14)


def test_adaptive_batch_shared_subdivision():
    """The error max is over the whole batch: a batch containing one stiff
    trajectory must still integrate the easy one correctly."""
    lam = jnp.array([1.0, 60.0])[:, None]

    def f(t, y):
        return -lam * y

    ts = jnp.linspace(0.0, 1.0, 6)
    y0 = jnp.ones((2, 1))
    traj = solve_adaptive(f, y0, ts, DOPRI45)
    want0 = np.exp(-1.0 * np.asarray(ts))
    np.testing.assert_allclose(np.asarray(traj[0, :, 0]), want0, atol=1e-6)
