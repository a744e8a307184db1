"""Explicit Runge-Kutta time integration under jit.

Replaces the reference's Python time-step loop + recursive step-halving
(/root/reference/temporal/solvers.py:24-39,158-211) with

  * ``solve_fixed``    — lax.scan over output intervals, one RK step each;
  * ``solve_adaptive`` — lax.scan over output intervals, each integrated by a
    bounded ``lax.while_loop`` performing the same *dyadic subdivision* the
    reference implements recursively: a trial step over the whole interval is
    taken; if the embedded error estimate is >= 1 the interval is split in two
    and each half is (recursively) retried. The iterative equivalent tracks
    the current position in integer units of dt/2^max_depth; after an accept
    the next step size is the largest dyadic step aligned at the current
    position (lowest set bit), exactly reproducing the recursion's visit
    order and therefore its trajectory.

The error criterion matches temporal/solvers.py:194-204: elementwise
sc = atol + rtol * max_over_batch(max(|y_in|, |y_hi|)), RMS over the last
axis, max over everything, accept iff error < 1. The error is a *batch-global*
scalar, so a whole batch of trajectories shares one subdivision pattern —
which is what makes the reference's scheme directly vmappable-free/batchable.

RHS signature: ``f(t, y) -> dy/dt`` with t a scalar and y of shape
[batch, ..., nx]; batch axis 0 participates in the shared error max.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from msmp_pde_tpu.temporal.tableaux import Tableau


def erk_step(tab: Tableau, f: Callable, t, y, h, conserve: bool = False):
    """One explicit RK step; returns (y_hi, y_lo). y_lo is None if not
    adaptive. ``conserve`` subtracts the stage-mean before combination
    (mean-conservation option, reference temporal/solvers.py:192-193)."""
    dtype = y.dtype
    a = jnp.asarray(tab.a, dtype)
    b = jnp.asarray(tab.b, dtype)
    c = jnp.asarray(tab.c, dtype)

    ks = []
    for i in range(tab.s):
        if i == 0:
            yi = y
            ti = t
        else:
            ti = t + h * c[i]
            acc = a[i, 0] * ks[0]
            for j in range(1, i):
                if tab.a[i, j] != 0.0:
                    acc = acc + a[i, j] * ks[j]
            yi = y + h * acc
        ks.append(f(ti, yi))

    if conserve:
        # the reference subtracts the mean over the second-to-last axis of
        # the stacked stage tensor (the spatial axis after stacking stages
        # last); equivalently each stage loses its spatial mean.
        ks = [k - jnp.mean(k, axis=-1, keepdims=True) for k in ks]

    def combine(w):
        acc = w[0] * ks[0]
        for j in range(1, tab.s):
            acc = acc + w[j] * ks[j]
        return y + h * acc

    y_hi = combine(b)
    if tab.is_adaptive:
        y_lo = combine(jnp.asarray(tab.blo, dtype))
        return y_hi, y_lo
    return y_hi, None


def solve_fixed(f: Callable, y0: jnp.ndarray, ts: jnp.ndarray, tab: Tableau,
                conserve: bool = False):
    """Fixed-step integration: one RK step per output interval.

    Returns the trajectory stacked on a new axis 1: [batch, nt, ...].
    """

    def step(y, tp):
        t, t_next = tp
        y_next, _ = erk_step(tab, f, t, y, t_next - t, conserve=conserve)
        return y_next, y_next

    _, traj = jax.lax.scan(step, y0, (ts[:-1], ts[1:]))
    traj = jnp.concatenate([y0[None], traj], axis=0)
    return jnp.moveaxis(traj, 0, 1)


def _error_scalar(y_in, y_hi, y_lo, atol, rtol):
    """Batch-global embedded error (reference temporal/solvers.py:198-202)."""
    ymax = jnp.max(jnp.maximum(jnp.abs(y_in), jnp.abs(y_hi)), axis=0, keepdims=True)
    sc = atol + ymax * rtol
    err = jnp.sqrt(jnp.mean(((y_hi - y_lo) / sc) ** 2, axis=-1))
    return jnp.max(err)


def _adaptive_interval(tab: Tableau, f: Callable, t0, dt, y0, max_depth: int):
    """Integrate one output interval [t0, t0+dt] by dyadic subdivision."""
    atol = jnp.asarray(tab.atol, y0.dtype)
    rtol = jnp.asarray(tab.rtol, y0.dtype)
    total_units = jnp.int32(1 << max_depth)

    def cond(state):
        t_units, h_units, y = state
        return t_units < total_units

    def body(state):
        t_units, h_units, y = state
        h = dt * (h_units.astype(y.dtype) / total_units.astype(y.dtype))
        t = t0 + dt * (t_units.astype(y.dtype) / total_units.astype(y.dtype))
        y_hi, y_lo = erk_step(tab, f, t, y, h)
        err = _error_scalar(y, y_hi, y_lo, atol, rtol)
        accept = jnp.logical_or(err < 1.0, h_units <= 1)  # depth cap: force accept

        new_t_units = jnp.where(accept, t_units + h_units, t_units)
        # Next step: after accept, largest dyadic step aligned at the new
        # position (lowest set bit); after reject, halve.
        lowbit = jnp.bitwise_and(new_t_units, -new_t_units)
        next_h = jnp.where(
            accept,
            jnp.where(new_t_units >= total_units, jnp.int32(1), lowbit),
            jnp.maximum(h_units // 2, 1),
        )
        new_y = jnp.where(accept, y_hi, y)
        return new_t_units, next_h, new_y

    init = (jnp.int32(0), total_units, y0)
    _, _, y_final = jax.lax.while_loop(cond, body, init)
    return y_final


def solve_adaptive(
    f: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    tab: Tableau,
    max_depth: int = 12,
):
    """Adaptive integration with dense output at every ts[i].

    Equivalent to the reference Solver(RKSolver(Dopri45())).solve path
    (temporal/solvers.py:24-39 + the recursive halving at :204-207), with the
    recursion bounded at ``max_depth`` halvings per output interval.
    Returns [batch, nt, ...].
    """
    if not tab.is_adaptive:
        raise ValueError("solve_adaptive requires an embedded (adaptive) tableau")

    def step(y, tp):
        t, t_next = tp
        y_next = _adaptive_interval(tab, f, t, t_next - t, y, max_depth)
        return y_next, y_next

    _, traj = jax.lax.scan(step, y0, (ts[:-1], ts[1:]))
    traj = jnp.concatenate([y0[None], traj], axis=0)
    return jnp.moveaxis(traj, 0, 1)
