"""Linear advection system (2 components) solved exactly by characteristics.

    U_t + M U_x = 0,  M = [[a+b, b-a], [b-a, a+b]] / ... (diagonalized below)

Capability parity with /root/reference/equations/PDEs.py:246-312: the system
diagonalizes with R = [[-1, 1], [1, 1]], Rinv = 0.5*[[-1, 1], [1, 1]] and
characteristic speeds lam1 = 2a, lam2 = 2b; the exact solution at time t is
w_i(x, t) = w_i(x - lam_i t, 0) with u = R w.

The solver is a closed-form evaluation, fully vmappable over (time, sample):
the entire dataset is one jit'ed broadcastured evaluation rather than the
reference's per-sample per-timestep Python loop (generate_data.py:806-812).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

from msmp_pde_tpu.equations.base import PDE

# Eigenbasis of the advection matrix (reference :292-293).
R = np.array([[-1.0, 1.0], [1.0, 1.0]])
RINV = np.array([[-0.5, 0.5], [0.5, 0.5]])


@dataclasses.dataclass(repr=False)
class AD(PDE):
    a: float = 1.0
    b: float = 1.0
    unstructured_grid: bool = False

    def exact_solution(
        self,
        u0_fn: Callable[[jnp.ndarray], jnp.ndarray],
        x: jnp.ndarray,
        t: jnp.ndarray,
        a=None,
        b=None,
    ) -> jnp.ndarray:
        """Evaluate the exact solution on grid x at times t.

        Args:
            u0_fn: initial condition; maps points [n] -> components [2, n]
                   (periodic wrapping is the IC's responsibility).
            x: spatial points [nx].
            t: output times [nt].
            a, b: speeds (scalars; default instance values).
        Returns:
            [2, nt, nx] solution.
        """
        a = self.a if a is None else a
        b = self.b if b is None else b
        lam = jnp.stack([2.0 * jnp.asarray(a), 2.0 * jnp.asarray(b)])  # [2]
        r = jnp.asarray(R, x.dtype)
        rinv = jnp.asarray(RINV, x.dtype)

        # characteristic foot points: [2, nt, nx]
        xs = x[None, None, :] - lam[:, None, None] * t[None, :, None]

        def w_component(i, pts):
            # w(y) = (Rinv @ u0(y))[i]; evaluate u0 on flattened pts.
            u0 = u0_fn(pts.reshape(-1))  # [2, nt*nx]
            w = rinv @ u0  # [2, nt*nx]
            return w[i].reshape(pts.shape)

        w1 = w_component(0, xs[0])
        w2 = w_component(1, xs[1])
        w = jnp.stack([w1, w2])  # [2, nt, nx]
        u = jnp.einsum("ij,jtx->itx", r, w)
        return u


def exact_solution_batch(u0_batch_fn, x, t, a, b):
    """Batched exact solution for per-sample ICs and speeds.

    Args:
        u0_batch_fn: pts [B, M] -> components [B, 2, M] (from datagen.ics).
        x: grid [nx]; t: output times [nt]; a, b: speeds [B].
    Returns:
        [B, 2, nt, nx] solution.
    """
    a = jnp.asarray(a).reshape(-1)
    b = jnp.asarray(b).reshape(-1)
    lam = jnp.stack([2.0 * a, 2.0 * b], axis=1)  # [B, 2]
    xs = (
        x[None, None, None, :]
        - lam[:, :, None, None] * t[None, None, :, None]
    )  # [B, 2, nt, nx]
    B, _, nt, nx = xs.shape
    rinv = jnp.asarray(RINV, x.dtype)
    r = jnp.asarray(R, x.dtype)

    def w_component(i):
        pts = xs[:, i].reshape(B, nt * nx)
        u0 = u0_batch_fn(pts)  # [B, 2, M]
        w = jnp.einsum("ij,bjm->bim", rinv, u0)
        return w[:, i].reshape(B, nt, nx)

    w = jnp.stack([w_component(0), w_component(1)], axis=1)
    return jnp.einsum("ij,bjtx->bitx", r, w)
