"""Combined equation (Burgers / KdV / heat as edge cases).

    u_t = -alpha * u u_x + beta * u_xx - gamma * u_xxx  [+ forcing]

Capability parity with /root/reference/equations/PDEs.py:37-147. The spatial
operator is a pure function ``make_rhs(...)`` suitable for jit/vmap/scan:
WENO5 Godunov (or Lax-Friedrichs) for the advection flux, 4th/2nd-order
central differences for the diffusion/dispersion terms, and an optional
time-dependent sum-of-sines forcing.

Coefficients may be scalars or arrays broadcastable against u ([B, 1, nx]),
so a whole dataset batch with heterogeneous (alpha, beta, gamma) integrates
in one fused TPU program — replacing the reference's one-solve-per-
coefficient-draw loop (generate/generate_data.py:357-396).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp

from msmp_pde_tpu.equations.base import PDE
from msmp_pde_tpu.ops import (
    weno_pad,
    weno_godunov,
    weno_laxfriedrichs,
    periodic_pad,
    fdm_second_derivative,
    fdm_third_derivative,
)


def flux(u: jnp.ndarray) -> jnp.ndarray:
    """Burgers flux f(u) = u^2 / 2 (reference :103-107)."""
    return 0.5 * u * u


@dataclasses.dataclass(repr=False)
class CE(PDE):
    alpha: float = 3.0
    beta: float = 0.0
    gamma: float = 1.0
    flux_splitting: str = "godunov"

    def make_rhs(
        self,
        alpha=None,
        beta=None,
        gamma=None,
        force: Optional[Callable] = None,
    ) -> Callable:
        """Build rhs(t, u) for u of shape [..., nx].

        alpha/beta/gamma default to the instance scalars; pass arrays of
        shape broadcastable to u (e.g. [B, 1, 1]) for per-sample coefficients.
        force(t) -> array broadcastable to u.
        """
        alpha = self.alpha if alpha is None else alpha
        beta = self.beta if beta is None else beta
        gamma = self.gamma if gamma is None else gamma
        dx = self.dx
        splitting = self.flux_splitting
        if splitting not in ("godunov", "laxfriedrichs"):
            raise ValueError(f"unknown flux splitting {splitting!r}")

        def rhs(t, u):
            u_w = weno_pad(u)
            if splitting == "godunov":
                adv = weno_godunov(u_w, dx, flux)
            else:
                adv = weno_laxfriedrichs(u_w, dx, flux)
            u_f = periodic_pad(u)
            dudt = (
                -alpha * adv
                + beta * fdm_second_derivative(u_f, dx)
                - gamma * fdm_third_derivative(u_f, dx)
            )
            if force is not None:
                dudt = dudt + force(t)
            return dudt

        return rhs
