"""Kolmogorov-Fisher reaction-diffusion equation.

    u_t = D u_xx + r u (1 - u)

Capability parity with /root/reference/equations/PDEs.py:320-400. Two spatial
discretizations:

  * bc='periodic'  — 4th-order central difference u_xx (FDM).
  * bc='dirichlet' — the reference builds a 6th-order banded FD matrix but
    then applies only its *diagonal* via einsum('ii,ki->ki') (PDEs.py:399),
    i.e. u_xx ~ (-49/18) u / dx^2. We reproduce that behavior by default
    (``diag_quirk=True``) so generated data is distribution-identical, and
    provide the full banded operator behind ``diag_quirk=False`` as the
    fixed variant.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax.numpy as jnp
import numpy as np

from msmp_pde_tpu.equations.base import PDE
from msmp_pde_tpu.ops import periodic_pad, fdm_second_derivative, correlate1d

# 6th-order central second-derivative taps (interior rows of the reference's
# banded Dirichlet matrix, PDEs.py:378-385).
_D2_ORDER6 = np.array([1 / 90, -3 / 20, 3 / 2, -49 / 18, 3 / 2, -3 / 20, 1 / 90])


@dataclasses.dataclass(repr=False)
class KF(PDE):
    r: float = 1.0
    D: float = 0.1
    bc: str = "dirichlet"
    diag_quirk: bool = True
    lmax: int = 8  # wider IC frequency band (reference :360)

    def make_rhs(self, r=None, D=None) -> Callable:
        """Build rhs(t, u) for u of shape [..., nx].

        r/D may be arrays broadcastable against u for per-sample coefficients.
        """
        r = self.r if r is None else r
        D = self.D if D is None else D
        dx = self.dx
        bc = self.bc
        diag_quirk = self.diag_quirk

        def reaction(u):
            return r * u * (1.0 - u)

        if bc == "periodic":

            def rhs(t, u):
                uxx = fdm_second_derivative(periodic_pad(u), dx)
                return D * uxx + reaction(u)

        elif bc == "dirichlet":
            if diag_quirk:
                diag = _D2_ORDER6[3] / dx**2  # -49/18 / dx^2

                def rhs(t, u):
                    return D * (diag * u) + reaction(u)

            else:
                taps = _D2_ORDER6 / dx**2

                def rhs(t, u):
                    # zero-padded (homogeneous Dirichlet) 6th-order u_xx
                    pad = [(0, 0)] * (u.ndim - 1) + [(3, 3)]
                    u_p = jnp.pad(u, pad)
                    return D * correlate1d(u_p, taps) + reaction(u)

        else:
            raise ValueError(f"unsupported bc {bc!r}")

        return rhs
