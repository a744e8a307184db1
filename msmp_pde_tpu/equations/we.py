"""Wave equation on a Chebyshev grid: u_tt = c^2 u_xx, Dirichlet/Neumann BCs.

Capability parity with /root/reference/equations/PDEs.py:150-244 (the WE
class and its ``chebdx`` pseudospectral RHS) and the Radau datagen path at
generate/generate_data.py:155-291.

TPU-native design: with homogeneous BCs the first-order system

    d/dt [u; w] = A [u; w],   A = [[0, I], [c^2 D2_bc, 0]]

is *linear time-invariant*, and the Chebyshev-bordered D2 has a purely
imaginary spectrum (checked numerically: max Re(eig) ~ 1e-13, propagator
spectral radius 1.0). So instead of a stiff implicit integrator we compute
the exact one-output-step propagator P = expm(A * dt) once per
(resolution, bc, c) on host, and the whole trajectory is a ``lax.scan`` of
batched matmuls — exact at output times (vs the reference's Radau at
rtol=atol=1e-3, generate_data.py:264) and hundreds of times faster. A scipy
Radau fallback is kept in datagen for strict-parity runs.

Grid-orientation note: the reference's Cheb.solve builds its basis on the
*descending* extremal grid while the data lives on the ascending grid; for
the symmetric BC pairs used by WE1/WE2 this is an exact mirror symmetry. We
build the operator consistently on the ascending grid (bc_left applies to
xmin). The reference's 'mixed' WE3 path never actually randomizes bc_right
(generate_data.py:238-239 assigns bc_left twice) — we reproduce that sampling
quirk in datagen but enforce the recorded BCs consistently.
"""
from __future__ import annotations

import dataclasses
import functools

import numpy as np
import scipy.linalg

from msmp_pde_tpu.equations.base import PDE
from msmp_pde_tpu.equations.cheb import (
    bordered_diffmat,
    cheb_points,
    homogeneous_interior_operator,
)

BC_ORDER = {"dirichlet": 0, "neumann": 1}


def cheb_grid_ascending(xmin: float, xmax: float, n: int) -> np.ndarray:
    """Chebyshev extremal grid mapped to [xmin, xmax], ascending
    (reference generate_data.py:64-78)."""
    x = cheb_points(n)[::-1]
    return (xmax - xmin) * (x + 1.0) / 2.0 + xmin


@functools.lru_cache(maxsize=None)
def wave_interior_operator(
    n: int, bc_left: str, bc_right: str, L: float
) -> np.ndarray:
    """[n, n-2] map: u_xx from *ascending-grid* interior values, homogeneous
    BCs of order BC_ORDER[bc_left] at xmin / BC_ORDER[bc_right] at xmax.

    Built on the canonical descending grid (cheb.py) and flipped; on the
    descending grid the first point is x=+1 = xmax, so (left, right) swap.
    """
    ol, orr = BC_ORDER[bc_left], BC_ORDER[bc_right]
    if ol == orr:
        d_desc = homogeneous_interior_operator(n, 2, ol, orr, L)
    else:
        # descending grid: t0-row = xmax -> bc_right order first
        bcs = ((orr, (0.0, None)), (ol, (None, 0.0)))
        diffmat, bc_vals = bordered_diffmat(n, 2, bcs, L)
        d_desc = diffmat[:, len(bc_vals):]
    # flip rows and (interior) columns to ascending orientation
    return d_desc[::-1, ::-1].copy()


@functools.lru_cache(maxsize=None)
def wave_propagator(
    n: int, bc_left: str, bc_right: str, L: float, c: float, dt: float
) -> np.ndarray:
    """Exact one-step propagator P [2n, 2n] for state [u; u_t] on the
    ascending grid: state(t + dt) = P @ state(t)."""
    M = wave_interior_operator(n, bc_left, bc_right, L)
    Mext = np.zeros((n, n))
    Mext[:, 1:-1] = M
    A = np.block(
        [[np.zeros((n, n)), np.eye(n)], [c**2 * Mext, np.zeros((n, n))]]
    )
    return scipy.linalg.expm(A * dt)


@dataclasses.dataclass(repr=False)
class WE(PDE):
    tmax: float = 20.0
    xmin: float = -8.0
    xmax: float = 8.0
    bc_left: str = "dirichlet"
    bc_right: str = "dirichlet"

    def __post_init__(self):
        self.L = abs(self.xmax - self.xmin)

    @property
    def dx(self) -> float:
        # Non-periodic grid: nx points including both boundaries.
        return self.L / (self.grid_size[1] - 1)

    @property
    def x(self) -> np.ndarray:
        return cheb_grid_ascending(self.xmin, self.xmax, self.grid_size[1])

    def chebdx(self, t, state, x=None, c: float = 1.0) -> np.ndarray:
        """Stacked first-order RHS [u; w] -> [w; c^2 u_xx], numpy host path
        (the scipy-integration fallback; reference PDEs.py:204-244)."""
        n = len(state) // 2
        u, w = state[:n], state[n:]
        M = wave_interior_operator(n, self.bc_left, self.bc_right, self.L)
        return np.concatenate([w, c**2 * (M @ u[1:-1])])

    def propagator(self, c: float = 2.0) -> np.ndarray:
        return wave_propagator(
            self.grid_size[1],
            self.bc_left,
            self.bc_right,
            self.L,
            float(c),
            self.dt,
        )
