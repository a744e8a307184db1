"""PDE metadata base class.

Carries the grid/domain bookkeeping every downstream layer needs (datagen,
dataset reader, graph construction, models). Capability parity with the
``PDE(nn.Module)`` template at /root/reference/equations/PDEs.py:14-34, but as
a plain dataclass — the RHS operators are pure functions built by each
subclass, not methods on a torch module.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass
class PDE:
    tmin: float = 0.0
    tmax: float = 0.5
    grid_size: Tuple[int, int] = (16, 64)  # (nt, nx)
    L: float = 16.0

    # Sum-of-sines IC frequency band and wave count (per-family overrides).
    lmin: int = 1
    lmax: int = 3
    n_waves: int = 5

    @property
    def nt(self) -> int:
        return self.grid_size[0]

    @property
    def nx(self) -> int:
        return self.grid_size[1]

    @property
    def dt(self) -> float:
        return self.tmax / (self.grid_size[0] - 1)

    @property
    def dx(self) -> float:
        # Duplicated-endpoint periodic convention: dx = L / nx (see ops/fd.py).
        return self.L / self.grid_size[1]

    def __repr__(self):
        return type(self).__name__
