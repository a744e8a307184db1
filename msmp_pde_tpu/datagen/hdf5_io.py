"""HDF5 dataset writing with the reference schema.

Schema parity with /root/reference/generate/generate_data.py:330-354:
file ``data/{PDE}_{mode}_{experiment}.h5`` containing one group per mode with
  * one dataset per resolution, key ``pde_{nt}-{nx}``, shape
    [num_samples, nt, nx] (scalar PDEs) or [num_samples, 2, nt, nx] (the
    2-component advection system), attrs dt/dx/nt/nx/tmin/tmax/x;
  * per-sample scalar parameter datasets (alpha/beta/gamma, r/D, a/b,
    bc_left/bc_right/c depending on the family).

Reference-generated files and ours are interchangeable for the training
pipeline.
"""
from __future__ import annotations

import os
from typing import Dict, Sequence

import h5py
import numpy as np


def open_for_mode(path: str, mode: str, replace: bool = True) -> h5py.File:
    if replace and os.path.exists(path) and mode == "train":
        os.remove(path)
    return h5py.File(path, "a")


class ModeWriter:
    """Writes one mode group (train/valid/test) incrementally."""

    def __init__(
        self,
        h5f: h5py.File,
        mode: str,
        num_samples: int,
        resolutions: Dict[str, dict],
        scalar_names: Sequence[str] = (),
        scalar_dtypes: Dict[str, type] = None,
        components: int = 1,
    ):
        self.h5f = h5f
        if mode in h5f:
            del h5f[mode]
        self.group = h5f.create_group(mode)
        self.num_samples = num_samples
        self.u = {}
        for key, meta in resolutions.items():
            nt, nx = meta["nt"], meta["nx"]
            shape = (
                (num_samples, nt, nx)
                if components == 1
                else (num_samples, components, nt, nx)
            )
            ds = self.group.create_dataset(key, shape, dtype=float)
            for attr in ("dt", "dx", "nt", "nx", "tmin", "tmax", "x"):
                ds.attrs[attr] = meta[attr]
            self.u[key] = ds
        scalar_dtypes = scalar_dtypes or {}
        self.scalars = {
            name: self.group.create_dataset(
                name, (num_samples,), dtype=scalar_dtypes.get(name, float)
            )
            for name in scalar_names
        }

    def write(self, key: str, start: int, traj: np.ndarray):
        # Loud (non-fatal: KS blowups are legitimately non-finite and
        # separately tracked by its validity mask) — silent NaN corruption
        # once slipped through an f32 IC overflow (see RESULTS.md round 2).
        n_bad = int(traj.size - np.isfinite(traj).sum())
        if n_bad:
            print(
                f"WARNING: {n_bad}/{traj.size} non-finite values written to "
                f"{self.group.name}/{key}[{start}:{start + traj.shape[0]}]"
            )
        self.u[key][start : start + traj.shape[0]] = traj

    def write_scalar(self, name: str, start: int, vals: np.ndarray):
        vals = np.asarray(vals).reshape(-1)
        self.scalars[name][start : start + vals.shape[0]] = vals
