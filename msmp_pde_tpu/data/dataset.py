"""HDF5 dataset reader with super->base down-projection.

Capability parity with ``HDF5Dataset`` (/root/reference/common/utils.py:101-264)
— reads reference-schema files (ours or the torch reference's) and produces,
per sample:

  * ``u_base``  — the coarse numerical baseline trajectory;
  * ``u_super`` — the high-resolution trajectory down-projected to the base
    resolution (the training target);
  * ``x``       — base spatial coordinates;
  * equation-specific scalar variables.

TPU-native differences: the whole mode is loaded and down-projected **once,
vectorized over samples** at construction (the reference re-runs a conv1d
per __getitem__), and arrays are returned as numpy ready for device upload.
The per-family down-projection rules match common/utils.py exactly:

  CE/KS (:167-184, :205-219): temporal stride, periodic pad (u[-3:-1] left,
      u[1:3] right), 5-tap averaging kernel [0.2]*5 with spatial stride.
  KF (:186-203): same but zero padding (Dirichlet).
  WE (:221-239): ratio-width mean kernel, stride ratio, no pad; the
      coordinates are down-projected with the same kernel.
  AD (:241-261): temporal stride then spatial stride-2 subsampling u[...,0:-1:2]
      (the reference hardcodes stride 2); unstructured grids use u_base as-is.
      Output axes swapped to [nt, 2, nx].
"""
from __future__ import annotations

from typing import Dict

import h5py
import numpy as np


def _avg_downproject(u: np.ndarray, ratio_nx: int, pad: str) -> np.ndarray:
    """5-tap [0.2]*5 stride-``ratio_nx`` averaging along the last axis.

    Uses the threaded native library (utils/native.py) when built; the numpy
    fallback below is bit-identical."""
    from msmp_pde_tpu.utils import native

    if native.available():
        return native.avg_downproject(u, ratio_nx, pad)
    if pad == "periodic":
        left = u[..., -3:-1]
        right = u[..., 1:3]
    elif pad == "zero":
        left = np.zeros_like(u[..., -3:-1])
        right = np.zeros_like(u[..., 1:3])
    else:
        raise ValueError(pad)
    up = np.concatenate([left, u, right], axis=-1)
    n_out = u.shape[-1] // ratio_nx
    idx = np.arange(n_out) * ratio_nx
    out = np.zeros(u.shape[:-1] + (n_out,), dtype=u.dtype)
    for j in range(5):
        out += 0.2 * up[..., idx + j]
    return out


def _mean_downproject(u: np.ndarray, ratio_nx: int) -> np.ndarray:
    """ratio-wide mean kernel, stride ratio, valid (WE; utils.py:224-230)."""
    from msmp_pde_tpu.utils import native

    if native.available():
        return native.mean_downproject(u, ratio_nx)
    n_out = u.shape[-1] // ratio_nx
    idx = np.arange(n_out) * ratio_nx
    out = np.zeros(u.shape[:-1] + (n_out,), dtype=u.dtype)
    for j in range(ratio_nx):
        out += u[..., idx + j] / ratio_nx
    return out


class PDEDataset:
    """One mode (train/valid/test) of a reference-schema HDF5 file."""

    VAR_NAMES = {
        "CE": ("alpha", "beta", "gamma"),
        "KF": ("r", "D"),
        "KS": (),
        "WE": ("bc_left", "bc_right", "c"),
        "AD": ("a", "b"),
    }

    def __init__(
        self,
        path: str,
        pde,
        mode: str,
        base_resolution=None,
        super_resolution=None,
        dtype=np.float32,
    ):
        self.pde = pde
        self.mode = mode
        base_resolution = base_resolution or (250, 100)
        super_resolution = super_resolution or (250, 200)
        self.base_resolution = tuple(base_resolution)
        self.super_resolution = tuple(super_resolution)
        family = f"{pde}"
        key_base = f"pde_{base_resolution[0]}-{base_resolution[1]}"
        key_super = f"pde_{super_resolution[0]}-{super_resolution[1]}"

        with h5py.File(path, "r") as f:
            g = f[mode]
            db, ds = g[key_base], g[key_super]
            ratio_nt = ds.shape[-2] // db.shape[-2]
            ratio_nx = ds.shape[-1] // db.shape[-1]
            assert ds.shape[-2] % db.shape[-2] == 0
            assert ds.shape[-1] % db.shape[-1] == 0

            self.nt = int(db.attrs["nt"])
            self.dt = float(db.attrs["dt"])
            self.dx = float(db.attrs["dx"])
            self.tmin = float(db.attrs["tmin"])
            self.tmax = float(db.attrs["tmax"])
            x = np.asarray(db.attrs["x"], dtype=np.float64)

            u_base = db[:]
            u_super = ds[:]
            self.variables: Dict[str, np.ndarray] = {
                name: g[name][:] for name in self.VAR_NAMES[family]
            }

        if family in ("CE", "KS"):
            u = u_super[:, ::ratio_nt]
            u = _avg_downproject(u, ratio_nx, "periodic")
        elif family == "KF":
            u = u_super[:, ::ratio_nt]
            u = _avg_downproject(u, ratio_nx, "zero")
        elif family == "WE":
            u = u_super[:, ::ratio_nt]
            u = _mean_downproject(u, ratio_nx)
            x_super = None
            with h5py.File(path, "r") as f:
                x_super = np.asarray(f[mode][key_super].attrs["x"], np.float64)
            x = _mean_downproject(x_super[None], ratio_nx)[0]
        elif family == "AD":
            if getattr(pde, "unstructured_grid", False):
                u = u_base.copy()
            else:
                u = u_super[:, :, ::ratio_nt][..., 0:-1:2]
            # [N, 2, nt, nx] -> [N, nt, 2, nx]
            u = np.swapaxes(u, 1, 2)
            u_base = np.swapaxes(u_base, 1, 2)
        else:
            raise ValueError(f"unknown family {family!r}")

        self.u_base = u_base.astype(dtype)
        self.u_super = u.astype(dtype)
        self.x = x.astype(dtype)

    def __len__(self):
        return self.u_super.shape[0]

    @property
    def n_components(self) -> int:
        return 2 if f"{self.pde}" == "AD" else 1
