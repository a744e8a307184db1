"""Reference HDF5 interchange: the training pipeline must consume the torch
reference's one-file-per-mode layout (generate_data.py:328-330) unmodified,
via training/setup.py::resolve_data_path."""
import os

import h5py
import numpy as np
import pytest

from msmp_pde_tpu.data import PDEDataset
from msmp_pde_tpu.equations import CE
from msmp_pde_tpu.training.setup import resolve_data_path

TORCHREF_DIR = "/root/repo/data_torchref/data"


def _write(path, mode, n, seed):
    rng = np.random.default_rng(seed)
    with h5py.File(path, "a") as f:
        g = f.create_group(mode)
        for nt, nx in ((250, 40), (250, 200)):
            ds = g.create_dataset(f"pde_{nt}-{nx}", (n, nt, nx), dtype=float)
            ds[:] = rng.normal(size=(n, nt, nx))
            x = np.linspace(0, 16.0, nx)
            for k, v in dict(dt=4.0 / (nt - 1), dx=16.0 / nx, nt=nt, nx=nx,
                             tmin=0.0, tmax=4.0, x=x).items():
                ds.attrs[k] = v
        for name in ("alpha", "beta", "gamma"):
            g.create_dataset(name, data=rng.normal(size=(n,)))


def test_per_mode_layout_roundtrip(tmp_path):
    d = str(tmp_path)
    # reference layout: one file per mode, group named after the mode
    for i, mode in enumerate(("train", "valid", "test")):
        _write(os.path.join(d, f"CE_{mode}_EX.h5"), mode, 3, seed=i)
    # merged layout (ours): all three groups in one file
    for i, mode in enumerate(("train", "valid", "test")):
        _write(os.path.join(d, "CE_EXM.h5"), mode, 3, seed=i)

    pde = CE(tmax=4.0, grid_size=(250, 40))
    for mode in ("train", "valid", "test"):
        p_ref = resolve_data_path(d, "CE", "EX", "", mode)
        assert p_ref.endswith(f"CE_{mode}_EX.h5")
        p_merged = resolve_data_path(d, "CE", "EXM", "", mode)
        assert p_merged.endswith("CE_EXM.h5")
        a = PDEDataset(p_ref, pde, mode, (250, 40), (250, 200))
        b = PDEDataset(p_merged, pde, mode, (250, 40), (250, 200))
        np.testing.assert_array_equal(a.u_super, b.u_super)
        np.testing.assert_array_equal(a.u_base, b.u_base)
        for k in a.variables:
            np.testing.assert_array_equal(a.variables[k], b.variables[k])


@pytest.mark.skipif(
    not os.path.exists(os.path.join(TORCHREF_DIR, "CE_train_E1.h5")),
    reason="torch-reference-generated dataset not present",
)
def test_real_torch_reference_files_load():
    """Files written by the ACTUAL torch reference datagen
    (experiments/torchref_e1.py) load through our pipeline."""
    pde = CE(tmax=4.0, grid_size=(250, 100))
    for mode in ("valid", "test"):
        path = resolve_data_path(TORCHREF_DIR, "CE", "E1", "", mode)
        ds = PDEDataset(path, pde, mode, (250, 100), (250, 200))
        assert ds.u_super.shape == (128, 250, 100)
        assert np.isfinite(ds.u_super).all() and np.isfinite(ds.u_base).all()
        # the reference normalizes ICs to zero mean, unit-ish scale
        assert abs(float(ds.u_super.mean())) < 0.05
        assert 0.5 < float(ds.u_super.std()) < 2.0
