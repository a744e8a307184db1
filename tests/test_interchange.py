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
    not os.path.exists(os.path.join(TORCHREF_DIR, "KS_test_KS.h5")),
    reason="torch-reference-generated KS dataset not present",
)
def test_ks_energy_spectrum_matches_reference():
    """Chaotic KS trajectories can't match pointwise, but the attractor's
    time-mean energy spectrum is a sharp statistical invariant: our
    ETDRK4/DFT datagen (equations/ks.py) must reproduce the spectrum of the
    torch reference's ETDRK4 (PDEs.py:631-765; data via
    experiments/torchref_ks.py) mode-by-mode."""
    ref_path = os.path.join(TORCHREF_DIR, "KS_test_KS.h5")
    ours_path = "data/KS_KS.h5"
    if not os.path.exists(ours_path):
        pytest.skip("our full-scale KS dataset not present")

    def spectrum(path, group):
        try:
            with h5py.File(path, "r") as f:
                u = f[group]["pde_250-100"][:]
        except (OSError, KeyError):
            pytest.skip(f"{path} locked or incomplete (generation running)")
        if not np.any(u[-1]):
            pytest.skip(f"{path} still being generated (trailing zeros)")
        # drop the initial windows (transient already removed by both
        # generators, but be conservative) and average |fft|^2
        u = u[:, 50:, :]
        spec = np.abs(np.fft.rfft(u, axis=-1)) ** 2 / u.shape[-1]
        return spec.mean(axis=(0, 1))

    s_ref = spectrum(ref_path, "test")
    s_ours = spectrum(ours_path, "test")
    # energetic modes (k=1..12 carry >99.99% of KS energy at L=22); the
    # tail beyond is ~1e-8 dealiasing/filter noise and differs freely
    k = slice(1, 13)
    ratio = s_ours[k] / s_ref[k]
    assert np.all(ratio > 0.5) and np.all(ratio < 2.0), ratio
    # total energy within 15%
    e_ref, e_ours = s_ref[1:].sum(), s_ours[1:].sum()
    assert abs(e_ours - e_ref) / e_ref < 0.15, (e_ours, e_ref)


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


@pytest.mark.skipif(
    not (os.path.exists(os.path.join(TORCHREF_DIR, "CE_test_E1.h5"))
         and os.path.exists("data/CE_E1.h5")),
    reason="both E1 datasets not present",
)
def test_e1_statistics_match_reference():
    """Same IC distribution + same PDE: our E1 datagen and the torch
    reference's must produce statistically identical datasets (mean, std,
    time-mean spatial spectrum) — the distribution-level accuracy check
    behind BASELINE.md's nRMSE story."""
    pde = CE(tmax=4.0, grid_size=(250, 100))
    ours = PDEDataset("data/CE_E1.h5", pde, "test", (250, 100), (250, 200))
    ref = PDEDataset(
        resolve_data_path(TORCHREF_DIR, "CE", "E1", "", "test"),
        pde, "test", (250, 100), (250, 200),
    )
    a, b = ours.u_super, ref.u_super
    assert abs(a.mean() - b.mean()) < 0.02
    assert abs(a.std() - b.std()) / b.std() < 0.05
    sa = (np.abs(np.fft.rfft(a, axis=-1)) ** 2).mean(axis=(0, 1))
    sb = (np.abs(np.fft.rfft(b, axis=-1)) ** 2).mean(axis=(0, 1))
    ratio = sa[1:20] / sb[1:20]
    assert np.all(ratio > 0.7) and np.all(ratio < 1.4), ratio
