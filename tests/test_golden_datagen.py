"""Golden fixed-seed datagen regression tests (SURVEY.md §4, item 5).

Tiny datasets generated with a frozen seed must reproduce stored statistical
fingerprints (mean, std, one probe value). Guards the whole generation stack
(IC samplers -> RHS -> integrators -> writer) against silent regressions.
f64 CPU only — fingerprints are platform-stable at 1e-9.
"""
import contextlib
import io
import os

import h5py
import numpy as np
import pytest

# (mean, std, flat[123456 % size]) of train/pde_250-100, seed=7, 4/2/2 samples
GOLDEN = {
    "CE_GOLD": (3.623298004285e-04, 6.628358023640e-01, -1.252783253861e+00),
    "AD_GOLD": (3.830347167020e-04, 4.130886728178e-01, -7.012997336102e-01),
    "WE_GOLD": (3.924230088321e-03, 2.532822626670e-01, 6.223381515982e-03),
    "KF_GOLD": (4.032775994934e-01, 3.518123409202e-01, 3.842282994036e-01),
}


@pytest.fixture(scope="module")
def golden_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden")
    cwd = os.getcwd()
    os.chdir(d)
    os.makedirs("data", exist_ok=True)
    from msmp_pde_tpu.datagen.generate import (
        build_parser, generate_ce, generate_kf, generate_rp, generate_we,
    )

    args = build_parser().parse_args(
        ["--experiment=GOLD", "--train_samples=4", "--valid_samples=2",
         "--test_samples=2", "--chunk=4", "--batch_size=2", "--seed=7",
         "--platform=default"]
    )
    with contextlib.redirect_stdout(io.StringIO()):
        generate_ce(args, 4.0, (1.0, 1.0), (0.0, 0.2), (0.0, 0.0))
        generate_rp(args, 4.0, (0.1, 1.0), (1.0, 10.0), "sinesum")
        generate_we(args, "mixed", 100.0, 2.0)
        generate_kf(args, 5.0, (0.0, 2.0), (1e-6, 1e-2))
    yield d
    os.chdir(cwd)


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_golden_fingerprint(golden_dir, name):
    with h5py.File(f"data/{name}.h5") as f:
        d = f["train"]["pde_250-100"][:]
    mean, std, probe = GOLDEN[name]
    assert abs(d.mean() - mean) < 1e-9, (name, d.mean())
    assert abs(d.std() - std) < 1e-9
    assert abs(float(d.reshape(-1)[123456 % d.size]) - probe) < 1e-9
