"""Datagen tests: IC samplers, LCG grid, HDF5 schema end-to-end."""
import os

import h5py
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmp_pde_tpu.datagen import ics


class TestICs:
    def test_sine_params_distributions(self):
        key = jax.random.PRNGKey(0)
        A, omega, phi, l = ics.sample_sine_params(key, 2000, 5, 1, 3)
        assert A.shape == (2000, 1, 5)
        assert float(A.min()) >= -0.5 and float(A.max()) <= 0.5
        assert float(jnp.abs(omega).max()) <= 0.4
        assert float(phi.min()) >= 0 and float(phi.max()) <= 2 * np.pi
        # randint high exclusive: l in {1, 2}
        assert set(np.unique(np.asarray(l))) == {1, 2}

    def test_sum_of_sines_formula(self):
        key = jax.random.PRNGKey(1)
        A, omega, phi, l = ics.sample_sine_params(key, 3, 5, 1, 3)
        L = 16.0
        x = jnp.linspace(0, L, 7)
        f = ics.sum_of_sines(A, omega, phi, l, L)
        got = np.asarray(f(x, t=0.3))
        An, on, pn, ln = map(np.asarray, (A, omega, phi, l))
        want = np.zeros((3, 7))
        for b in range(3):
            for k in range(5):
                want[b] += An[b, 0, k] * np.sin(
                    on[b, 0, k] * 0.3 + 2 * np.pi * ln[b, 0, k] * np.asarray(x) / L
                    + pn[b, 0, k]
                )
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_lcg_grid(self):
        g1 = ics.pseudo_random_grid(0.0, 16.0, 100)
        g2 = ics.pseudo_random_grid(0.0, 16.0, 100)
        np.testing.assert_array_equal(g1, g2)  # deterministic
        assert g1[0] == 0.0 and g1[-1] == 16.0
        assert (np.diff(g1) >= 0).all()
        # the LCG sequence starts 74, 5624, 28652 (c=74, a=75, p=2^16+1)
        raw = [74]
        for _ in range(99):
            raw.append((75 * raw[-1] + 74) % (2**16 + 1))
        want = np.asarray(raw, float) / max(raw) * 16.0
        want = np.sort(want)
        want[0], want[-1] = 0.0, 16.0
        np.testing.assert_allclose(g1, want, atol=1e-12)

    def test_von_mises_normalization(self):
        x = jnp.linspace(0, 2 * np.pi, 20001)
        p = np.asarray(ics.von_mises_pdf(x, 5.0, loc=np.pi))
        assert abs(np.trapezoid(p, np.asarray(x)) - 1.0) < 1e-6

    def test_gaussian_triple_shapes(self):
        key = jax.random.PRNGKey(2)
        (scales, sharps), fn = ics.sample_gaussian_triple_ic(key, 4, 2 * np.pi)
        out = np.asarray(fn(jnp.linspace(0, 2 * np.pi, 50)[None].repeat(4, 0)))
        assert out.shape == (4, 2, 50)
        np.testing.assert_allclose(out[:, 1], 1.0)  # u2 = ones
        assert (out[:, 0] >= 0).all()


class TestEndToEnd:
    def test_rp_cli_schema(self, tmp_path, monkeypatch):
        from msmp_pde_tpu.datagen.generate import build_parser, generate_rp

        monkeypatch.chdir(tmp_path)
        os.makedirs("data", exist_ok=True)
        args = build_parser().parse_args(
            ["--experiment=RP", "--train_samples=4", "--valid_samples=2",
             "--test_samples=2", "--chunk=4", "--batch_size=2"]
        )
        generate_rp(args, 4.0, (0.1, 1.0), (1.0, 10.0), "sinesum")

        with h5py.File("data/AD_RP.h5") as f:
            assert set(f.keys()) == {"train", "valid", "test"}
            g = f["train"]
            ds = g["pde_250-100"]
            assert ds.shape == (4, 2, 250, 100)
            for attr in ("dt", "dx", "nt", "nx", "tmin", "tmax", "x"):
                assert attr in ds.attrs
            assert np.isfinite(ds[:]).all()
            a, b = g["a"][:], g["b"][:]
            # coefficient-group sharing: batch_size=2 pairs share draws
            assert a[0] == a[1] and a[2] == a[3]
            assert (a >= 0.1).all() and (a <= 1.0).all()
            assert (b >= 1.0).all() and (b <= 10.0).all()

    def test_we_cli_schema(self, tmp_path, monkeypatch):
        from msmp_pde_tpu.datagen.generate import build_parser, generate_we

        monkeypatch.chdir(tmp_path)
        os.makedirs("data", exist_ok=True)
        args = build_parser().parse_args(
            ["--experiment=WE1", "--train_samples=2", "--valid_samples=2",
             "--test_samples=2"]
        )
        generate_we(args, "dirichlet", 100.0, 2.0)
        with h5py.File("data/WE_WE1.h5") as f:
            g = f["train"]
            assert g["pde_250-20"].shape == (2, 250, 20)
            assert np.isfinite(g["pde_250-200"][:]).all()
            assert (g["bc_left"][:] == 0).all()
            assert (g["c"][:] == 2.0).all()
            # chebyshev grid attr, ascending, endpoints at domain bounds
            x = g["pde_250-100"].attrs["x"]
            assert x[0] == -8.0 and x[-1] == 8.0 and (np.diff(x) > 0).all()


class TestVonMisesF32Stability:
    def test_gaussian_triple_ic_finite_in_f32(self):
        """MSWG3's sharpness kappa ~ U(50, 150) overflows the naive
        exp(k cos)/I0(k) form in f32 (exp(150) = inf -> inf/inf = NaN on
        the TPU datagen path); the log-space i0e form must stay finite and
        normalized."""
        import jax
        import jax.numpy as jnp
        import numpy as np
        from msmp_pde_tpu.datagen import ics

        key = jax.random.PRNGKey(0)
        _, u0_fn = ics.sample_gaussian_triple_ic(key, 8, 2 * np.pi)
        pts = jnp.asarray(
            np.linspace(0, 2 * np.pi, 200, dtype=np.float32)[None].repeat(8, 0)
        )
        u = np.asarray(u0_fn(pts.astype(jnp.float32)))
        assert u.dtype == np.float32 or np.isfinite(u).all()
        assert np.isfinite(u).all()
        # the u1 component integrates to ~sum(scales) (3 normalized bumps)
        assert (u[:, 0].max(axis=-1) > 0).all()

    def test_von_mises_matches_scipy_f64(self):
        import jax.numpy as jnp
        import numpy as np
        from scipy.special import i0e
        from msmp_pde_tpu.datagen.ics import von_mises_pdf

        x = np.linspace(0, 2 * np.pi, 101)
        for kappa in (1e-5, 1.0, 10.0, 150.0):
            ours = np.asarray(von_mises_pdf(jnp.asarray(x), kappa, loc=np.pi))
            ref = np.exp(kappa * (np.cos(x - np.pi) - 1)) / (2 * np.pi * i0e(kappa))
            np.testing.assert_allclose(ours, ref, rtol=1e-12)
