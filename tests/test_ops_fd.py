"""Convergence-order and oracle tests for the FDM/WENO spatial operators."""
import numpy as np
import jax.numpy as jnp
import pytest

from msmp_pde_tpu.ops import (
    periodic_pad,
    fdm_first_derivative,
    fdm_second_derivative,
    fdm_third_derivative,
    fdm_fourth_derivative,
    weno_pad,
    weno_reconstruct,
    weno_godunov,
)


def _grid(nx, L=2 * np.pi):
    # Duplicated-endpoint periodic grid convention (SURVEY.md / fd.py docstring).
    x = np.linspace(0, L, nx)
    dx = L / nx
    return x, dx


def _trig_field(x):
    return np.sin(x * (x * 0 + 1.0)) + 0.5 * np.cos(2 * x)


class TestFDMConvergence:
    """Orders: d1/d2 are 4th order, d3/d4 are 2nd order (stencils.py)."""

    def _conv_rate(self, deriv_fn, exact_fn, order_dx):
        errs = []
        for nx in (64, 128, 256):
            x, dx = _grid(nx)
            # effective spacing between samples is L/(nx-1); the reference
            # divides by dx = L/nx — use the *actual* spacing here to measure
            # pure stencil accuracy.
            h = x[1] - x[0]
            u = jnp.asarray(_trig_field(x))[None]
            padded = periodic_pad(u)
            got = np.asarray(deriv_fn(padded, h))[0]
            want = exact_fn(x)
            # endpoints duplicated -> interior comparison
            errs.append(np.max(np.abs(got[2:-2] - want[2:-2])))
        rate = np.log2(errs[0] / errs[1])
        rate2 = np.log2(errs[1] / errs[2])
        return min(rate, rate2)

    def test_first_derivative_order4(self):
        rate = self._conv_rate(
            fdm_first_derivative, lambda x: np.cos(x) - np.sin(2 * x), 1
        )
        assert rate > 3.5

    def test_second_derivative_order4(self):
        rate = self._conv_rate(
            fdm_second_derivative, lambda x: -np.sin(x) - 2 * np.cos(2 * x), 2
        )
        assert rate > 3.5

    def test_third_derivative_order2(self):
        rate = self._conv_rate(
            fdm_third_derivative, lambda x: -np.cos(x) + 4 * np.sin(2 * x), 3
        )
        assert rate > 1.7

    def test_fourth_derivative_order2(self):
        rate = self._conv_rate(
            fdm_fourth_derivative, lambda x: np.sin(x) + 8 * np.cos(2 * x), 4
        )
        assert rate > 1.7


class TestWENO:
    def test_reconstruct_smooth_accuracy(self):
        """Fed exact *cell averages* of a smooth field, WENO5 reconstructs the
        right-interface point values at 5th order (weights -> optimal)."""
        errs = []
        for nx in (64, 128, 256):
            L = 2 * np.pi
            x = np.linspace(0, L, nx)
            h = x[1] - x[0]
            # exact cell average of sin over [x-h/2, x+h/2]
            u = (np.cos(x - h / 2) - np.cos(x + h / 2)) / h
            rec = np.asarray(weno_reconstruct(weno_pad(jnp.asarray(u)[None])))[0]
            want = np.sin(x + h / 2)
            errs.append(np.max(np.abs(rec[3:-3] - want[3:-3])))
        rate = np.log2(errs[1] / errs[2])
        assert rate > 4.2, f"rate={rate}, errs={errs}"

    def test_reconstruct_matches_manual_weno5(self):
        """Cross-check against a direct (loop) WENO5 implementation."""
        rng = np.random.default_rng(0)
        nx = 40
        u = rng.normal(size=nx)
        rec = np.asarray(weno_reconstruct(weno_pad(jnp.asarray(u)[None])))[0]

        # manual: pad then per-point candidate reconstruction
        up = np.concatenate([u[-3:-1], u, u[1:3]])
        eps = 1e-16
        gamma = np.array([0.1, 0.6, 0.3])
        for i in range(nx):
            w5 = up[i : i + 5]
            b = np.empty(3)
            b[0] = 13 / 12 * (w5[0] - 2 * w5[1] + w5[2]) ** 2 + 0.25 * (
                w5[0] - 4 * w5[1] + 3 * w5[2]
            ) ** 2
            b[1] = 13 / 12 * (w5[1] - 2 * w5[2] + w5[3]) ** 2 + 0.25 * (
                w5[1] - w5[3]
            ) ** 2
            b[2] = 13 / 12 * (w5[2] - 2 * w5[3] + w5[4]) ** 2 + 0.25 * (
                3 * w5[2] - 4 * w5[3] + w5[4]
            ) ** 2
            wt = gamma / (eps + b) ** 2
            w = wt / wt.sum()
            cand = np.array(
                [
                    (2 * w5[0] - 7 * w5[1] + 11 * w5[2]) / 6,
                    (-w5[1] + 5 * w5[2] + 2 * w5[3]) / 6,
                    (2 * w5[2] + 5 * w5[3] - w5[4]) / 6,
                ]
            )
            assert abs(rec[i] - np.dot(w, cand)) < 1e-12

    def test_godunov_advects_burgers_correctly(self):
        """-godunov(u)/1 should approximate -d/dx(u^2/2) for smooth u."""
        nx = 512
        L = 2 * np.pi
        x = np.linspace(0, L, nx)
        h = x[1] - x[0]
        u = 2.0 + 0.5 * np.sin(x)  # positive -> upwinding well-defined
        flux = lambda v: 0.5 * v**2
        div = np.asarray(weno_godunov(weno_pad(jnp.asarray(u)[None]), h, flux))[0]
        want = u * np.cos(x) * 0.5  # d/dx(u^2/2) = u u_x, u_x = 0.5 cos
        err = np.max(np.abs(div[5:-5] - want[5:-5]))
        assert err < 1e-4, err
