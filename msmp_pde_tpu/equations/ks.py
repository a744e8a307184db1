"""Kuramoto-Sivashinsky equation, Fourier-spectral ETDRK4.

    u_t + u u_x + u_xx + u_xxxx = 0,   periodic on x in [0, 2*pi*L]

Capability parity with /root/reference/equations/PDEs.py:527-836 (the
Kassam-Trefethen SISC 2005 scheme): linear term exact in Fourier space,
ETDRK4 coefficients computed by complex contour means (M=62 roots of unity),
nonlinear term g = -0.5j*k applied to fft(real(ifft(v))^2).

TPU-native differences:
  * the scalar ETDRK4 coefficients are precomputed on host in f64 (cheap,
    once) and the time stepping is a jit'ed ``lax.scan`` batched over
    trajectories — the reference steps one trajectory at a time in Python
    (generate_data.py:607-628);
  * only the requested output snapshots are materialized (the reference
    stores every fine step, 400k x nx per trajectory, then downsamples);
  * divergence (NaN/Inf blow-up) is detected post-hoc per trajectory instead
    of the FloatingPointError try/except (PDEs.py:729-738) — callers get a
    per-trajectory validity mask.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class KSCoeffs:
    """Precomputed ETDRK4 scalar fields (all shape [nx])."""

    k: np.ndarray
    E: np.ndarray
    E2: np.ndarray
    Q: np.ndarray
    f1: np.ndarray
    f2: np.ndarray
    f3: np.ndarray
    g: np.ndarray  # complex


def etdrk4_setup(L: float, nx: int, dt: float, M: int = 62) -> KSCoeffs:
    """Kassam-Trefethen coefficient setup (reference PDEs.py:615-641)."""
    k = np.concatenate(
        [np.arange(0, nx / 2), [0.0], np.arange(-nx / 2 + 1, 0)]
    ) / L
    lin = k**2 - k**4
    E = np.exp(dt * lin)
    E2 = np.exp(dt * lin / 2.0)
    r = np.exp(1j * np.pi * (np.arange(1, M + 1) - 0.5) / M)
    LR = dt * lin[:, None] + r[None, :]
    Q = dt * np.real(np.mean((np.exp(LR / 2.0) - 1.0) / LR, 1))
    f1 = dt * np.real(
        np.mean((-4.0 - LR + np.exp(LR) * (4.0 - 3.0 * LR + LR**2)) / LR**3, 1)
    )
    f2 = dt * np.real(np.mean((2.0 + LR + np.exp(LR) * (-2.0 + LR)) / LR**3, 1))
    f3 = dt * np.real(
        np.mean((-4.0 - 3.0 * LR - LR**2 + np.exp(LR) * (4.0 - LR)) / LR**3, 1)
    )
    g = -0.5j * k
    return KSCoeffs(k=k, E=E, E2=E2, Q=Q, f1=f1, f2=f2, f3=f3, g=g)


@dataclasses.dataclass
class KS:
    """KS problem description (grid + solver parameters).

    Mirrors the constructor surface of the reference KS class
    (PDEs.py:543-598): domain [0, 2*pi*L], nx modes, fine step dt, horizon
    [tstart, tend], coarse output step dt_downsampled.
    """

    L: float = 16.0
    nx: int = 128
    dt: float = 0.25
    tend: float = 150.0
    tstart: float = 0.0
    dt_downsampled: float = 250.0

    lmin: int = 1
    lmax: int = 3
    n_waves: int = 5

    def __post_init__(self):
        self.tmin = self.tstart
        self.tmax = self.tend
        horizon = self.tend - self.tstart
        self.nsteps = int(horizon / self.dt)
        self.nsteps_downsampled = int(horizon / self.dt_downsampled)
        self.dx = 2 * np.pi * self.L / self.nx

    def __repr__(self):
        return "KS"

    @property
    def x(self) -> np.ndarray:
        return 2 * np.pi * self.L * np.arange(self.nx) / self.nx

    def testing_ic(self) -> np.ndarray:
        """Kassam-Trefethen test IC (reference PDEs.py:651-653)."""
        x = self.x
        return np.cos(x / self.L) * (1.0 + np.sin(x / self.L))

    def simulate(
        self,
        u0: jnp.ndarray,
        save_steps: np.ndarray,
        coeffs: Optional[KSCoeffs] = None,
        method: str = "auto",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Integrate a batch of ICs, saving only the requested fine steps.

        Args:
            u0: [B, nx] real initial conditions.
            save_steps: increasing array of fine-step indices to save
                (0 = the IC itself). Must include all needed outputs.
            coeffs: optional precomputed ETDRK4 coefficients.
            method: 'fft' (jnp.fft, complex), 'dft' (real DFT matmuls — the
                TPU path: at nx <= 200 two [nx, nx] real matmuls per
                transform ride the MXU and avoid complex dtypes entirely,
                sidestepping a TPU-backend limitation on fused complex
                elementwise + fft programs), or 'auto' (dft on TPU, fft
                elsewhere).
        Returns:
            (u_saved [B, len(save_steps), nx] real,
             valid [B] bool — False where the trajectory blew up).
        """
        if method == "auto":
            import jax as _jax

            method = "dft" if _jax.default_backend() == "tpu" else "fft"
        if method == "dft":
            return self._simulate_dft(u0, save_steps, coeffs)
        c = coeffs or etdrk4_setup(self.L, self.nx, self.dt)
        dtype = u0.dtype
        cdtype = jnp.complex128 if dtype == jnp.float64 else jnp.complex64
        E = jnp.asarray(c.E, dtype)
        E2 = jnp.asarray(c.E2, dtype)
        Q = jnp.asarray(c.Q, dtype)
        f1 = jnp.asarray(c.f1, dtype)
        f2 = jnp.asarray(c.f2, dtype)
        f3 = jnp.asarray(c.f3, dtype)
        g = jnp.asarray(c.g, cdtype)

        save_steps = np.asarray(save_steps)
        assert (np.diff(save_steps) > 0).all()

        def nonlin(v):
            u = jnp.real(jnp.fft.ifft(v))
            return g * jnp.fft.fft(u * u)

        def step(v):
            Nv = nonlin(v)
            a = E2 * v + Q * Nv
            Na = nonlin(a)
            b = E2 * v + Q * Na
            Nb = nonlin(b)
            cc = E2 * a + Q * (2.0 * Nb - Nv)
            Nc = nonlin(cc)
            return E * v + Nv * f1 + 2.0 * (Na + Nb) * f2 + Nc * f3

        v0 = jnp.fft.fft(u0.astype(dtype)).astype(cdtype)

        # One compiled program: outer scan over save points, inner fori_loop
        # advancing by the (dynamic) per-segment fine-step count.
        seg_lens = jnp.asarray(
            np.diff(np.concatenate([[0], save_steps])), jnp.int32
        )

        def seg_step(v, n):
            v = jax.lax.fori_loop(0, n, lambda i, vv: step(vv), v)
            return v, jnp.real(jnp.fft.ifft(v))

        _, u_saved = jax.lax.scan(seg_step, v0, seg_lens)  # [n_save, B, nx]
        u_saved = jnp.moveaxis(u_saved, 0, 1)
        valid = jnp.isfinite(u_saved).all(axis=(1, 2))
        return u_saved, valid

    def _simulate_dft(self, u0, save_steps, coeffs=None):
        """ETDRK4 stepping in split real/imaginary parts with DFT matmuls.

        fft(x) for real x is C@x - i S@x with C = cos(2pi jk/n),
        S = sin(2pi jk/n); real(ifft(v)) = (C@vr - S@vi)/n. The nonlinear
        term g*w with g = -0.5i k becomes (0.5k*wi, -0.5k*wr). All arrays
        stay f32 (or f64) real — ideal for the MXU.
        """
        c = coeffs or etdrk4_setup(self.L, self.nx, self.dt)
        dtype = u0.dtype
        n = self.nx
        jk = np.outer(np.arange(n), np.arange(n)) * (2.0 * np.pi / n)
        C = jnp.asarray(np.cos(jk), dtype)
        S = jnp.asarray(np.sin(jk), dtype)
        E = jnp.asarray(c.E, dtype)
        E2 = jnp.asarray(c.E2, dtype)
        Q = jnp.asarray(c.Q, dtype)
        f1 = jnp.asarray(c.f1, dtype)
        f2 = jnp.asarray(c.f2, dtype)
        f3 = jnp.asarray(c.f3, dtype)
        half_k = jnp.asarray(0.5 * c.k, dtype)
        inv_n = jnp.asarray(1.0 / n, dtype)

        def real_ifft(vr, vi):
            return (vr @ C - vi @ S) * inv_n  # C, S symmetric

        def nonlin(vr, vi):
            u = real_ifft(vr, vi)
            u2 = u * u
            wr = u2 @ C
            wi = -(u2 @ S)
            # g * w, g = -0.5i k
            return half_k * wi, -(half_k * wr)

        def step(vr, vi):
            Nvr, Nvi = nonlin(vr, vi)
            ar, ai = E2 * vr + Q * Nvr, E2 * vi + Q * Nvi
            Nar, Nai = nonlin(ar, ai)
            br, bi = E2 * vr + Q * Nar, E2 * vi + Q * Nai
            Nbr, Nbi = nonlin(br, bi)
            cr, ci = E2 * ar + Q * (2.0 * Nbr - Nvr), E2 * ai + Q * (2.0 * Nbi - Nvi)
            Ncr, Nci = nonlin(cr, ci)
            vr2 = E * vr + Nvr * f1 + 2.0 * (Nar + Nbr) * f2 + Ncr * f3
            vi2 = E * vi + Nvi * f1 + 2.0 * (Nai + Nbi) * f2 + Nci * f3
            return vr2, vi2

        u0 = u0.astype(dtype)
        vr0 = u0 @ C
        vi0 = -(u0 @ S)

        save_steps = np.asarray(save_steps)
        assert (np.diff(save_steps) > 0).all()
        seg_lens = jnp.asarray(
            np.diff(np.concatenate([[0], save_steps])), jnp.int32
        )

        def seg_step(carry, m):
            vr, vi = carry
            vr, vi = jax.lax.fori_loop(
                0, m, lambda i, vv: step(*vv), (vr, vi)
            )
            return (vr, vi), real_ifft(vr, vi)

        _, u_saved = jax.lax.scan(seg_step, (vr0, vi0), seg_lens)
        u_saved = jnp.moveaxis(u_saved, 0, 1)
        valid = jnp.isfinite(u_saved).all(axis=(1, 2))
        return u_saved, valid

    # ---------------------------------------------------- diagnostics
    def energy_spectrum(self, u: jnp.ndarray):
        """Kinetic-energy diagnostics (reference PDEs.py:773-804).

        u: [T, nx] (or [B, T, nx]) physical-space snapshots.
        Returns dict with
          Ek_kt  — energy per wavenumber and time  0.5 |v|^2 / nx * dx,
          Ek_k   — time-averaged spectrum,
          Ek_t   — total energy over time,
          Ek_tt  — time-cumulative average of Ek_t.
        """
        v = jnp.fft.fft(u)
        Ek_kt = 0.5 * jnp.real(jnp.conj(v) * v / self.nx) * self.dx
        T = u.shape[-2]
        counts = jnp.arange(1, T + 1, dtype=u.dtype)
        Ek_k = jnp.sum(Ek_kt, axis=-2) / T
        Ek_t = jnp.sum(Ek_kt, axis=-1)
        Ek_tt = jnp.cumsum(Ek_t, axis=-1) / counts
        return {"Ek_kt": Ek_kt, "Ek_k": Ek_k, "Ek_t": Ek_t, "Ek_tt": Ek_tt}

    def _k_grid(self) -> np.ndarray:
        """The reference's wavenumber array (PDEs.py:617): integers over L
        with the Nyquist mode labeled k=0 — so |k| filters always KEEP the
        Nyquist mode. Preserved as-is for behavioral parity."""
        return np.concatenate([np.arange(0, self.nx / 2), [0.0],
                               np.arange(-self.nx / 2 + 1, 0)]) / self.L

    def space_filter(self, u: jnp.ndarray, k_cut: float = 2.0):
        """Low-pass spatial filter + residual (reference PDEs.py:807-817):
        zero all wavenumbers |k| >= k_cut; returns (u_filtered, u_residual)."""
        k = jnp.asarray(self._k_grid())
        v = jnp.fft.fft(u)
        v_filt = jnp.where(jnp.abs(k) >= k_cut, 0.0, v)
        u_filt = jnp.real(jnp.fft.ifft(v_filt))
        return u_filt, u - u_filt

    def space_filter_int(self, u: jnp.ndarray, k_cut: float = 2.0,
                         N_int: int = 16):
        """Filter + spectral integer-downsample (reference PDEs.py:818-836).

        Keeps the modes |k| < k_cut (including the Nyquist mode, which the
        reference's k array labels k=0 — see _k_grid) in fft order, rescales
        them by N_int/nx, and inverse-transforms onto the coarse N_int-point
        grid x_int = 2*pi*L*[0..N_int)/N_int. The reference selects kept
        modes by sentinel (313e6) and assigns into a [.., N_int] buffer, so
        the kept-mode count MUST equal N_int — validated here explicitly.
        (The reference's N_int=10 default crashes at its own KS defaults;
        at nx=256 over L=22/2pi, k_cut=2 keeps 16 modes, hence our default.)

        u: [..., T, nx]. Returns (u_filt [..., T, nx], u_resid [..., T, nx],
        u_filt_int [..., T, N_int], x_int [N_int]).
        """
        k = self._k_grid()
        keep = np.abs(k) < k_cut
        n_keep = int(keep.sum())
        if n_keep != N_int:
            raise ValueError(
                f"k_cut={k_cut} keeps {n_keep} modes on nx={self.nx}, "
                f"L={self.L}; N_int must equal the kept-mode count "
                "(the reference writes the selection into a [.., N_int] "
                "buffer, PDEs.py:825,831)"
            )
        idx = jnp.asarray(np.nonzero(keep)[0])
        v = jnp.fft.fft(u)
        v_int = v[..., idx] * (N_int / self.nx)
        u_filt_int = jnp.real(jnp.fft.ifft(v_int))
        u_filt, u_resid = self.space_filter(u, k_cut)
        x_int = 2.0 * np.pi * self.L * np.arange(N_int) / N_int
        return u_filt, u_resid, u_filt_int, x_int
