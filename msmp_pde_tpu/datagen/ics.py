"""Initial-condition samplers and grids for dataset generation.

Distribution parity with /root/reference/generate/generate_data.py:
  * sum-of-sines parameter sampler (:136-152): A ~ U(-.5,.5),
    omega ~ 0.8*U(-.5,.5), phi ~ U(0, 2pi), l ~ randint[lmin, lmax)
  * sum-of-sines field (:115-133): u(x, t) = sum_k A_k sin(omega_k t
    + 2 pi l_k x / L + phi_k)
  * LCG pseudo-random unstructured grid (:80-113) — exact integer math,
    bit-compatible with the reference
  * wrapped-Gaussian (von Mises) ICs (:22-23, :764-798)
  * square / sinesum / gaussian / gaussian_triple families for the linear
    advection tasks (:737-798)

All samplers use explicit jax PRNG keys (the reference relies on the global
torch RNG); fields evaluate batched under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import i0e as _i0e


def sample_sine_params(key, batch: int, n_waves: int, lmin: int, lmax: int):
    """A, omega, phi, l with the reference's distributions ([B, 1, N] each).

    Note randint high is exclusive (torch.randint semantics): l in [lmin, lmax).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    shape = (batch, 1, n_waves)
    A = jax.random.uniform(k1, shape) - 0.5
    omega = 0.8 * (jax.random.uniform(k2, shape) - 0.5)
    phi = 2.0 * jnp.pi * jax.random.uniform(k3, shape)
    l = jax.random.randint(k4, shape, lmin, lmax)
    return A, omega, phi, l


def sum_of_sines(A, omega, phi, l, L):
    """Return f(x, t) -> [B, nx] field; x is [nx], t a scalar."""

    def fnc(x, t=0.0):
        # [B, 1, N] params against [nx, 1] points -> [B, nx, N] -> sum
        arg = omega * t + 2.0 * jnp.pi * l * x[:, None] / L + phi
        return jnp.sum(A * jnp.sin(arg), axis=-1)

    return fnc


def pseudo_random_grid(xmin: float, xmax: float, n: int) -> np.ndarray:
    """Deterministic LCG grid, bit-compatible with the reference (:80-113)."""
    c, p, a = 74, 2**16 + 1, 75
    ns = [c % p]  # (a*0 + c) % p
    for _ in range(n - 1):
        ns.append((a * ns[-1] + c) % p)
    ns = np.asarray(ns, dtype=float)
    ns = ns / ns.max()
    ns = ns * (xmax - xmin) + xmin
    ns = np.sort(ns)
    ns[0] = xmin
    ns[-1] = xmax
    return ns


def von_mises_pdf(x, kappa, loc=0.0):
    """Wrapped-Gaussian density exp(kappa cos(x-loc)) / (2 pi I0(kappa)).

    Computed in log space with the exponentially-scaled Bessel i0e
    (I0(k) = e^k i0e(k)): exp(k cos d - k) never overflows, so the f32 TPU
    datagen path stays finite for MSWG3's kappa in [50, 150] — the naive
    form hits exp(150)/I0(150) = inf/inf = NaN in f32 (reference evaluates
    the same formula in f64 only, generate_data.py:22-62)."""
    d = x - loc
    return jnp.exp(kappa * (jnp.cos(d) - 1.0)) / (2.0 * jnp.pi * _i0e(kappa))


# --- AD / RP initial-condition families ------------------------------------
# Each sampler returns (params_pytree, u0_batch_fn) where
# u0_batch_fn(pts [B, M]) -> [B, 2, M] evaluates the two IC components at
# (already characteristic-shifted) points; periodic wrapping inside.


def sample_square_ic(key, batch: int, nx: int, L: float):
    """Two random breakpoints on the grid; u1 = indicator, u2 = 0 (:737-750)."""
    bounds = jax.random.randint(key, (batch, 2, 2), 0, nx).astype(jnp.float64)
    bounds = L * bounds / nx
    lo = jnp.min(bounds, axis=1)  # [B, 2]
    hi = jnp.max(bounds, axis=1)

    def u0_fn(pts):
        p = jnp.remainder(pts, L)
        u1 = jnp.where(
            jnp.logical_and(p > lo[:, 0:1], jnp.abs(p) < hi[:, 0:1]), 1.0, 0.0
        )
        return jnp.stack([u1, jnp.zeros_like(u1)], axis=1)

    return (lo, hi), u0_fn


def sample_sinesum_ic(key, batch: int, L: float, n_waves=5, lmin=1, lmax=3):
    """Two independent sum-of-sines components per sample (:752-762):
    the reference draws 2*batch parameter rows and pairs them up."""
    A, omega, phi, l = sample_sine_params(key, 2 * batch, n_waves, lmin, lmax)

    def u0_fn(pts):
        p = jnp.remainder(pts, L)  # [B, M]
        p2 = jnp.repeat(p, 2, axis=0)  # [2B, M] rows (2i, 2i+1)
        arg = omega * 0.0 + 2.0 * jnp.pi * l * p2[:, :, None] / L + phi
        vals = jnp.sum(A * jnp.sin(arg), axis=-1)  # [2B, M]
        return vals.reshape(pts.shape[0], 2, pts.shape[1])

    return (A, omega, phi, l), u0_fn


def sample_gaussian_ic(key, batch: int, L: float):
    """Single wrapped Gaussian at loc=pi, kappa ~ U(1e-5, 10); u2 = 1
    (:764-778)."""
    kappa = jax.random.uniform(key, (batch, 1), minval=1e-5, maxval=10.0)

    def u0_fn(pts):
        p = jnp.remainder(pts, L)
        u1 = von_mises_pdf(p, kappa, loc=jnp.pi)
        return jnp.stack([u1, jnp.ones_like(u1)], axis=1)

    return kappa, u0_fn


def sample_gaussian_triple_ic(key, batch: int, L: float):
    """Three wrapped Gaussians at pi/2, pi, 3pi/2 with random scales in
    U(0,1) and sharpness U(50, 150); u2 = 1 (:780-798)."""
    k1, k2 = jax.random.split(key)
    scales = jax.random.uniform(k1, (batch, 3, 1))
    sharps = jax.random.uniform(k2, (batch, 3, 1), minval=50.0, maxval=150.0)
    locs = jnp.asarray([jnp.pi / 2.0, jnp.pi, 3.0 * jnp.pi / 2.0])[None, :, None]

    def u0_fn(pts):
        p = jnp.remainder(pts, L)  # [B, M]
        comps = von_mises_pdf(p[:, None, :], sharps, loc=locs)  # [B, 3, M]
        u1 = jnp.sum(scales * comps, axis=1)
        return jnp.stack([u1, jnp.ones_like(u1)], axis=1)

    return (scales, sharps), u0_fn
