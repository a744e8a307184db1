"""Vectorized finite-difference and WENO5 spatial operators.

TPU-native re-implementation of the reference's conv1d-based stencil ops
(/root/reference/common/derivatives.py:43-178). Instead of convolution calls,
each k-tap correlation is expressed as k shifted slices fused by XLA into a
single vectorized loop — there is no benefit in routing 5-tap stencils through
the MXU, the op is bandwidth-bound and the VPU handles it at full rate.

All operators act on the last axis and broadcast over arbitrary leading
batch axes. Shapes are static; everything is jit/vmap/grad-safe.

Grid convention (inherited from the reference data layout): ``nx`` points
spanning [0, L] with the two endpoints identified, i.e. u[0] and u[nx-1] are
the same physical point. Hence the periodic pad uses u[-3:-1] on the left and
u[1:3] on the right (reference: common/derivatives.py:32-41,100-107).
"""
from __future__ import annotations

import jax.numpy as jnp

from msmp_pde_tpu.ops import stencils as st


def periodic_pad(u: jnp.ndarray, width: int = 2) -> jnp.ndarray:
    """Pad the last axis periodically for a duplicated-endpoint grid."""
    left = u[..., -width - 1 : -1]
    right = u[..., 1 : width + 1]
    return jnp.concatenate([left, u, right], axis=-1)


def correlate1d(padded: jnp.ndarray, taps) -> jnp.ndarray:
    """Valid cross-correlation of the last axis with a 1-D tap vector.

    out[..., i] = sum_k taps[k] * padded[..., i + k]
    """
    taps = jnp.asarray(taps, dtype=padded.dtype)
    k = taps.shape[0]
    n_out = padded.shape[-1] - k + 1
    out = taps[0] * padded[..., 0:n_out]
    for j in range(1, k):
        out = out + taps[j] * padded[..., j : j + n_out]
    return out


# --- FDM derivatives (input must already be periodic_pad'ed by 2). ---------

def fdm_first_derivative(u_padded: jnp.ndarray, dx) -> jnp.ndarray:
    return correlate1d(u_padded, st.FDM_D1) / dx


def fdm_second_derivative(u_padded: jnp.ndarray, dx) -> jnp.ndarray:
    return correlate1d(u_padded, st.FDM_D2) / dx**2


def fdm_third_derivative(u_padded: jnp.ndarray, dx) -> jnp.ndarray:
    return correlate1d(u_padded, st.FDM_D3) / dx**3


def fdm_fourth_derivative(u_padded: jnp.ndarray, dx) -> jnp.ndarray:
    return correlate1d(u_padded, st.FDM_D4) / dx**4


# --- WENO5 -----------------------------------------------------------------

def weno_pad(u: jnp.ndarray, order: int = 3) -> jnp.ndarray:
    """Periodic pad by (order - 1) on each side (reference :100-107)."""
    return periodic_pad(u, width=order - 1)


def weno_reconstruct(u_padded: jnp.ndarray) -> jnp.ndarray:
    """WENO5 reconstruction core (reference: common/derivatives.py:163-178).

    Smoothness-weighted combination of 3 candidate-stencil reconstructions.
    Input has a periodic pad of 2 on each side; output has the unpadded size.
    """
    dtype = u_padded.dtype
    betaA = jnp.asarray(st.WENO5_BETA_A, dtype)
    betaB = jnp.asarray(st.WENO5_BETA_B, dtype)
    gamma = jnp.asarray(st.WENO5_GAMMA, dtype)
    stenc = jnp.asarray(st.WENO5_STENCILS, dtype)

    # [..., 3, nx] candidate quantities
    b1 = jnp.stack([correlate1d(u_padded, betaA[r]) for r in range(3)], axis=-2)
    b2 = jnp.stack([correlate1d(u_padded, betaB[r]) for r in range(3)], axis=-2)
    beta = b1 * b1 + b2 * b2

    w_tilde = gamma[:, None] / (st.WENO5_EPS + beta) ** 2
    w = w_tilde / jnp.sum(w_tilde, axis=-2, keepdims=True)

    cand = jnp.stack([correlate1d(u_padded, stenc[r]) for r in range(3)], axis=-2)
    return jnp.sum(w * cand, axis=-2)


def weno_godunov(u_padded: jnp.ndarray, dx, flux_fn) -> jnp.ndarray:
    """Godunov flux divergence (reference: common/derivatives.py:109-133)."""
    # Right-biased reconstruction: flip, reconstruct, flip back, shift by -1.
    rec_plus = jnp.flip(weno_reconstruct(jnp.flip(u_padded, -1)), -1)
    rec_plus = jnp.roll(rec_plus, -1, axis=-1)
    # Left-biased reconstruction.
    rec_minus = weno_reconstruct(u_padded)

    flux_plus = flux_fn(rec_plus)
    flux_minus = flux_fn(rec_minus)
    flux_out = jnp.where(
        rec_plus >= rec_minus,
        jnp.minimum(flux_minus, flux_plus),
        jnp.maximum(flux_minus, flux_plus),
    )
    flux_in = jnp.roll(flux_out, 1, axis=-1)
    return (flux_out - flux_in) / dx


def weno_laxfriedrichs(u_padded: jnp.ndarray, dx, flux_fn) -> jnp.ndarray:
    """Lax-Friedrichs flux divergence (reference: common/derivatives.py:136-160).

    The reference computes alpha = max(u) without keepdims, which produces a
    shape-broadcast artifact in torch; we use the intended per-sample max over
    the spatial axis (documented divergence — the reference never exercises
    this path: flux_splitting defaults to 'godunov').
    """
    f = flux_fn(u_padded)
    alpha = jnp.max(u_padded, axis=-1, keepdims=True)
    f_plus = f + alpha * u_padded
    f_minus = f - alpha * u_padded

    flux_plus = weno_reconstruct(f_plus) / 2.0
    flux_minus = jnp.flip(weno_reconstruct(jnp.flip(f_minus, -1)), -1) / 2.0
    flux_minus = jnp.roll(flux_minus, -1, axis=-1)

    flux_out = flux_plus + flux_minus
    flux_in = jnp.roll(flux_out, 1, axis=-1)
    return (flux_out - flux_in) / dx
