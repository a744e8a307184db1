"""Batched 1-D linear interpolation.

Capability parity with the TorchScript ``interp1d`` of
/root/reference/common/utils.py:16-98 (used by the unstructured-grid FNO
variant and the RPU evaluation flow): piecewise-linear interpolation with
edge clamping (no extrapolation when ``mask=True``), batched over leading
axes. The reference parallelizes per-row with torch.jit.fork; here the whole
batch is one vectorized searchsorted + gather under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def interp1d(x, y, target, mask: bool = True):
    """Interpolate y(x) at target points.

    Args:
        x: [nx] or [B, nx] sample locations (must be sorted ascending).
        y: [nx] or [B, nx] sample values.
        target: [nt] or [B, nt] query locations.
        mask: clamp queries outside [x[0], x[-1]] to the edge values.
    Returns:
        [B, nt] (or [nt] when all inputs are 1-D).
    """
    squeeze = x.ndim == 1 and y.ndim == 1 and target.ndim == 1
    x = jnp.atleast_2d(x)
    y = jnp.atleast_2d(y)
    target = jnp.atleast_2d(target)
    B = max(x.shape[0], y.shape[0], target.shape[0])
    x = jnp.broadcast_to(x, (B, x.shape[1]))
    y = jnp.broadcast_to(y, (B, y.shape[1]))
    target = jnp.broadcast_to(target, (B, target.shape[1]))

    def one(xr, yr, tr):
        m = (yr[1:] - yr[:-1]) / (xr[1:] - xr[:-1])
        b = yr[:-1] - m * xr[:-1]
        idx = jnp.clip(jnp.searchsorted(xr, tr, side="right") - 1, 0, len(m) - 1)
        out = m[idx] * tr + b[idx]
        if mask:
            out = jnp.where(tr <= xr[0], yr[0], out)
            out = jnp.where(tr >= xr[-1], yr[-1], out)
        return out

    out = jax.vmap(one)(x, y, target)
    return out[0] if squeeze else out


def interp_matrix(x, target, mask: bool = True):
    """Dense linear-interpolation operator W with ``W @ y == interp1d(x, y,
    target)`` for any values ``y`` sampled at locations ``x``.

    TPU-first formulation of the unstructured-grid re-sampling used by the
    FNO2dParamUn path (/root/reference/experiments/models_fno2D.py:299,332):
    the RPU grid is one static LCG grid shared by the whole dataset
    (generate_data.py:80-113), so the interpolation is a constant linear map.
    Materializing it as a dense [nt, nx] matrix turns the per-step
    gather (and its scatter-add transpose in the backward pass — a serial
    op on TPU) into a single MXU matmul.

    Args:
        x: [nx] sorted source locations.
        target: [nt] query locations.
        mask: clamp queries outside [x[0], x[-1]] to the edge values
            (matching ``interp1d(..., mask=True)``); otherwise extrapolate
            linearly with the edge segment.
    Returns:
        W: [nt, nx] such that ``W @ y`` linearly interpolates y onto target.
    """
    nx = x.shape[-1]
    idx = jnp.clip(jnp.searchsorted(x, target, side="right") - 1, 0, nx - 2)
    x0 = x[idx]
    x1 = x[idx + 1]
    w = (target - x0) / (x1 - x0)
    if mask:
        w = jnp.clip(w, 0.0, 1.0)
    dt = x.dtype
    lo = jax.nn.one_hot(idx, nx, dtype=dt)
    hi = jax.nn.one_hot(idx + 1, nx, dtype=dt)
    return lo * (1.0 - w[:, None]).astype(dt) + hi * w[:, None].astype(dt)
