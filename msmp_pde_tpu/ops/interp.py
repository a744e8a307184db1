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
