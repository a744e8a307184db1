"""Residual CNN baselines (BaseCNN / BaseCNN2D).

Capability parity with /root/reference/experiments/models_cnn.py and
models_cnn2D.py: 8 circular-padded 1-D convolutions with growing kernels
(3,5,5,5,7,7,7,9), ELU activations, skip connections from layer 2 on,
xavier-uniform kernels. The temporal dimension is stacked in channels
(tw, or 2*tw for the 2-component system).

Output composition quirks preserved:
  * 1D (models_cnn.py:81-84): out = u_last + cumsum(dt) * diff.
  * 2D (models_cnn2D.py:81-85): out = u + cumsum(dt) * diff — residual from
    the whole window, not the last step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from msmp_pde_tpu.models.common import TorchConv1d


class _CircularConv(nn.Module):
    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, x):
        # circular padding then valid conv == torch padding_mode='circular'
        p = self.kernel_size // 2
        xp = jnp.concatenate([x[..., -p:], x, x[..., :p]], axis=-1)
        return TorchConv1d(
            features=self.features, kernel_size=self.kernel_size, xavier=True
        )(xp)


class BaseCNN(nn.Module):
    """1D baseline; input/output [B, tw, nx]."""

    tw: int
    dt: float
    hidden_channels: int = 40
    n_components: int = 1  # 2 for BaseCNN2D (input [B, tw, 2, nx])

    @nn.compact
    def __call__(self, u):
        d = self.n_components
        if d == 1:
            x_in = u
        else:
            # [B, tw, 2, nx] -> [B, 2*tw, nx] (flatten(1,2))
            B, tw, _, nx = u.shape
            x_in = u.reshape(B, tw * 2, nx)

        c_out = d * self.tw
        hidden = self.hidden_channels if d == 1 else 128
        x = jax.nn.elu(_CircularConv(hidden, 3)(x_in))
        x = x + jax.nn.elu(_CircularConv(hidden, 5)(x))
        x = x + jax.nn.elu(_CircularConv(hidden, 5)(x))
        x = x + jax.nn.elu(_CircularConv(hidden, 5)(x))
        x = x + jax.nn.elu(_CircularConv(hidden, 7)(x))
        x = x + jax.nn.elu(_CircularConv(hidden, 7)(x))
        x = x + jax.nn.elu(_CircularConv(hidden, 7)(x))
        diff = _CircularConv(c_out, 9)(x)

        dt_cum = jnp.cumsum(jnp.full((self.tw,), self.dt, u.dtype))
        if d == 1:
            u_last = u[:, -1:, :]  # [B, 1, nx]
            return u_last + dt_cum[None, :, None] * diff
        diff = diff.reshape(diff.shape[0], self.tw, 2, diff.shape[-1])
        return u + dt_cum[None, :, None, None] * diff
