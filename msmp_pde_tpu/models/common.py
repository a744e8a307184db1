"""Shared model building blocks.

Initialization parity: torch ``nn.Linear``/``nn.Conv1d`` default to
U(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both kernel and bias (kaiming_uniform
with a=sqrt(5)); the reference models rely on those defaults everywhere
except BaseCNN's xavier_uniform conv kernels. We reproduce both so training
dynamics match.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import flax.linen as nn


def torch_uniform_init(fan_in: int):
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """Dense layer with torch nn.Linear default initialization."""

    features: int

    @nn.compact
    def __call__(self, x, params_only=False):
        fan_in = x.shape[-1]
        init = torch_uniform_init(fan_in)
        w = self.param("kernel", init, (fan_in, self.features))
        b = self.param("bias", init, (self.features,))
        if params_only:
            # raw params for the fused Pallas layer (ops/mp_pallas.py)
            return w, b
        return x @ w + b


def swish(x, beta: float = 1.0):
    """x * sigmoid(beta x) (reference models_gnn.py:12-21)."""
    return x * jax.nn.sigmoid(beta * x)


class TorchConv1d(nn.Module):
    """1-D convolution over the last axis with torch-default init.

    Input [..., C_in, W] -> [..., C_out, W_out]; valid padding, given stride
    (the decoder CNNs of the reference use no padding).
    """

    features: int
    kernel_size: int
    stride: int = 1
    xavier: bool = False

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-2]
        fan_in = c_in * self.kernel_size
        if self.xavier:
            fan_out = self.features * self.kernel_size
            bound = (6.0 / (fan_in + fan_out)) ** 0.5

            def kinit(key, shape, dtype=jnp.float32):
                return jax.random.uniform(key, shape, dtype, -bound, bound)

        else:
            kinit = torch_uniform_init(fan_in)
        w = self.param(
            "kernel", kinit, (self.features, c_in, self.kernel_size)
        )
        b = self.param("bias", torch_uniform_init(fan_in), (self.features,))

        lead = x.shape[:-2]
        x2 = x.reshape((-1,) + x.shape[-2:])  # [N, C_in, W]
        out = jax.lax.conv_general_dilated(
            x2,
            w,
            window_strides=(self.stride,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        out = out + b[None, :, None]
        return out.reshape(lead + out.shape[-2:])


def instance_norm(h: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Per-graph (batch element) per-feature normalization over nodes,
    matching PyG InstanceNorm with affine=False (models_gnn.py:59,129).

    h: [B, nx, F].
    """
    mean = jnp.mean(h, axis=1, keepdims=True)
    var = jnp.var(h, axis=1, keepdims=True)
    return (h - mean) * jax.lax.rsqrt(var + eps)


def temporal_residual_decode(h, u_window, dt: float, tw: int,
                             decoder: Callable, n_components: int = 1):
    """Formula-10 decoder (models_gnn.py:274-280): a per-node 1D CNN maps the
    hidden state to tw "time derivative" values; the output is
    u_last + cumsum(dt) * diff, per component for systems."""
    B, nx, H = h.shape
    diff = decoder(h[..., None, :])  # [B, nx, C, W] with C=1 -> components
    dt_cum = jnp.cumsum(jnp.full((tw,), dt, h.dtype))
    if n_components == 1:
        diff = diff[..., 0, :]  # [B, nx, tw]
        u_last = u_window[..., -1:]
        return u_last + dt_cum * diff
    # systems: decoder emits [B, nx, d, tw]; component-major output layout
    w = u_window.reshape(B, nx, n_components, tw)
    out = w[..., -1:] + dt_cum * diff
    return out.reshape(B, nx, n_components * tw)


# Decoder CNN configs per time window (models_gnn.py:210-224): maps the
# hidden vector (treated as a length-H signal) to exactly tw outputs.
# The second conv's kernel is derived from the first conv's output length
# (k2 = L1 - tw + 1, stride 1) so the decoder works at any hidden width;
# at the reference hidden=128 this reproduces the reference's k2 exactly
# (tw=20 -> 10, tw=25 -> 14, tw=50 -> 10).
DECODER_CONV = {
    20: (8, 15, 4),
    25: (8, 16, 3),
    50: (8, 12, 2),
}


class WindowDecoder(nn.Module):
    """The reference's two-conv decoder; out_channels generalizes to
    2-component systems (models_gnn2D.py:79-88) and the conv arithmetic
    to any hidden width (the reference hardcodes hidden=128)."""

    tw: int
    out_channels: int = 1

    @nn.compact
    def __call__(self, x):
        c1, k1, s1 = DECODER_CONV[self.tw]
        H = x.shape[-1]
        L1 = (H - k1) // s1 + 1
        k2 = L1 - self.tw + 1
        if k2 < 1:
            raise ValueError(
                f"hidden width {H} too small for the tw={self.tw} decoder "
                f"(first conv leaves {L1} < tw positions); need H >= "
                f"{k1 + s1 * (self.tw - 1)}"
            )
        x = TorchConv1d(features=c1, kernel_size=k1, stride=s1)(x)
        x = swish(x)
        x = TorchConv1d(features=self.out_channels, kernel_size=k2, stride=1)(x)
        return x


def assemble_variables(t, eq_vars: dict, norms: dict, tmax: float):
    """Build the [B, V] model variable vector: normalized time first, then
    each equation parameter normalized by its task constant, in the
    reference's fixed key order (models_gnn.py:250-266). ``beta`` arrives
    already negated (utils.py:392)."""
    cols = [t / tmax]
    for name in ("alpha", "beta", "gamma", "bc_left", "bc_right", "c", "D",
                 "r", "a", "b"):
        if name in norms:
            v = eq_vars[name]
            if name == "beta":
                v = -v
            if name not in ("bc_left", "bc_right"):
                v = v / norms[name]
            cols.append(v)
    return jnp.stack(cols, axis=-1)
