"""Fourier Neural Operator baselines (1-D and 2-component-system variants).

Capability parity with /root/reference/experiments/models_fno.py and
models_fno2D.py: 4 spectral-conv + 4 pointwise-conv layers, GELU, 16 modes,
grid coordinate appended to the input channels; *Param variants add
normalized equation parameters; VNO1d uses a nonequispaced Vandermonde
transform; FNO2dParamUn interpolates unstructured data onto a uniform grid
before the spectral core and back after.

The spectral conv lowers to XLA's TPU rfft/irfft plus a complex einsum on
the first ``modes`` coefficients (models_fno.py:93-124). The reference's
VNO path is broken as-is (vft1d references self.positions before assignment,
models_fno.py:240) — fixed here: the Vandermonde matrix is built from the
positions argument.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from msmp_pde_tpu.models.common import TorchDense
from msmp_pde_tpu.ops.interp import interp_matrix


class SpectralConv1d(nn.Module):
    """rfft -> truncate to ``modes`` -> complex channel mix -> irfft."""

    features: int
    modes: int

    @nn.compact
    def __call__(self, x):
        # x: [B, C, nx]
        c_in = x.shape[1]
        scale = 1.0 / (c_in * self.features)

        def cinit(key, shape, dtype=jnp.float32):
            # torch.rand on complex dtypes: U(0,1) real and imag parts
            k1, k2 = jax.random.split(key)
            return scale * jnp.stack(
                [jax.random.uniform(k1, shape, dtype),
                 jax.random.uniform(k2, shape, dtype)],
                axis=-1,
            )

        w = self.param("weights", cinit, (c_in, self.features, self.modes))
        wc = jax.lax.complex(w[..., 0], w[..., 1])

        x_ft = jnp.fft.rfft(x)  # [B, C, nx//2+1]
        out_modes = jnp.einsum("bix,iox->box", x_ft[:, :, : self.modes], wc)
        n_freq = x.shape[-1] // 2 + 1
        pad = n_freq - self.modes
        out_ft = jnp.pad(out_modes, ((0, 0), (0, 0), (0, pad)))
        return jnp.fft.irfft(out_ft, n=x.shape[-1]).astype(x.dtype)


class _FNOCore(nn.Module):
    """Shared lift -> 4x(spectral + pointwise) -> project stack."""

    width: int
    modes: int
    out_features: int

    @nn.compact
    def __call__(self, x):
        # x: [B, nx, C_in]
        x = TorchDense(self.width, name="fc0")(x)
        x = jnp.transpose(x, (0, 2, 1))  # [B, W, nx]
        for i in range(4):
            x1 = SpectralConv1d(self.width, self.modes, name=f"conv{i}")(x)
            # pointwise Conv1d(k=1) == Dense over the channel axis
            x2 = jnp.transpose(
                TorchDense(self.width, name=f"w{i}")(jnp.transpose(x, (0, 2, 1))),
                (0, 2, 1),
            )
            x = x1 + x2
            if i < 3:
                x = jax.nn.gelu(x, approximate=False)
        x = jnp.transpose(x, (0, 2, 1))
        x = TorchDense(128, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = TorchDense(self.out_features, name="fc2")(x)
        return jnp.transpose(x, (0, 2, 1))  # [B, out, nx]


def _grid_channel(B, nx, domain, dtype):
    g = jnp.linspace(domain[0], domain[1], nx, dtype=dtype)
    return jnp.broadcast_to(g[None, :, None], (B, nx, 1))


class FNO1d(nn.Module):
    """Input [B, tw, nx] -> output [B, tw, nx] (no temporal residual;
    models_fno.py:10-87). ``eq_var_names`` switches on the Param variant."""

    tw: int
    modes: int = 16
    width: int = 64
    domain: Sequence[float] = (0.0, 16.0)
    eq_var_names: Sequence[str] = ()

    @nn.compact
    def __call__(self, u, var_cols: Optional[jnp.ndarray] = None):
        B, tw, nx = u.shape
        x = jnp.transpose(u, (0, 2, 1))  # [B, nx, tw]
        if self.eq_var_names:
            # normalized eq params appended per node (models_fno.py:168-187)
            v = jnp.broadcast_to(
                var_cols[:, None, :], (B, nx, var_cols.shape[-1])
            )
            x = jnp.concatenate([x, v], axis=-1)
        x = jnp.concatenate([x, _grid_channel(B, nx, self.domain, u.dtype)], -1)
        return _FNOCore(self.width, self.modes, self.tw)(x)


class FNO2d(nn.Module):
    """2-component system FNO: input/output [B, tw, 2, nx]
    (models_fno2D.py:7-87; channel layout is flatten(1,2), i.e. t-major)."""

    tw: int
    modes: int = 16
    width: int = 128
    domain: Sequence[float] = (0.0, 16.0)
    eq_var_names: Sequence[str] = ()
    unstructured: bool = False  # FNO2dParamUn (models_fno2D.py:220-343)

    @nn.compact
    def __call__(self, u, var_cols=None, x_coords=None):
        B, tw, d, nx = u.shape
        if self.unstructured:
            # Interpolate each channel onto a uniform grid before the core.
            # The grid is static for the whole run, so the resampling is a
            # constant [nx, nx] linear operator — one MXU matmul instead of
            # per-channel gathers (whose backward is a serial scatter-add
            # on TPU); see ops/interp.py::interp_matrix.
            uniform = jnp.linspace(self.domain[0], self.domain[1], nx,
                                   dtype=u.dtype)
            w_in = interp_matrix(x_coords, uniform)
            u = jnp.einsum("ij,btdj->btdi", w_in, u)
        x = u.reshape(B, tw * d, nx)
        x = jnp.transpose(x, (0, 2, 1))  # [B, nx, 2tw]
        if self.eq_var_names:
            v = jnp.broadcast_to(var_cols[:, None, :], (B, nx, var_cols.shape[-1]))
            x = jnp.concatenate([x, v], axis=-1)
        x = jnp.concatenate([x, _grid_channel(B, nx, self.domain, u.dtype)], -1)
        out = _FNOCore(self.width, self.modes, 2 * self.tw)(x)  # [B, 2tw, nx]
        out = out.reshape(B, tw, d, nx)
        if self.unstructured:
            # uniform -> unstructured, the transpose resampling direction
            w_out = interp_matrix(uniform, x_coords)
            out = jnp.einsum("ij,btdj->btdi", w_out, out)
        return out


class VNO1d(nn.Module):
    """Nonequispaced FNO: Vandermonde forward/inverse transforms built from
    the grid positions (models_fno.py:229-361, with the self.positions bug
    fixed — the matrix is built from the ``positions`` argument)."""

    tw: int
    positions: np.ndarray  # [nx] static grid
    modes: int = 16
    width: int = 64
    domain: Sequence[float] = (0.0, 16.0)

    @nn.compact
    def __call__(self, u):
        B, tw, nx = u.shape
        pos = np.asarray(self.positions, np.float64)
        # V = exp(-i k x)/sqrt(nx). The transforms below are the exact
        # real/imag decomposition of the reference's complex matmuls
        # (models_fno.py:229-249): complex64 matmul is UNIMPLEMENTED on
        # this TPU backend — same limitation the KS solver works around
        # with its real-DFT path (equations/ks.py).
        theta = np.outer(np.arange(self.modes), pos)  # [modes, nx]
        c = jnp.asarray((np.cos(theta) / np.sqrt(nx)).T, jnp.float32)
        s = jnp.asarray((np.sin(theta) / np.sqrt(nx)).T, jnp.float32)
        # forward: x_ft = x @ V.T -> Re = x@c, Im = -(x@s)
        # inverse: real(m @ conj(V)) = Re(m)@c.T - Im(m)@s.T

        x = jnp.transpose(u, (0, 2, 1))
        x = jnp.concatenate([x, _grid_channel(B, nx, self.domain, u.dtype)], -1)
        x = TorchDense(self.width, name="fc0")(x)
        x = jnp.transpose(x, (0, 2, 1))  # [B, W, nx]

        for i in range(4):
            scale = 1.0 / (self.width * self.width)

            def cinit(key, shape, dtype=jnp.float32):
                k1, k2 = jax.random.split(key)
                return scale * jnp.stack(
                    [jax.random.uniform(k1, shape, dtype),
                     jax.random.uniform(k2, shape, dtype)], -1,
                )

            w = self.param(f"spec{i}", cinit, (self.width, self.width, self.modes))
            wr, wi = w[..., 0], w[..., 1]
            a = x @ c  # Re(x_ft)  [B, W, modes]
            b = -(x @ s)  # Im(x_ft)
            mr = (jnp.einsum("bix,iox->box", a, wr)
                  - jnp.einsum("bix,iox->box", b, wi))
            mi = (jnp.einsum("bix,iox->box", a, wi)
                  + jnp.einsum("bix,iox->box", b, wr))
            x1 = ((mr @ c.T) - (mi @ s.T)).astype(x.dtype)
            x2 = jnp.transpose(
                TorchDense(self.width, name=f"w{i}")(jnp.transpose(x, (0, 2, 1))),
                (0, 2, 1),
            )
            x = x1 + x2
            if i < 3:
                x = jax.nn.gelu(x, approximate=False)

        x = jnp.transpose(x, (0, 2, 1))
        x = TorchDense(128, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = TorchDense(self.tw, name="fc2")(x)
        return jnp.transpose(x, (0, 2, 1))
