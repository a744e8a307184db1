"""Long Expressive Memory (LEM) recurrent cell, Rusch et al. (ICLR 2022).

The reference binds an external hand-written CUDA kernel (``lem_cuda``,
/root/reference/experiments/models_gnn.py:283-361) — the one native kernel in
the whole system. On TPU the cell is a ``lax.scan`` over the (short, T=25)
temporal-bundling window; the two matmuls per step are MXU work and XLA fuses
the gating elementwise ops into them. Parameter layout matches the binding's
(models_gnn.py:310-313): a fused [3H, I+H] block computing both multi-scale
gates and the z-candidate from [x_t, y], plus a [H, I+H] block computing the
y-candidate from [x_t, z_new]; all parameters init U(-1/sqrt(H), +1/sqrt(H))
(models_gnn.py:318-321).

Cell equations (LEM paper, eq. 5):
    dt1 = dt * sigmoid(W_1 [x, y] + b_1)        (multi-scale gate for z)
    dt2 = dt * sigmoid(W_2 [x, y] + b_2)        (multi-scale gate for y)
    z'  = (1 - dt1) * z + dt1 * tanh(W_z [x, y] + b_z)
    y'  = (1 - dt2) * y + dt2 * tanh(W_y [x, z'] + b_y)

Fidelity is at the training-dynamics level (SURVEY.md §7 hard-part 2): the
CUDA kernel's exact gate-to-chunk assignment is symmetric at init.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from msmp_pde_tpu.models.common import torch_uniform_init


class LEMCell(nn.Module):
    hidden: int
    dt: float = 1.0

    @nn.compact
    def __call__(self, carry, x_t):
        """carry = (y, z) each [..., H]; x_t [..., I]."""
        y, z = carry
        H = self.hidden
        I = x_t.shape[-1]
        init = torch_uniform_init(H)  # stdv = 1/sqrt(nhid) for ALL params
        W = self.param("weights", init, (3 * H, I + H))
        Wz = self.param("weights_lin_z", init, (H, I + H))
        b = self.param("bias", init, (3 * H,))
        bz = self.param("bias_lin_z", init, (H,))

        xy = jnp.concatenate([x_t, y], axis=-1)
        g = xy @ W.T + b
        g1, g2, zc = jnp.split(g, 3, axis=-1)
        dt1 = self.dt * jax.nn.sigmoid(g1)
        dt2 = self.dt * jax.nn.sigmoid(g2)
        z_new = (1.0 - dt1) * z + dt1 * jnp.tanh(zc)
        xz = jnp.concatenate([x_t, z_new], axis=-1)
        y_new = (1.0 - dt2) * y + dt2 * jnp.tanh(xz @ Wz.T + bz)
        return (y_new, z_new), y_new


class LEM(nn.Module):
    """Scan the cell over the leading time axis; return the last y state
    (models_gnn.py:333-342). With ``stateful`` the carry is threaded by the
    caller (the Save* model variants keep LEM state across rollout windows,
    models_gnn.py:345-361)."""

    hidden: int
    dt: float = 1.0

    @nn.compact
    def __call__(self, inputs, initial_state=None):
        """inputs [T, N, I] -> (y_last [N, H], (y, z) final state)."""
        N = inputs.shape[1]
        H = self.hidden
        if initial_state is None:
            y0 = jnp.zeros((N, H), inputs.dtype)
            z0 = jnp.zeros((N, H), inputs.dtype)
            initial_state = (y0, z0)
        cell = nn.scan(
            LEMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )(hidden=H, dt=self.dt)
        state, _ = cell(initial_state, inputs)
        return state[0], state
