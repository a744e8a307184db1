"""Message-passing PDE solvers (the MP-PDE / MSMP-PDE family).

Re-designs the reference GNN family (/root/reference/experiments/
models_gnn.py, models_gnn2D.py — 27 registry variants) around a TPU-native
message-passing primitive:

  * graphs are dense per-node neighbor lists [nx, K] + mask (data/graph.py),
    static per task, so message passing is a gather over the neighbor axis —
    NO scatter, NO dynamic shapes, and the batch stays a dense [B, nx, ...]
    tensor that XLA tiles onto the MXU;

  * the first message MLP layer is *factorized*: a Dense layer applied to
    the concatenation [h_i, h_j, u_i-u_j, x_i-x_j, vars_i] splits exactly
    into per-node i-side and j-side terms (the difference features are
    linear), so we compute two [B, nx, H] matmuls and gather+add, instead of
    one [B, nx, K, .] matmul — identical function and parameters, ~K/2 x
    fewer encoder FLOPs (message semantics: models_gnn.py:69-75);

  * aggregation is a masked mean over the K axis (PyG aggr='mean',
    models_gnn.py:42) followed by the update MLP with optional residual
    (models_gnn.py:77-86) and per-graph InstanceNorm (models_gnn.py:59,66).

One configurable module covers every variant: temporal encoder
(MLP / LEM / LSTM / stateful LEM), processor gating (none / sigmoid-gated
dual stack / gradient gate), decoder (temporal-residual CNN / GLU split /
twin scale-diff composition), and 1- or 2-component systems.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from msmp_pde_tpu.models.common import (
    TorchDense,
    TorchConv1d,
    WindowDecoder,
    instance_norm,
    swish,
    torch_uniform_init,
)
from msmp_pde_tpu.models.lem import LEM


class FactorizedEdgeDense(nn.Module):
    """Dense on [h_i, h_j, u_i - u_j, px_i - px_j, vars_i], factorized into
    i-side + j-side node terms. Parameters and function are identical to the
    concatenated Dense (torch init over total fan-in)."""

    hidden: int

    @nn.compact
    def __call__(self, h, u, px, variables, idx, params_only=False):
        B, nx, H = h.shape
        dtw = u.shape[-1]
        V = variables.shape[-1]
        fan_in = 2 * H + dtw + 1 + V
        init = torch_uniform_init(fan_in)
        w_hi = self.param("w_hi", init, (H, self.hidden))
        w_hj = self.param("w_hj", init, (H, self.hidden))
        w_du = self.param("w_du", init, (dtw, self.hidden))
        w_dx = self.param("w_dx", init, (1, self.hidden))
        w_v = self.param("w_var", init, (V, self.hidden))
        b = self.param("bias", init, (self.hidden,))
        if params_only:
            # the fused Pallas layer consumes the raw params (ops/mp_pallas.py)
            return w_hi, w_hj, w_du, w_dx, w_v, b

        px_f = px[..., None]  # [B, nx, 1]
        side_i = h @ w_hi + u @ w_du + px_f @ w_dx + variables @ w_v + b
        side_j = h @ w_hj - u @ w_du - px_f @ w_dx
        # gather j-side at neighbors: [B, nx, K, hidden]
        return side_i[:, :, None, :] + side_j[:, idx]


class GNNLayer(nn.Module):
    """One message-passing layer (GNN_Layer / GNN_LayerLin,
    models_gnn.py:23-149): final_act + residual = GNN_Layer, neither =
    GNN_LayerLin."""

    hidden: int
    final_act: bool
    residual: bool

    @nn.compact
    def __call__(self, h, u, px, variables, idx, mask, ega=None,
                 weights_only=False):
        fe = FactorizedEdgeDense(hidden=self.hidden)
        if ega is not None or weights_only:
            # fused Pallas path: one TPU kernel for the whole layer,
            # same params / same math as the XLA path below
            # (exact-parity test: tests/test_mp_pallas.py).
            # weights_only returns the 12-tuple for the fused PAIR kernel
            # (the caller combines gate+layer in one pallas_call).
            from msmp_pde_tpu.ops.mp_pallas import fused_mp_layer

            H, V = self.hidden, variables.shape[-1]
            w_hi, w_hj, w_du, w_dx, w_v, b1 = fe(
                h, u, px, variables, idx, params_only=True
            )
            w2, b2 = TorchDense(self.hidden)(
                jnp.zeros((1, H), h.dtype), params_only=True
            )
            w3, b3 = TorchDense(self.hidden)(
                jnp.zeros((1, 2 * H + V), h.dtype), params_only=True
            )
            w4, b4 = TorchDense(self.hidden)(
                jnp.zeros((1, H), h.dtype), params_only=True
            )
            if weights_only:
                return (w_hi, w_hj, w_du, w_dx, w_v, b1, w2, b2, w3, b3,
                        w4, b4)
            ega_mats, interpret, mm_dtype = ega
            return fused_mp_layer(
                h, u, px[..., None], variables, ega_mats,
                (w_hi, w_hj, w_du, w_dx, w_v, b1, w2, b2, w3, b3, w4, b4),
                final_act=self.final_act, residual=self.residual,
                interpret=interpret, mm_dtype=mm_dtype,
            )

        m = fe(h, u, px, variables, idx)
        m = swish(m)
        m = swish(TorchDense(self.hidden)(m))  # message_net_2, per edge
        deg = jnp.maximum(mask.sum(-1), 1.0)  # [nx, K] -> [nx]
        agg = (m * mask[None, :, :, None]).sum(2) / deg[None, :, None]

        upd_in = jnp.concatenate([h, agg, variables], axis=-1)
        upd = swish(TorchDense(self.hidden)(upd_in))
        upd = TorchDense(self.hidden)(upd)
        if self.final_act:
            upd = swish(upd)
        out = h + upd if self.residual else upd
        return instance_norm(out)


class GATLayer(nn.Module):
    """Single-relation graph attention with edge features — the neighbor-
    list equivalent of PyG ``RGATConv(hidden, hidden, edge_dim=2*tw+1)`` in
    its default additive-self-attention mode with heads=1, dim=1, as used by
    the reference's G_PDE_Solver2DLEMLinGated (models_gnn2D.py:1091-1099;
    edge_attr = [u_i - u_j, x_i - x_j], :1175):

      alpha_ij = softmax_j LeakyReLU_{0.2}(q.Wh_i + k.Wh_j + w_e.e_ij)
      h_i'     = sum_j alpha_ij (W h_j) + bias

    (edge features modulate the attention logits only — not the message
    value — matching RGATConv; masked softmax over the padded K axis.)
    Documented divergences from PyG (no oracle available in this container:
    torch_geometric is not installed): torch-default U(-1/sqrt(fan)) init
    instead of PyG's glorot/zeros, and the edge logit is inside the
    LeakyReLU. Behavioral tests: tests/test_models.py::TestGATBehavior.
    """

    hidden: int

    @nn.compact
    def __call__(self, h, u, px, variables, idx, mask):
        B, nx, H = h.shape
        wh = TorchDense(self.hidden, name="lin")(h)  # [B, nx, Hd]
        e = jnp.concatenate(
            [u[:, :, None, :] - u[:, idx], (px[..., None])[:, :, None, :] - px[:, idx][..., None]],
            axis=-1,
        )  # [B, nx, K, dtw+1]
        init = torch_uniform_init(self.hidden)
        q = self.param("att_q", init, (self.hidden,))
        k = self.param("att_k", init, (self.hidden,))
        e_logit = TorchDense(1, name="lin_edge")(e)[..., 0]  # [B, nx, K]
        logits = (
            (wh * q).sum(-1)[:, :, None]
            + (wh[:, idx] * k).sum(-1)
            + e_logit
        )  # [B, nx, K]
        logits = jax.nn.leaky_relu(logits, 0.2)
        logits = jnp.where(mask[None] > 0, logits, -1e30)
        alpha = jax.nn.softmax(logits, axis=-1)
        alpha = alpha * (mask[None] > 0)  # isolated nodes aggregate nothing
        bias = self.param(
            "bias", lambda key, shape: jnp.zeros(shape, jnp.float32),
            (self.hidden,),
        )
        return jnp.einsum("bnk,bnkh->bnh", alpha, wh[:, idx]) + bias


def grad_gate(g, idx, mask):
    """Gradient-based gate (models_gnn2D.py:599-601):
    tau_i = tanh(mean_j |g_i - g_j|^2) over the in-edges of node i
    (scatter_mean over edges in the reference; a masked neighbor-mean
    here). g [B, nx, H] -> tau [B, nx, H]."""
    g_j = g[:, idx]  # [B, nx, K, H]
    d2 = (g[:, :, None, :] - g_j) ** 2
    deg = jnp.maximum(mask.sum(-1), 1.0)
    return jnp.tanh((d2 * mask[None, :, :, None]).sum(2) / deg[None, :, None])


def _auto_remat_policy(mp_remat, ega, mp_impl, layer_type, mp_inference):
    """Whether the MP layers run through nn.remat (round-5 auto policy).

    Explicit mp_remat always wins. Otherwise, when mp_impl="auto" on TPU
    lands on the XLA layer path because the Pallas working set exceeds
    VMEM (ega is None at hidden>=256 for E1-like shapes), the per-edge
    stash traffic is exactly what the Pallas kernels would have removed —
    recomputing it is measured faster (17.99 vs 28.94 ms/step at
    hidden=256, artifacts/bench_mfu_remat.log) and unlocks hidden=512
    (the plain backward OOMs the 16 GB v5e). Forced mp_impl="xla" opts
    out; inference never lowers a backward, so the policy stays off there.
    """
    if mp_remat:
        return True
    return (ega is None and mp_impl == "auto" and layer_type == "mp"
            and not mp_inference and jax.default_backend() == "tpu")


class MPSolver(nn.Module):
    """Configurable encode-process-decode MP-PDE solver.

    Registry mapping (experiments/train.py:24-194):
      MP-PDE          encoder=mlp,  gate=none,    decoder=cnn  (plain layers)
      Gated           encoder=mlp,  gate=sigmoid, decoder=cnn
      LEM             encoder=lem,  gate=none,    decoder=cnn  (plain layers)
      MSMP-PDE        encoder=lem,  gate=sigmoid, decoder=cnn
      MSGMP-PDE       encoder=lem,  gate=sigmoid, decoder=glu, hidden=164
      MSSMP-PDE       twin_scale=True (two lem+sigmoid towers, scale/diff)
      SaveMSMP-PDE    MSMP-PDE with save_state=True (stateful LEM)
      LSTM / LSTMGated  encoder=lstm, gate none / sigmoid
      *2D variants    n_components=2 (+ MSG2-PDE2D: gate=grad)

    Inputs: window [B, nx, d*tw] (component-major), pos_x [B, nx] raw
    coordinates, t [B] window-start times, var_vec [B, 1+V] (normalized time
    + normalized eq params, common.assemble_variables), idx/mask the static
    neighbor lists. Returns (out [B, nx, d*tw], lem_state or None).
    """

    tw: int
    hidden: int = 128
    layers: int = 6
    n_components: int = 1
    encoder: str = "mlp"  # mlp | lem | lstm
    gate: str = "none"  # none | sigmoid | grad
    decoder: str = "cnn"  # cnn | glu | diff_only
    twin_scale: bool = False
    save_state: bool = False
    plain_residual: bool = True  # ungated stacks use GNN_Layer (res+swish)
    layer_type: str = "mp"  # mp | gat (GLEMGated2D)
    L: float = 16.0
    tmax: float = 4.0
    dt: float = 4.0 / 249
    mp_impl: str = "auto"  # auto | pallas | pallas_pair | xla (ops/mp_pallas.py)
    lem_impl: str = "auto"  # auto | pallas | xla | nohoist | remat |
    #   nohoist_remat (models/lem.py; pallas: ops/lem_pallas.py)
    mp_precision: str = "float32"  # float32 | bfloat16 | bfloat16s (Pallas)
    mp_inference: bool = False  # fwd-only use: feasibility skips the bwd blocking
    # Rematerialize each MP layer in the backward: recompute the per-edge
    # intermediates ([B, nx, K, H] messages — the dominant stash) instead of
    # storing them across the whole layer stack. Trades ~one extra forward
    # of FLOPs for O(layers) less HBM-resident memory — the lever for wide
    # hidden sizes where the plain backward OOMs (PERF.md §4: hidden=512
    # exhausts the 16 GB v5e). Applies to the XLA layer math; the Pallas
    # kernels already bound their memory in-kernel (custom_vjp recompute
    # ordering), so mp_remat forces the XLA path (identical param tree —
    # checkpoints interchange — and ULP-level-equivalent outputs/grads;
    # remat recomputation is not bit-guaranteed) and rejects forced-Pallas
    # configs.
    mp_remat: bool = False

    @nn.compact
    def __call__(self, window, pos_x, t, var_vec, idx, mask, lem_state=None):
        if self.twin_scale:
            # MSSMP (models_gnn.py:1684-1745): two full towers produce raw
            # decoder outputs; composed as (1-s)*u_last + cumsum(dt)*(s*d).
            sub = dict(
                tw=self.tw, hidden=self.hidden, layers=self.layers,
                n_components=self.n_components, encoder="lem",
                gate="sigmoid", decoder="diff_only", L=self.L,
                tmax=self.tmax, dt=self.dt, mp_impl=self.mp_impl,
                lem_impl=self.lem_impl, mp_precision=self.mp_precision,
                mp_inference=self.mp_inference, mp_remat=self.mp_remat,
            )
            diff, _ = MPSolver(**sub, name="diff_tower")(
                window, pos_x, t, var_vec, idx, mask
            )
            scale, _ = MPSolver(**sub, name="scale_tower")(
                window, pos_x, t, var_vec, idx, mask
            )
            return self._compose_scale_diff(window, scale, diff), None

        B, nx, dtw = window.shape
        px_n = pos_x / self.L  # normalized coordinate (models_gnn.py:242)
        variables = var_vec[:, None, :].repeat(nx, axis=1)  # [B, nx, V]

        h, new_state = self._encode(window, px_n, t, variables, lem_state)

        ega = self._resolve_ega(window, variables, idx, mask)
        ungated = self.gate == "none"
        # auto: the fused gated PAIR (gate+layer+combine in ONE kernel,
        # ops/mp_pallas.py::fused_gated_pair) measured fastest for sigmoid-
        # gated models (2.318 vs 2.420 ms/step single-kernel, RESULTS.md
        # round-3 A/B). Static-shape decision — made once here, alongside
        # _resolve_ega's single-layer decision, shared by every layer.
        use_pair = False
        if self.mp_impl == "pallas_pair" and (
                ungated or self.gate != "sigmoid" or self.layer_type != "mp"):
            # the pair kernel only exists for the sigmoid-gated MP loop; a
            # FORCED mode on any other config must not silently measure a
            # different path
            raise ValueError(
                "mp_impl=pallas_pair requires a sigmoid-gated MP model "
                f"(gate={self.gate!r}, layer_type={self.layer_type!r})"
            )
        if (not ungated and ega is not None and self.gate == "sigmoid"
                and self.mp_impl in ("pallas_pair", "auto")):
            from msmp_pde_tpu.ops.mp_pallas import pallas_feasible

            use_pair = pallas_feasible(
                window.shape[0], nx, idx.shape[1], self.hidden,
                window.shape[-1], variables.shape[-1], pair=True,
                fwd_only=self.mp_inference)
            if not use_pair and self.mp_impl == "pallas_pair":
                # a FORCED mode must not silently measure the wrong kernel
                # (mirrors _require_bb on the forced "pallas" path); only
                # "auto" may fall through to the two-kernel path
                raise ValueError(
                    "no admissible Pallas batch blocking for the fused "
                    "gated PAIR at these shapes; use mp_impl=pallas or auto"
                )
        # mp_remat: lift each layer through nn.remat so its per-edge
        # intermediates are recomputed in the backward instead of stashed
        # (ega is always None here — _resolve_ega returns None under
        # mp_remat — so every lifted call passes arrays/None only). The
        # transform preserves param names (gnn_i/gate_i): checkpoints are
        # interchangeable with the plain path.
        mp_remat = _auto_remat_policy(self.mp_remat, ega, self.mp_impl,
                                      self.layer_type, self.mp_inference)
        mp_cls = nn.remat(GNNLayer) if mp_remat else GNNLayer
        gat_cls = nn.remat(GATLayer) if mp_remat else GATLayer
        for i in range(self.layers):
            if self.layer_type == "gat":
                layer = gat_cls(hidden=self.hidden, name=f"gnn_{i}")
            else:
                layer = mp_cls(
                    hidden=self.hidden,
                    final_act=ungated and self.plain_residual,
                    residual=ungated and self.plain_residual,
                    name=f"gnn_{i}",
                )
            if ungated:
                h = layer(h, window, px_n, variables, idx, mask, ega=ega)
            else:
                if self.layer_type == "gat":
                    gate_layer = gat_cls(hidden=self.hidden,
                                         name=f"gate_{i}")
                    g = gate_layer(h, window, px_n, variables, idx, mask)
                else:
                    gate_layer = mp_cls(
                        hidden=self.hidden, final_act=False, residual=False,
                        name=f"gate_{i}",
                    )
                    if use_pair:
                        from msmp_pde_tpu.ops.mp_pallas import (
                            fused_gated_pair,
                        )

                        # identical params/math to the two-kernel path
                        ega_mats, interpret, mm_dtype = ega
                        Wg = gate_layer(h, window, px_n, variables, idx,
                                        mask, weights_only=True)
                        Wl = layer(h, window, px_n, variables, idx, mask,
                                   weights_only=True)
                        h = fused_gated_pair(
                            h, window, px_n[..., None], variables, ega_mats,
                            Wg, Wl, interpret=interpret, mm_dtype=mm_dtype,
                        )
                        continue
                    g = gate_layer(h, window, px_n, variables, idx, mask,
                                   ega=ega)
                if self.gate == "sigmoid":
                    tau = jax.nn.sigmoid(g)
                else:  # gradient gate (models_gnn2D.py:599-601)
                    tau = grad_gate(swish(g), idx, mask)
                if self.layer_type == "gat":
                    ln = layer(h, window, px_n, variables, idx, mask)
                else:
                    ln = layer(h, window, px_n, variables, idx, mask, ega=ega)
                h = (1.0 - tau) * h + tau * swish(ln)

        out = self._decode(h, window)
        return out, new_state

    # ------------------------------------------------------------ mp impl
    def _resolve_ega(self, window, variables, idx, mask):
        """Decide whether the MP layers run through the fused Pallas kernel
        (ops/mp_pallas.py) and precompute its static gather/aggregation
        matrices ONCE per forward (shared by all 2*layers GNNLayer calls).

        auto: Pallas on TPU when the per-step working set fits VMEM; XLA
        otherwise. "pallas" forces it (interpret mode off-TPU, for tests).
        """
        if self.mp_remat:
            if self.mp_impl in ("pallas", "pallas_pair"):
                # a FORCED kernel mode must not silently change math path;
                # the Pallas kernels bound their own memory in-kernel, so
                # remat composes only with the XLA layer math
                raise ValueError(
                    "mp_remat requires the XLA layer path; "
                    f"mp_impl={self.mp_impl!r} is a forced Pallas mode"
                )
            return None
        if self.layer_type != "mp" or self.mp_impl == "xla":
            return None
        backend = jax.default_backend()
        if self.mp_impl == "auto" and backend != "tpu":
            return None
        from msmp_pde_tpu.ops.mp_pallas import edge_matrices, pallas_feasible

        nx, K = idx.shape
        feasible = pallas_feasible(window.shape[0], nx, K, self.hidden,
                                   window.shape[-1], variables.shape[-1],
                                   fwd_only=self.mp_inference)
        if self.mp_impl == "auto" and not feasible:
            return None
        return edge_matrices(idx, mask), backend != "tpu", self.mp_precision

    # ------------------------------------------------------------ encoder
    def _encode(self, window, px_n, t, variables, lem_state):
        B, nx, dtw = window.shape
        if self.encoder == "mlp":
            node_in = jnp.concatenate([window, px_n[..., None], variables], -1)
            h = swish(TorchDense(self.hidden, name="embed_1")(node_in))
            h = swish(TorchDense(self.hidden, name="embed_2")(h))
            return h, None

        # recurrent encoders: per-step inputs over the tw axis
        tw, d = self.tw, self.n_components
        w = window.reshape(B, nx, d, tw)
        px_col = px_n[..., None]  # [B, nx, 1]
        steps = []
        if d == 1:
            # 1D (models_gnn.py:1355-1360): [x, u_t, t_norm, eq_vars]
            for k in range(tw):
                steps.append(
                    jnp.concatenate([px_col, w[..., 0, k : k + 1], variables], -1)
                )
        else:
            # 2D (models_gnn2D.py:421-433): [x, u1_t, u2_t, t_abs_k, eq_vars]
            t_norm = variables[..., 0:1]
            dt_cum = jnp.cumsum(jnp.full((tw,), self.dt, window.dtype))
            for k in range(tw):
                ts_k = dt_cum[k] + t_norm
                steps.append(
                    jnp.concatenate(
                        [px_col, w[..., 0, k : k + 1], w[..., 1, k : k + 1],
                         ts_k, variables[..., 1:]],
                        -1,
                    )
                )
        seq = jnp.stack(steps, 0).reshape(tw, B * nx, -1)  # [T, N, I]

        if self.encoder == "lem":
            init_state = None
            if lem_state is not None:
                init_state = jax.tree.map(
                    lambda s: s.reshape(B * nx, -1), lem_state
                )
            y, state = LEM(hidden=self.hidden, impl=self.lem_impl,
                           name="embedding_lem")(seq, init_state)
            h = y.reshape(B, nx, self.hidden)
            new_state = (
                jax.tree.map(lambda s: s.reshape(B, nx, -1), state)
                if self.save_state
                else None
            )
        elif self.encoder == "lstm":
            h = self._lstm(seq).reshape(B, nx, self.hidden)
            new_state = None
        else:
            raise ValueError(self.encoder)

        h = swish(TorchDense(self.hidden, name="lemout_1")(h))
        h = swish(TorchDense(self.hidden, name="lemout_2")(h))
        return h, new_state

    def _lstm(self, seq):
        """torch nn.LSTM equivalent: scan an LSTM cell, return last output
        (models_gnn.py:758-768). Init U(+-1/sqrt(H)) on all params."""
        H = self.hidden
        init = torch_uniform_init(H)
        ScanLSTM = nn.scan(
            nn.OptimizedLSTMCell,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
            unroll=True,  # short window; see models/lem.py rationale
        )
        cell = ScanLSTM(
            features=H, kernel_init=init, recurrent_kernel_init=init,
            bias_init=init, name="lstm",
        )
        carry = nn.OptimizedLSTMCell(features=H).initialize_carry(
            jax.random.PRNGKey(0), (seq.shape[1], seq.shape[-1])
        )
        carry, ys = cell(carry, seq)
        return ys[-1]

    # ------------------------------------------------------------ decoder
    def _compose_scale_diff(self, window, scale, diff):
        B, nx, _ = window.shape
        tw, d = self.tw, self.n_components
        dt_cum = jnp.cumsum(jnp.full((tw,), self.dt, window.dtype))
        w = window.reshape(B, nx, d, tw)
        u_last = w[..., -1:]
        s = scale.reshape(B, nx, d, tw)
        dd = diff.reshape(B, nx, d, tw)
        out = (1.0 - s) * u_last + dt_cum * (s * dd)
        return out.reshape(B, nx, d * tw)

    def _decode(self, h, window):
        B, nx, H = h.shape
        tw, d = self.tw, self.n_components
        dt_cum = jnp.cumsum(jnp.full((tw,), self.dt, window.dtype))

        if d == 2:
            # double_mlp: Dense H->2H + swish -> [B, nx, 2, H]
            h = swish(TorchDense(2 * H, name="double_mlp")(h))
            h = h.reshape(B, nx, 2, H)
            chan = h
        else:
            chan = h[..., None, :]  # [B, nx, 1, H]

        if self.decoder in ("cnn", "diff_only"):
            diff = WindowDecoder(tw=tw, out_channels=d, name="output_mlp")(chan)
            if self.decoder == "diff_only":
                return diff.reshape(B, nx, d * tw)
            w = window.reshape(B, nx, d, tw)
            out = w[..., -1:] + dt_cum * diff
            return out.reshape(B, nx, d * tw)

        if self.decoder == "glu":
            # split the hidden axis (models_gnn.py:1514-1521 / 2D :1352-1356)
            half = H // 2
            gate_in, diff_in = chan[..., :half], chan[..., half:]
            scale = GLUConv(tw=tw, out_channels=d, name="output_mlp_gate")(gate_in)
            diff = GLUConv(tw=tw, out_channels=d, name="output_mlp_diff")(diff_in)
            w = window.reshape(B, nx, d, tw)
            out = (1.0 - scale) * w[..., -1:] + dt_cum * (scale * diff)
            return out.reshape(B, nx, d * tw)

        raise ValueError(self.decoder)


class GLUConv(nn.Module):
    """Half-hidden decoder conv used by the GLU variants: for hidden=164,
    82 -> (k=6, s=2) -> 39 -> (k=15) -> 25 outputs (models_gnn.py:1455-1456)."""

    tw: int
    out_channels: int = 1

    @nn.compact
    def __call__(self, x):
        x = TorchConv1d(features=8, kernel_size=6, stride=2)(x)
        x = swish(x)
        x = TorchConv1d(features=self.out_channels, kernel_size=15, stride=1)(x)
        return x
