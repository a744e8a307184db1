"""Fused Pallas TPU kernel for one message-passing layer.

The hot op of the whole framework (SURVEY.md §3.3: 12 GNN-layer calls per
MSMP-PDE forward). Semantics match models/gnn.py::GNNLayer exactly, i.e. the
reference GNN_Layer/GNN_LayerLin (/root/reference/experiments/
models_gnn.py:69-148): factorized edge Dense -> swish -> edge MLP -> masked
mean aggregation -> update MLP (+ optional swish/residual) -> per-graph
InstanceNorm.

TPU-first design:

  * The per-(batch-element, layer) working set (~1-6 MB at production
    shapes) lives entirely in VMEM: ONE kernel per layer instead of ~10 XLA
    ops, removing every inter-op HBM round trip (profiling showed the step
    is small-kernel/HBM bound at ~12 TFLOP/s effective).

  * The neighbor gather/scatter is expressed as matmuls with static 0/1
    matrices (E expands nodes to edge rows, G gathers neighbors with the
    validity mask folded in, A is the masked-mean aggregation) — everything
    runs on the MXU, and the same kernel serves stencil graphs AND
    unstructured kNN graphs (RPU/WE). No scatter, no dynamic indexing.

  * Grid over the batch: instance norm is per batch element, and weight
    gradients accumulate across the sequential grid steps in VMEM.

  * Training needs a custom VJP (Pallas kernels are not auto-
    differentiable): the backward kernel recomputes the forward
    intermediates from the saved inputs in VMEM (FLOPs are free here — the
    layer is bandwidth-bound) and emits dh plus all 12 weight gradients.
    u/px/vars are training data / static features — their cotangents are
    zero by construction (the training loss never differentiates w.r.t.
    them; loop.py applies stop_gradient on pushforward windows).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def edge_matrices(idx, mask):
    """Static gather/aggregation matrices from a dense neighbor list.

    idx [nx, K] int32, mask [nx, K] in {0,1}. Returns
      E [nx*K, nx]: row e=(i,k) one-hot at i      (expand node -> edge rows)
      G [nx*K, nx]: row e one-hot at idx[i,k] * mask[i,k]   (gather)
      A [nx, nx*K]: A[i, (i,k)] = mask[i,k]/deg[i]          (masked mean)
    """
    nx, K = idx.shape
    e = jnp.arange(nx * K)
    rows_i = e // K
    E = jnp.zeros((nx * K, nx), jnp.float32).at[e, rows_i].set(1.0)
    mflat = mask.reshape(-1).astype(jnp.float32)
    G = jnp.zeros((nx * K, nx), jnp.float32).at[e, idx.reshape(-1)].set(mflat)
    deg = jnp.maximum(mask.sum(-1), 1.0)
    A = jnp.zeros((nx, nx * K), jnp.float32).at[rows_i, e].set(
        mflat / deg[rows_i]
    )
    return E, G, A


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _dswish(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """a^T @ b contracting the leading axis of both."""
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _forward_math(h, u, px, v, E, G, A, W, final_act, residual):
    """The layer math on 2-D [nx, .] operands; shared by both kernels."""
    (w_hi, w_hj, w_du, w_dx, w_v, b1, w2, b2, w3, b3, w4, b4) = W
    H = h.shape[-1]
    mix = _dot(u, w_du) + _dot(px, w_dx)
    s_i = _dot(h, w_hi) + mix + _dot(v, w_v) + b1
    s_j = _dot(h, w_hj) - mix
    m0 = _dot(E, s_i) + _dot(G, s_j)
    m1 = _swish(m0)
    z2 = _dot(m1, w2) + b2
    m2 = _swish(z2)
    agg = _dot(A, m2)
    # update MLP on [h, agg, v]: w3 split by row blocks (no lane concat)
    V = v.shape[-1]
    z3 = (
        _dot(h, w3[0:H, :])
        + _dot(agg, w3[H : 2 * H, :])
        + _dot(v, w3[2 * H : 2 * H + V, :])
        + b3
    )
    a3 = _swish(z3)
    z4 = _dot(a3, w4) + b4
    o = _swish(z4) if final_act else z4
    o = h + o if residual else o
    return o, (s_i, s_j, m0, m1, z2, m2, agg, z3, a3, z4)


def _instnorm(o, eps=1e-5):
    mu = jnp.mean(o, axis=0, keepdims=True)
    var = jnp.mean((o - mu) ** 2, axis=0, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    return (o - mu) * r, r


def _fwd_kernel(h_ref, u_ref, px_ref, v_ref, E_ref, G_ref, A_ref, *rest,
                final_act, residual):
    *w_refs, out_ref = rest
    W = tuple(r[...] for r in w_refs)
    o, _ = _forward_math(
        h_ref[0], u_ref[0], px_ref[0], v_ref[0],
        E_ref[...], G_ref[...], A_ref[...], W, final_act, residual,
    )
    xh, _ = _instnorm(o)
    out_ref[0] = xh


def _bwd_kernel(h_ref, u_ref, px_ref, v_ref, E_ref, G_ref, A_ref, *rest,
                final_act, residual):
    w_refs = rest[:12]
    g_ref = rest[12]
    dh_ref = rest[13]
    dw_refs = rest[14:]
    W = tuple(r[...] for r in w_refs)
    (w_hi, w_hj, w_du, w_dx, w_v, b1, w2, b2, w3, b3, w4, b4) = W
    h, u, px, v = h_ref[0], u_ref[0], px_ref[0], v_ref[0]
    E, G, A = E_ref[...], G_ref[...], A_ref[...]
    H = h.shape[-1]
    V = v.shape[-1]

    o, (s_i, s_j, m0, m1, z2, m2, agg, z3, a3, z4) = _forward_math(
        h, u, px, v, E, G, A, W, final_act, residual
    )
    xh, r = _instnorm(o)

    g = g_ref[0]
    # instance-norm backward (per-feature stats over the nx axis)
    dxo = r * (
        g
        - jnp.mean(g, axis=0, keepdims=True)
        - xh * jnp.mean(g * xh, axis=0, keepdims=True)
    )
    dh = dxo if residual else jnp.zeros_like(dxo)
    dz4 = dxo * _dswish(z4) if final_act else dxo
    dw4 = _dot_t(a3, dz4)
    db4 = jnp.sum(dz4, axis=0, keepdims=True)
    da3 = _dot(dz4, w4.T)
    dz3 = da3 * _dswish(z3)
    db3 = jnp.sum(dz3, axis=0, keepdims=True)
    # dW3 row blocks from [h, agg, v]
    dw3_h = _dot_t(h, dz3)
    dw3_a = _dot_t(agg, dz3)
    dw3_v = _dot_t(v, dz3)
    dh = dh + _dot(dz3, w3[0:H, :].T)
    dagg = _dot(dz3, w3[H : 2 * H, :].T)
    dm2 = _dot_t(A, dagg)
    dz2 = dm2 * _dswish(z2)
    dw2 = _dot_t(m1, dz2)
    db2 = jnp.sum(dz2, axis=0, keepdims=True)
    dm1 = _dot(dz2, w2.T)
    dm0 = dm1 * _dswish(m0)
    ds_i = _dot_t(E, dm0)
    ds_j = _dot_t(G, dm0)
    dh = dh + _dot(ds_i, w_hi.T) + _dot(ds_j, w_hj.T)
    dw_hi = _dot_t(h, ds_i)
    dw_hj = _dot_t(h, ds_j)
    dmix = ds_i - ds_j
    dw_du = _dot_t(u, dmix)
    dw_dx = _dot_t(px, dmix)
    dw_v = _dot_t(v, ds_i)
    db1 = jnp.sum(ds_i, axis=0, keepdims=True)

    dh_ref[0] = dh
    dws = (dw_hi, dw_hj, dw_du, dw_dx, dw_v, db1, dw2, db2,
           jnp.concatenate([dw3_h, dw3_a, dw3_v], axis=0), db3, dw4, db4)

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        for ref in dw_refs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    for ref, val in zip(dw_refs, dws):
        ref[...] += val


def _spec_full(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, nd=nd: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _spec_batch(shape_tail):
    return pl.BlockSpec((1,) + shape_tail, lambda b: (b,) + (0,) * len(shape_tail),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def make_fused_layer(final_act: bool, residual: bool, interpret: bool):
    """Build the custom-VJP fused layer for a static config.

    Signature: f(h [B,nx,H], u [B,nx,dtw], px [B,nx,1], v [B,nx,V],
                 ega=(E,G,A), W=12-tuple) -> [B,nx,H].
    """

    def _run_fwd(h, u, px, v, ega, W):
        B, nx, H = h.shape
        E, G, A = ega
        kernel = functools.partial(
            _fwd_kernel, final_act=final_act, residual=residual
        )
        return pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                _spec_batch(h.shape[1:]),
                _spec_batch(u.shape[1:]),
                _spec_batch(px.shape[1:]),
                _spec_batch(v.shape[1:]),
                _spec_full(E.shape),
                _spec_full(G.shape),
                _spec_full(A.shape),
            ] + [_spec_full(w.shape) for w in W],
            out_specs=_spec_batch((nx, H)),
            out_shape=jax.ShapeDtypeStruct((B, nx, H), h.dtype),
            interpret=interpret,
        )(h, u, px, v, E, G, A, *W)

    def _run_bwd(h, u, px, v, ega, W, g):
        B, nx, H = h.shape
        E, G, A = ega
        kernel = functools.partial(
            _bwd_kernel, final_act=final_act, residual=residual
        )
        out_shapes = [jax.ShapeDtypeStruct((B, nx, H), h.dtype)] + [
            jax.ShapeDtypeStruct(_grad_shape(w.shape), jnp.float32) for w in W
        ]
        out_specs = [_spec_batch((nx, H))] + [
            _spec_full(_grad_shape(w.shape)) for w in W
        ]
        outs = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                _spec_batch(h.shape[1:]),
                _spec_batch(u.shape[1:]),
                _spec_batch(px.shape[1:]),
                _spec_batch(v.shape[1:]),
                _spec_full(E.shape),
                _spec_full(G.shape),
                _spec_full(A.shape),
            ]
            + [_spec_full(w.shape) for w in W]
            + [_spec_batch((nx, H))],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(h, u, px, v, E, G, A, *W, g)
        dh, dws = outs[0], outs[1:]
        # biases were computed as [1, H]; restore param shapes
        dws = tuple(dw.reshape(w.shape) for dw, w in zip(dws, W))
        return dh, dws

    @jax.custom_vjp
    def fused(h, u, px, v, ega, W):
        return _run_fwd(h, u, px, v, ega, W)

    def fwd(h, u, px, v, ega, W):
        return _run_fwd(h, u, px, v, ega, W), (h, u, px, v, ega, W)

    def bwd(res, g):
        h, u, px, v, ega, W = res
        dh, dws = _run_bwd(h, u, px, v, ega, W, g)
        zeros = lambda t: jax.tree.map(jnp.zeros_like, t)
        return (dh, zeros(u), zeros(px), zeros(v), zeros(ega), dws)

    fused.defvjp(fwd, bwd)
    return fused


def _grad_shape(shape):
    """Weight-grad buffer shapes: biases [H] are accumulated as [1, H]
    (TPU needs >=2-D); matrices keep their shape."""
    return (1,) + shape if len(shape) == 1 else shape


def fused_mp_layer(h, u, px, v, ega, W, *, final_act: bool, residual: bool,
                   interpret: bool = False):
    """Apply the fused layer; biases in W may be 1-D (reshaped to [1,H])."""
    W2d = tuple(w[None] if w.ndim == 1 else w for w in W)
    out = make_fused_layer(final_act, residual, interpret)(
        h, u, px, v, tuple(ega), W2d
    )
    return out


def vmem_estimate(nx: int, K: int, H: int, dtw: int, V: int) -> int:
    """Rough per-grid-step VMEM footprint in bytes (backward kernel, f32):
    edge tensors dominate; used to gate the pallas path on large shapes."""
    edges = nx * K
    edge_bufs = 8 * edges * H          # m0/m1/z2/m2 + their grads
    node_bufs = 14 * nx * H
    mats = 2 * edges * nx + nx * edges  # E, G, A
    weights = 2 * (2 * H * H + (2 * H + V) * H + H * H + (dtw + 1 + V) * H)
    return 4 * (edge_bufs + node_bufs + mats + weights + nx * (dtw + V + 1))
