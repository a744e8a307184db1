"""Fused Pallas TPU kernel for one message-passing layer.

The hot op of the whole framework (SURVEY.md §3.3: 12 GNN-layer calls per
MSMP-PDE forward). Semantics match models/gnn.py::GNNLayer exactly, i.e. the
reference GNN_Layer/GNN_LayerLin (/root/reference/experiments/
models_gnn.py:69-148): factorized edge Dense -> swish -> edge MLP -> masked
mean aggregation -> update MLP (+ optional swish/residual) -> per-graph
InstanceNorm.

TPU-first design:

  * The per-(batch-block, layer) working set lives entirely in VMEM: ONE
    kernel per layer instead of ~10 XLA ops, removing every inter-op HBM
    round trip (profiling showed the step is small-kernel/HBM bound).

  * Edge structure exploits the dense [nx, K] neighbor-list layout
    (data/graph.py) instead of generic scatter:
      - node -> edge-row EXPANSION is a broadcast + reshape (row e=(i,k)
        repeats node i K times) — free on the VPU, no matmul;
      - the masked-mean AGGREGATION is a reshape to [nx, K, H], a multiply
        by the per-slot weights mask/deg, and a sum over K — VPU only;
      - only the true neighbor GATHER needs the one-hot matmul
        G [nx*K, nx] (mask folded in) — it runs on the MXU and serves
        stencil graphs AND unstructured kNN graphs (RPU/WE) alike. No
        scatter, no dynamic indexing anywhere.

  * The grid runs over batch BLOCKS of `bb` elements: dense matmuls see
    [bb*nx, H] row tiles (full MXU utilization at nx=100) and the grid has
    B/bb sequential steps instead of B. Per-element ops (gather matmul,
    aggregation, instance norm) unroll over the block. `bb` is chosen per
    call as the largest divisor of B whose working set fits VMEM.

  * Instance norm is per batch element; weight gradients accumulate across
    the sequential grid steps in VMEM.

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
    """Static gather matrix + aggregation weights from a dense neighbor list.

    idx [nx, K] int32, mask [nx, K] in {0,1}. Returns
      G    [nx*K, nx]: row e=(i,k) one-hot at idx[i,k] * mask[i,k] (gather)
      wdeg [nx, K]:    mask[i,k] / deg[i]  (masked-mean weights)
    The expansion (node -> edge rows) and aggregation (edge rows -> node)
    need no matrices: they are a broadcast and a weighted reshape-sum.
    """
    nx, K = idx.shape
    e = jnp.arange(nx * K)
    mflat = mask.reshape(-1).astype(jnp.float32)
    G = jnp.zeros((nx * K, nx), jnp.float32).at[e, idx.reshape(-1)].set(mflat)
    deg = jnp.maximum(mask.sum(-1), 1.0)
    wdeg = mask.astype(jnp.float32) / deg[:, None]
    return G, wdeg


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


def _expand(s, bb, nx, K):
    """Node rows -> edge rows: repeat each node row K times.
    s [bb*nx, H] -> [bb*nx*K, H] with row (b,i,k) = s[b,i]."""
    H = s.shape[-1]
    return jnp.broadcast_to(
        s.reshape(bb * nx, 1, H), (bb * nx, K, H)
    ).reshape(bb * nx * K, H)


def _aggregate(m, wdeg, bb, nx, K):
    """Masked mean over each node's K edge slots.
    m [bb*nx*K, H], wdeg [nx, K] -> [bb*nx, H]."""
    H = m.shape[-1]
    w = jnp.broadcast_to(wdeg.reshape(1, nx, K, 1), (bb, nx, K, 1))
    return jnp.sum(
        m.reshape(bb, nx, K, H) * w, axis=2
    ).reshape(bb * nx, H)


def _gather(G, s_j, bb, nx):
    """Per-element one-hot gather: [bb] x (G [nE, nx] @ s_j_e [nx, H])."""
    H = s_j.shape[-1]
    s3 = s_j.reshape(bb, nx, H)
    return jnp.concatenate(
        [_dot(G, s3[e]) for e in range(bb)], axis=0
    )


def _forward_math(h, u, px, v, G, wdeg, W, final_act, residual, bb, nx, K):
    """The layer math on stacked [bb*nx, .] operands; shared by both
    kernels."""
    (w_hi, w_hj, w_du, w_dx, w_v, b1, w2, b2, w3, b3, w4, b4) = W
    H = h.shape[-1]
    mix = _dot(u, w_du) + _dot(px, w_dx)
    s_i = _dot(h, w_hi) + mix + _dot(v, w_v) + b1
    s_j = _dot(h, w_hj) - mix
    m0 = _expand(s_i, bb, nx, K) + _gather(G, s_j, bb, nx)
    m1 = _swish(m0)
    z2 = _dot(m1, w2) + b2
    m2 = _swish(z2)
    agg = _aggregate(m2, wdeg, bb, nx, K)
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


def _instnorm(o, bb, nx, eps=1e-5):
    """Per-batch-element instance norm over the nx axis; o [bb*nx, H]."""
    H = o.shape[-1]
    o3 = o.reshape(bb, nx, H)
    mu = jnp.mean(o3, axis=1, keepdims=True)
    var = jnp.mean((o3 - mu) ** 2, axis=1, keepdims=True)
    r = jax.lax.rsqrt(var + eps)
    return ((o3 - mu) * r).reshape(bb * nx, H), r


def _flat(ref, bb):
    """Ref block [bb, nx, D] -> value [bb*nx, D]."""
    v = ref[...]
    return v.reshape(bb * v.shape[1], v.shape[2])


def _fwd_kernel(h_ref, u_ref, px_ref, v_ref, G_ref, wdeg_ref, *rest,
                final_act, residual, bb, nx, K):
    *w_refs, out_ref = rest
    W = tuple(r[...] for r in w_refs)
    H = h_ref.shape[-1]
    o, _ = _forward_math(
        _flat(h_ref, bb), _flat(u_ref, bb), _flat(px_ref, bb),
        _flat(v_ref, bb), G_ref[...], wdeg_ref[...], W,
        final_act, residual, bb, nx, K,
    )
    xh, _ = _instnorm(o, bb, nx)
    out_ref[...] = xh.reshape(bb, nx, H)


def _bwd_kernel(h_ref, u_ref, px_ref, v_ref, G_ref, wdeg_ref, *rest,
                final_act, residual, bb, nx, K):
    w_refs = rest[:12]
    g_ref = rest[12]
    dh_ref = rest[13]
    dw_refs = rest[14:]
    W = tuple(r[...] for r in w_refs)
    (w_hi, w_hj, w_du, w_dx, w_v, b1, w2, b2, w3, b3, w4, b4) = W
    h, u, px, v = (_flat(h_ref, bb), _flat(u_ref, bb),
                   _flat(px_ref, bb), _flat(v_ref, bb))
    G, wdeg = G_ref[...], wdeg_ref[...]
    H = h.shape[-1]
    V = v.shape[-1]

    o, (s_i, s_j, m0, m1, z2, m2, agg, z3, a3, z4) = _forward_math(
        h, u, px, v, G, wdeg, W, final_act, residual, bb, nx, K
    )
    xh, r = _instnorm(o, bb, nx)

    g = _flat(g_ref, bb)
    # instance-norm backward (per-feature stats over the nx axis,
    # per batch element)
    g3 = g.reshape(bb, nx, H)
    xh3 = xh.reshape(bb, nx, H)
    dxo = (r * (
        g3
        - jnp.mean(g3, axis=1, keepdims=True)
        - xh3 * jnp.mean(g3 * xh3, axis=1, keepdims=True)
    )).reshape(bb * nx, H)
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
    # aggregation backward: distribute dagg to each node's K slots
    dm2 = (
        dagg.reshape(bb, nx, 1, H)
        * jnp.broadcast_to(wdeg.reshape(1, nx, K, 1), (bb, nx, K, 1))
    ).reshape(bb * nx * K, H)
    dz2 = dm2 * _dswish(z2)
    dw2 = _dot_t(m1, dz2)
    db2 = jnp.sum(dz2, axis=0, keepdims=True)
    dm1 = _dot(dz2, w2.T)
    dm0 = dm1 * _dswish(m0)
    # expansion backward: sum each node's K edge rows
    ds_i = jnp.sum(dm0.reshape(bb, nx, K, H), axis=2).reshape(bb * nx, H)
    # gather backward: per-element G^T @ dm0_e
    dm0_3 = dm0.reshape(bb, nx * K, H)
    ds_j = jnp.concatenate(
        [_dot_t(G, dm0_3[e]) for e in range(bb)], axis=0
    )
    dh = dh + _dot(ds_i, w_hi.T) + _dot(ds_j, w_hj.T)
    dw_hi = _dot_t(h, ds_i)
    dw_hj = _dot_t(h, ds_j)
    dmix = ds_i - ds_j
    dw_du = _dot_t(u, dmix)
    dw_dx = _dot_t(px, dmix)
    dw_v = _dot_t(v, ds_i)
    db1 = jnp.sum(ds_i, axis=0, keepdims=True)

    dh_ref[...] = dh.reshape(bb, nx, H)
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


def _spec_batch(shape_tail, bb):
    return pl.BlockSpec(
        (bb,) + shape_tail, lambda b: (b,) + (0,) * len(shape_tail),
        memory_space=pltpu.VMEM,
    )


def _pick_bb(B, nx, K, H, dtw, V, backward):
    """Largest divisor of B whose per-grid-step working set fits VMEM."""
    budget = 10 * 2**20
    for bb in (8, 4, 3, 2):
        if B % bb == 0 and vmem_estimate(nx, K, H, dtw, V, bb, backward) <= budget:
            return bb
    return 1


@functools.lru_cache(maxsize=None)
def make_fused_layer(final_act: bool, residual: bool, interpret: bool):
    """Build the custom-VJP fused layer for a static config.

    Signature: f(h [B,nx,H], u [B,nx,dtw], px [B,nx,1], v [B,nx,V],
                 ega=(G, wdeg), W=12-tuple) -> [B,nx,H].
    """

    def _run_fwd(h, u, px, v, ega, W):
        B, nx, H = h.shape
        G, wdeg = ega
        K = wdeg.shape[-1]
        bb = _pick_bb(B, nx, K, H, u.shape[-1], v.shape[-1], backward=False)
        kernel = functools.partial(
            _fwd_kernel, final_act=final_act, residual=residual,
            bb=bb, nx=nx, K=K,
        )
        return pl.pallas_call(
            kernel,
            grid=(B // bb,),
            in_specs=[
                _spec_batch(h.shape[1:], bb),
                _spec_batch(u.shape[1:], bb),
                _spec_batch(px.shape[1:], bb),
                _spec_batch(v.shape[1:], bb),
                _spec_full(G.shape),
                _spec_full(wdeg.shape),
            ] + [_spec_full(w.shape) for w in W],
            out_specs=_spec_batch((nx, H), bb),
            out_shape=jax.ShapeDtypeStruct((B, nx, H), h.dtype),
            interpret=interpret,
        )(h, u, px, v, G, wdeg, *W)

    def _run_bwd(h, u, px, v, ega, W, g):
        B, nx, H = h.shape
        G, wdeg = ega
        K = wdeg.shape[-1]
        bb = _pick_bb(B, nx, K, H, u.shape[-1], v.shape[-1], backward=True)
        kernel = functools.partial(
            _bwd_kernel, final_act=final_act, residual=residual,
            bb=bb, nx=nx, K=K,
        )
        out_shapes = [jax.ShapeDtypeStruct((B, nx, H), h.dtype)] + [
            jax.ShapeDtypeStruct(_grad_shape(w.shape), jnp.float32) for w in W
        ]
        out_specs = [_spec_batch((nx, H), bb)] + [
            _spec_full(_grad_shape(w.shape)) for w in W
        ]
        outs = pl.pallas_call(
            kernel,
            grid=(B // bb,),
            in_specs=[
                _spec_batch(h.shape[1:], bb),
                _spec_batch(u.shape[1:], bb),
                _spec_batch(px.shape[1:], bb),
                _spec_batch(v.shape[1:], bb),
                _spec_full(G.shape),
                _spec_full(wdeg.shape),
            ]
            + [_spec_full(w.shape) for w in W]
            + [_spec_batch((nx, H), bb)],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shapes),
            interpret=interpret,
        )(h, u, px, v, G, wdeg, *W, g)
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


def vmem_estimate(nx: int, K: int, H: int, dtw: int, V: int,
                  bb: int = 1, backward: bool = True) -> int:
    """Rough per-grid-step VMEM footprint in bytes (f32): edge tensors
    dominate; used to gate the pallas path on large shapes and to pick the
    batch-block size."""
    edges = nx * K
    n_edge = 8 if backward else 4        # m0/m1/z2/m2 (+ grads in bwd)
    edge_bufs = n_edge * bb * edges * H
    node_bufs = (14 if backward else 10) * bb * nx * H
    mats = edges * nx + nx * K           # G + wdeg
    weights = (2 if backward else 1) * (
        2 * H * H + (2 * H + V) * H + H * H + (dtw + 1 + V) * H
    )
    return 4 * (edge_bufs + node_bufs + mats + weights
                + bb * nx * (dtw + V + 1))
