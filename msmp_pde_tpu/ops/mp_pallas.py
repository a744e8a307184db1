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

  * The neighbor gather/scatter is expressed as matmuls with static 0/1
    matrices (E expands nodes to edge rows, G gathers neighbors with the
    validity mask folded in, A is the masked-mean aggregation) — everything
    runs on the MXU, and the same kernel serves stencil graphs AND
    unstructured kNN graphs (RPU/WE). No scatter, no dynamic indexing.

  * The grid runs over batch BLOCKS of `bb` elements: the dense MLP matmuls
    see [bb*nx, H] row tiles (full MXU utilization at nx=100) and the grid
    has B/bb sequential steps instead of B. Per-graph ops (E/G/A matmuls,
    instance norm) unroll over the block with static 2-D row slices. `bb`
    is chosen per call as the largest divisor of B whose working set fits
    VMEM. Everything stays 2-D: Mosaic's relayout support for 3-D
    broadcasts/reductions is incomplete (measured: a (bb, nx, H) axis-1
    reduce_sum fails to lower on v5e), and 2-D slices+concats compile
    cleanly.

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


def _dot(a, b, mm=None):
    """a @ b with f32 accumulation. ``mm=bfloat16`` casts the operands so
    the MXU does one bf16 pass instead of the multi-pass f32 emulation
    (v5e: ~4x matmul throughput); the output stays f32."""
    if mm is not None:
        a, b = a.astype(mm), b.astype(mm)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_t(a, b, mm=None):
    """a^T @ b contracting the leading axis of both."""
    if mm is not None:
        a, b = a.astype(mm), b.astype(mm)
    return jax.lax.dot_general(
        a, b, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _per_elem(mat, x, rows, bb, mm=None):
    """[bb] per-element matmuls mat @ x[e*rows:(e+1)*rows], stacked.
    All 2-D: static row slices + a major-axis concat."""
    outs = [_dot(mat, x[e * rows : (e + 1) * rows], mm) for e in range(bb)]
    return outs[0] if bb == 1 else jnp.concatenate(outs, axis=0)


def _forward_math(h, u, px, v, E, G, A, W, final_act, residual, bb, nx,
                  mm=None):
    """The layer math on stacked 2-D [bb*nx, .] operands; shared by both
    kernels."""
    (w_hi, w_hj, w_du, w_dx, w_v, b1, w2, b2, w3, b3, w4, b4) = W
    H = h.shape[-1]
    mix = _dot(u, w_du, mm) + _dot(px, w_dx, mm)
    s_i = _dot(h, w_hi, mm) + mix + _dot(v, w_v, mm) + b1
    s_j = _dot(h, w_hj, mm) - mix
    m0 = _per_elem(E, s_i, nx, bb, mm) + _per_elem(G, s_j, nx, bb, mm)
    m1 = _swish(m0)
    z2 = _dot(m1, w2, mm) + b2
    m2 = _swish(z2)
    nE = E.shape[0]
    agg = _per_elem(A, m2, nE, bb, mm)
    # update MLP on [h, agg, v]: w3 split by row blocks (no lane concat)
    V = v.shape[-1]
    z3 = (
        _dot(h, w3[0:H, :], mm)
        + _dot(agg, w3[H : 2 * H, :], mm)
        + _dot(v, w3[2 * H : 2 * H + V, :], mm)
        + b3
    )
    a3 = _swish(z3)
    z4 = _dot(a3, w4, mm) + b4
    o = _swish(z4) if final_act else z4
    o = h + o if residual else o
    return o, (s_i, s_j, m0, m1, z2, m2, agg, z3, a3, z4)


def _instnorm(o, bb, nx, eps=1e-5):
    """Per-batch-element instance norm over the nx axis; o [bb*nx, H].
    2-D only: per-element row slices, stats reduce to [1, H]."""
    outs, rs = [], []
    for e in range(bb):
        oe = o[e * nx : (e + 1) * nx]
        mu = jnp.mean(oe, axis=0, keepdims=True)
        var = jnp.mean((oe - mu) ** 2, axis=0, keepdims=True)
        r = jax.lax.rsqrt(var + eps)
        outs.append((oe - mu) * r)
        rs.append(r)
    if bb == 1:
        return outs[0], rs
    return jnp.concatenate(outs, axis=0), rs


def _fwd_kernel(h_ref, u_ref, px_ref, v_ref, E_ref, G_ref, A_ref, *rest,
                final_act, residual, bb, nx, mm=None):
    *w_refs, out_ref = rest
    W = tuple(r[...] for r in w_refs)
    o, _ = _forward_math(
        h_ref[...], u_ref[...], px_ref[...], v_ref[...],
        E_ref[...], G_ref[...], A_ref[...], W, final_act, residual, bb, nx,
        mm=mm,
    )
    xh, _ = _instnorm(o, bb, nx)
    out_ref[...] = xh


def _instnorm_bwd(g, xh, rs, bb, nx):
    """Instance-norm backward (per-feature stats over the nx axis, per
    batch element; 2-D row slices). g is the output cotangent, xh/rs the
    forward's normalized output and rsqrt factors."""
    parts = []
    for e in range(bb):
        ge = g[e * nx : (e + 1) * nx]
        xe = xh[e * nx : (e + 1) * nx]
        parts.append(rs[e] * (
            ge
            - jnp.mean(ge, axis=0, keepdims=True)
            - xe * jnp.mean(ge * xe, axis=0, keepdims=True)
        ))
    return parts[0] if bb == 1 else jnp.concatenate(parts, axis=0)


def _layer_bwd_math(dxo, h, u, px, v, E, G, A, W, saved, final_act, residual,
                    bb, nx, mm=None):
    """Backward through the layer math (pre-norm): dxo is the cotangent of
    the layer's pre-norm output, saved the _forward_math intermediates.
    Returns (dh, 12-tuple of weight grads)."""
    (w_hi, w_hj, w_du, w_dx, w_v, b1, w2, b2, w3, b3, w4, b4) = W
    (s_i, s_j, m0, m1, z2, m2, agg, z3, a3, z4) = saved
    H = h.shape[-1]
    nE = E.shape[0]
    dh = dxo if residual else jnp.zeros_like(dxo)
    dz4 = dxo * _dswish(z4) if final_act else dxo
    dw4 = _dot_t(a3, dz4, mm)
    db4 = jnp.sum(dz4, axis=0, keepdims=True)
    da3 = _dot(dz4, w4.T, mm)
    dz3 = da3 * _dswish(z3)
    db3 = jnp.sum(dz3, axis=0, keepdims=True)
    # dW3 row blocks from [h, agg, v]
    dw3_h = _dot_t(h, dz3, mm)
    dw3_a = _dot_t(agg, dz3, mm)
    dw3_v = _dot_t(v, dz3, mm)
    dh = dh + _dot(dz3, w3[0:H, :].T, mm)
    dagg = _dot(dz3, w3[H : 2 * H, :].T, mm)
    dm2 = _per_elem(A.T, dagg, nx, bb, mm)
    dz2 = dm2 * _dswish(z2)
    dw2 = _dot_t(m1, dz2, mm)
    db2 = jnp.sum(dz2, axis=0, keepdims=True)
    dm1 = _dot(dz2, w2.T, mm)
    dm0 = dm1 * _dswish(m0)
    ds_i = _per_elem(E.T, dm0, nE, bb, mm)
    ds_j = _per_elem(G.T, dm0, nE, bb, mm)
    dh = dh + _dot(ds_i, w_hi.T, mm) + _dot(ds_j, w_hj.T, mm)
    dw_hi = _dot_t(h, ds_i, mm)
    dw_hj = _dot_t(h, ds_j, mm)
    dmix = ds_i - ds_j
    dw_du = _dot_t(u, dmix, mm)
    dw_dx = _dot_t(px, dmix, mm)
    dw_v = _dot_t(v, ds_i, mm)
    db1 = jnp.sum(ds_i, axis=0, keepdims=True)
    dws = (dw_hi, dw_hj, dw_du, dw_dx, dw_v, db1, dw2, db2,
           jnp.concatenate([dw3_h, dw3_a, dw3_v], axis=0), db3, dw4, db4)
    return dh, dws


def _bwd_kernel(h_ref, u_ref, px_ref, v_ref, E_ref, G_ref, A_ref, *rest,
                final_act, residual, bb, nx, mm=None):
    w_refs = rest[:12]
    g_ref = rest[12]
    dh_ref = rest[13]
    dw_refs = rest[14:]
    W = tuple(r[...] for r in w_refs)
    h, u, px, v = h_ref[...], u_ref[...], px_ref[...], v_ref[...]
    E, G, A = E_ref[...], G_ref[...], A_ref[...]

    o, saved = _forward_math(
        h, u, px, v, E, G, A, W, final_act, residual, bb, nx, mm=mm
    )
    xh, rs = _instnorm(o, bb, nx)

    dxo = _instnorm_bwd(g_ref[...], xh, rs, bb, nx)
    dh, dws = _layer_bwd_math(dxo, h, u, px, v, E, G, A, W, saved,
                              final_act, residual, bb, nx, mm=mm)

    dh_ref[...] = dh

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        for ref in dw_refs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    for ref, val in zip(dw_refs, dws):
        ref[...] += val


def _pair_fwd_kernel(h_ref, u_ref, px_ref, v_ref, E_ref, G_ref, A_ref, *rest,
                     bb, nx, stash, mm=None):
    """Fused gated layer PAIR (the gated-loop body, models_gnn.py:1365-1368):
    gate GNN_LayerLin + main GNN_LayerLin share every input; one kernel
    computes both and the combine h' = (1-sigmoid(g))*h + sigmoid(g)*swish(l)
    in VMEM. With ``stash`` the normalized pre-combine outputs gn/ln are
    ALSO written out — the residuals for the two-single-kernel fallback
    backward used when the fused pair backward's blocking doesn't fit VMEM
    (_pair_bwd_kernel recomputes everything and needs no stash)."""
    wg_refs, wl_refs = rest[:12], rest[12:24]
    if stash:
        out_ref, gn_ref, ln_ref = rest[24], rest[25], rest[26]
    else:
        out_ref = rest[24]
    Wg = tuple(r[...] for r in wg_refs)
    Wl = tuple(r[...] for r in wl_refs)
    h, u, px, v = h_ref[...], u_ref[...], px_ref[...], v_ref[...]
    E, G, A = E_ref[...], G_ref[...], A_ref[...]
    og, _ = _forward_math(h, u, px, v, E, G, A, Wg, False, False, bb, nx,
                          mm=mm)
    gn, _ = _instnorm(og, bb, nx)
    ol, _ = _forward_math(h, u, px, v, E, G, A, Wl, False, False, bb, nx,
                          mm=mm)
    ln, _ = _instnorm(ol, bb, nx)
    tau = jax.nn.sigmoid(gn)
    out_ref[...] = (1.0 - tau) * h + tau * _swish(ln)
    if stash:
        gn_ref[...] = gn
        ln_ref[...] = ln


def _pair_bwd_kernel(h_ref, u_ref, px_ref, v_ref, E_ref, G_ref, A_ref, *rest,
                     bb, nx, mm=None):
    """Fused pair BACKWARD: one kernel recomputes both layers' forward
    intermediates, differentiates the gate combine in VMEM, and runs both
    layers' backward math — inputs stream once instead of twice, no gn/ln
    stash traffic, one launch instead of two plus XLA glue.

    VMEM liveness: the two layers' saved intermediates never coexist. The
    gate layer's forward runs FIRST with its intermediates dropped (only
    the small normalized output gn survives), the main layer is then
    recomputed + backpropped, and the gate layer is recomputed a second
    time for its own backward — one extra forward's FLOPs (the kernel is
    bandwidth-bound; recompute is the cheap axis) for a peak working set
    of ~one single-layer backward instead of two."""
    wg_refs, wl_refs = rest[:12], rest[12:24]
    g_ref = rest[24]
    dh_ref = rest[25]
    dw_refs = rest[26:]  # 24 grads: gate 12 then layer 12
    Wg = tuple(r[...] for r in wg_refs)
    Wl = tuple(r[...] for r in wl_refs)
    h, u, px, v = h_ref[...], u_ref[...], px_ref[...], v_ref[...]
    E, G, A = E_ref[...], G_ref[...], A_ref[...]
    g = g_ref[...]

    # pass 1: gate forward, intermediates dropped — only gn/rs_g kept
    og, _ = _forward_math(h, u, px, v, E, G, A, Wg, False, False,
                          bb, nx, mm=mm)
    gn, rs_g = _instnorm(og, bb, nx)
    tau = jax.nn.sigmoid(gn)

    # pass 2: main layer forward + backward (saved_l live only here)
    ol, saved_l = _forward_math(h, u, px, v, E, G, A, Wl, False, False,
                                bb, nx, mm=mm)
    ln, rs_l = _instnorm(ol, bb, nx)
    # combine h' = (1-tau)*h + tau*swish(ln)
    dln = g * tau * _dswish(ln)
    dgn = g * (_swish(ln) - h) * tau * (1.0 - tau)
    dxo_l = _instnorm_bwd(dln, ln, rs_l, bb, nx)
    dh_l, dwl = _layer_bwd_math(dxo_l, h, u, px, v, E, G, A, Wl, saved_l,
                                False, False, bb, nx, mm=mm)

    # pass 3: gate forward again + backward (saved_g live only here)
    og2, saved_g = _forward_math(h, u, px, v, E, G, A, Wg, False, False,
                                 bb, nx, mm=mm)
    dxo_g = _instnorm_bwd(dgn, gn, rs_g, bb, nx)
    dh_g, dwg = _layer_bwd_math(dxo_g, h, u, px, v, E, G, A, Wg, saved_g,
                                False, False, bb, nx, mm=mm)

    dh_ref[...] = g * (1.0 - tau) + dh_g + dh_l

    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        for ref in dw_refs:
            ref[...] = jnp.zeros(ref.shape, ref.dtype)

    for ref, val in zip(dw_refs, dwg + dwl):
        ref[...] += val


def _spec_full(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, nd=nd: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _spec_rows(rows, shape_tail):
    """Batch-block of bb elements stored as stacked rows [bb*rows, ...]:
    block b covers rows [b*bb*rows, (b+1)*bb*rows)."""
    nd = len(shape_tail)
    return pl.BlockSpec((rows,) + shape_tail,
                        lambda b, nd=nd: (b,) + (0,) * nd,
                        memory_space=pltpu.VMEM)


def _pick_bb(B, nx, K, H, dtw, V, backward, pair=False):
    """Largest divisor of B (capped at 8) whose per-grid-step working set
    fits VMEM — iterates the actual divisors so batch sizes like 5/10/20
    get their best blocking rather than falling through a fixed list.

    Mosaic requires the block's second-to-last dim (our bb*nx row count)
    to be a multiple of 8 unless the block spans the whole array, so only
    such bb are admissible. Returns 0 when NO admissible divisor fits —
    callers must fall back to the XLA path (auto mode gates on this via
    ``pallas_feasible``).

    MSMP_PALLAS_VMEM_BUDGET_MB overrides the 10 MB estimate budget — pair
    it with XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=<larger> to A/B
    bigger batch blocks (fewer sequential grid steps) against the default
    16 MB scoped-VMEM compile limit."""
    import os

    budget = int(float(os.environ.get("MSMP_PALLAS_VMEM_BUDGET_MB", "10"))
                 * 2**20)
    for bb in range(min(B, 8), 0, -1):
        if B % bb:
            continue
        if (bb * nx) % 8 and bb != B:
            continue
        if vmem_estimate(nx, K, H, dtw, V, bb, backward, pair) <= budget:
            return bb
    return 0


def pallas_feasible(B, nx, K, H, dtw, V, pair=False, fwd_only=False):
    """True when the fused kernels (fwd AND bwd) have an admissible batch
    blocking at these shapes. The pair's backward runs through the single-
    layer backward kernels, so its feasibility is the single-layer one.

    fwd_only: inference/serving never lowers the backward, so shapes where
    only the forward blocking fits should still take the fused kernel
    instead of falling back to the slower XLA path."""
    if _pick_bb(B, nx, K, H, dtw, V, backward=False, pair=pair) == 0:
        return False
    return fwd_only or _pick_bb(B, nx, K, H, dtw, V, backward=True) > 0


def _flatten2d(x):
    # [B, nx, D] -> [B*nx, D]: batch elements as stacked row blocks, done
    # OUTSIDE the kernel so every in-kernel operand is 2-D.
    return x.reshape(-1, x.shape[-1])


def _require_bb(bb, what):
    if bb == 0:
        raise ValueError(
            f"no admissible Pallas batch blocking for {what} (rows must be "
            "a multiple of 8 and fit VMEM); use mp_impl=xla or auto"
        )
    return bb


def _parse_mm(mm_dtype: str):
    """mm_dtype -> (matmul operand dtype or None, storage flag).

    "bfloat16s" is STORAGE mode: kernel inputs (h/u/px/v/E/G/A) and weights
    are pre-cast to bf16 OUTSIDE the kernel, so they arrive in native bf16
    tiling and the in-kernel ``astype`` is a no-op — only the intermediate
    activations still cast before their matmuls. This removes 19 Mosaic
    f32->bf16 relayouts per kernel vs plain "bfloat16" (the measured reason
    bf16 operands lost to f32 at these shapes, NOTES_ROUND3.md)."""
    if mm_dtype == "float32":
        return None, False
    if mm_dtype == "bfloat16":
        return jnp.dtype(jnp.bfloat16), False
    if mm_dtype == "bfloat16s":
        return jnp.dtype(jnp.bfloat16), True
    raise ValueError(f"unknown mp_precision {mm_dtype!r}")


_BIAS_IDX = frozenset((5, 7, 9, 11))  # b1/b2/b3/b4 in the 12-tuple


def _cast_w(W):
    """Cast the weight MATRICES to bf16; biases stay f32 — they are added,
    never matmul'd, so casting them costs accuracy and buys no MXU pass."""
    return tuple(w if i in _BIAS_IDX else w.astype(jnp.bfloat16)
                 for i, w in enumerate(W))


def _cast_tree(storage, h, u, px, v, E, G, A, *Ws):
    """Storage-mode pre-cast of kernel inputs and weight tuples."""
    if not storage:
        return (h, u, px, v, E, G, A) + Ws
    cast = lambda a: a.astype(jnp.bfloat16)
    return tuple(map(cast, (h, u, px, v, E, G, A))) + tuple(
        _cast_w(W) for W in Ws)


def _layer_bwd_call(h, u, px, v, ega, W, g, *, final_act, residual,
                    interpret, mm, storage=False):
    """Single-layer backward pallas_call: g is the cotangent of the layer's
    normalized output; returns (dh, 12 weight grads in param shapes).
    Module-level so the fused PAIR's VJP can reuse it per layer."""
    B, nx, H = h.shape
    E, G, A = ega
    h, u, px, v, E, G, A, W = _cast_tree(storage, h, u, px, v, E, G, A, W)
    K = E.shape[0] // nx
    bb = _require_bb(
        _pick_bb(B, nx, K, H, u.shape[-1], v.shape[-1], backward=True),
        "layer backward")
    kernel = functools.partial(
        _bwd_kernel, final_act=final_act, residual=residual,
        bb=bb, nx=nx, mm=mm,
    )
    out_shapes = [jax.ShapeDtypeStruct((B * nx, H), g.dtype)] + [
        jax.ShapeDtypeStruct(_grad_shape(w.shape), jnp.float32) for w in W
    ]
    out_specs = [_spec_rows(bb * nx, (H,))] + [
        _spec_full(_grad_shape(w.shape)) for w in W
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[
            _spec_rows(bb * nx, h.shape[2:]),
            _spec_rows(bb * nx, u.shape[2:]),
            _spec_rows(bb * nx, px.shape[2:]),
            _spec_rows(bb * nx, v.shape[2:]),
            _spec_full(E.shape),
            _spec_full(G.shape),
            _spec_full(A.shape),
        ]
        + [_spec_full(w.shape) for w in W]
        + [_spec_rows(bb * nx, (H,))],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(_flatten2d(h), _flatten2d(u), _flatten2d(px), _flatten2d(v), E, G, A,
      *W, _flatten2d(g))
    dh, dws = outs[0].reshape(B, nx, H), outs[1:]
    # biases were computed as [1, H]; restore param shapes
    dws = tuple(dw.reshape(w.shape) for dw, w in zip(dws, W))
    return dh, dws


@functools.lru_cache(maxsize=None)
def make_fused_layer(final_act: bool, residual: bool, interpret: bool,
                     mm_dtype: str = "float32"):
    """Build the custom-VJP fused layer for a static config.

    Signature: f(h [B,nx,H], u [B,nx,dtw], px [B,nx,1], v [B,nx,V],
                 ega=(E,G,A), W=12-tuple) -> [B,nx,H].

    ``mm_dtype="bfloat16"`` runs every matmul with bf16 operands and f32
    accumulation (one MXU pass; activations, norm statistics, and weight-
    gradient accumulation stay f32). The 0/1 gather matrices are exact in
    bf16; the masked-mean 1/deg entries round at bf16 ulp (2^-8), the same
    order as the operand rounding itself. ``"bfloat16s"`` additionally
    pre-casts the kernel inputs/weights outside the kernel (see _parse_mm).
    """
    mm, storage = _parse_mm(mm_dtype)

    def _run_fwd(h, u, px, v, ega, W):
        B, nx, H = h.shape
        out_dtype = h.dtype
        E, G, A = ega
        h, u, px, v, E, G, A, W = _cast_tree(storage, h, u, px, v, E, G, A, W)
        K = E.shape[0] // nx
        bb = _require_bb(
            _pick_bb(B, nx, K, H, u.shape[-1], v.shape[-1], backward=False),
            "layer forward")
        kernel = functools.partial(
            _fwd_kernel, final_act=final_act, residual=residual,
            bb=bb, nx=nx, mm=mm,
        )
        out = pl.pallas_call(
            kernel,
            grid=(B // bb,),
            in_specs=[
                _spec_rows(bb * nx, h.shape[2:]),
                _spec_rows(bb * nx, u.shape[2:]),
                _spec_rows(bb * nx, px.shape[2:]),
                _spec_rows(bb * nx, v.shape[2:]),
                _spec_full(E.shape),
                _spec_full(G.shape),
                _spec_full(A.shape),
            ] + [_spec_full(w.shape) for w in W],
            out_specs=_spec_rows(bb * nx, (H,)),
            out_shape=jax.ShapeDtypeStruct((B * nx, H), out_dtype),
            interpret=interpret,
        )(_flatten2d(h), _flatten2d(u), _flatten2d(px), _flatten2d(v),
          E, G, A, *W)
        return out.reshape(B, nx, H)

    @jax.custom_vjp
    def fused(h, u, px, v, ega, W):
        return _run_fwd(h, u, px, v, ega, W)

    def fwd(h, u, px, v, ega, W):
        return _run_fwd(h, u, px, v, ega, W), (h, u, px, v, ega, W)

    def bwd(res, g):
        h, u, px, v, ega, W = res
        dh, dws = _layer_bwd_call(h, u, px, v, ega, W, g,
                                  final_act=final_act, residual=residual,
                                  interpret=interpret, mm=mm,
                                  storage=storage)
        zeros = lambda t: jax.tree.map(jnp.zeros_like, t)
        return (dh, zeros(u), zeros(px), zeros(v), zeros(ega), dws)

    fused.defvjp(fwd, bwd)
    return fused


def _grad_shape(shape):
    """Weight-grad buffer shapes: biases [H] are accumulated as [1, H]
    (TPU needs >=2-D); matrices keep their shape."""
    return (1,) + shape if len(shape) == 1 else shape


def _pair_bwd_bb(B, nx, K, H, dtw, V):
    """Batch block for the fused pair backward (0 = doesn't fit -> the
    two-single-kernel fallback). "seq": the kernel's recompute ordering
    keeps one layer's intermediates live at a time."""
    return _pick_bb(B, nx, K, H, dtw, V, backward=True, pair="seq")


def _pair_bwd_call(h, u, px, v, ega, Wg, Wl, g, *, bb, interpret, mm,
                   storage=False):
    """Fused pair backward pallas_call: one kernel for both layers + the
    combine backward. Returns (dh, gate 12-tuple grads, layer 12-tuple)."""
    B, nx, H = h.shape
    E, G, A = ega
    h, u, px, v, E, G, A, Wg, Wl = _cast_tree(
        storage, h, u, px, v, E, G, A, Wg, Wl)
    kernel = functools.partial(_pair_bwd_kernel, bb=bb, nx=nx, mm=mm)
    out_shapes = [jax.ShapeDtypeStruct((B * nx, H), g.dtype)] + [
        jax.ShapeDtypeStruct(_grad_shape(w.shape), jnp.float32)
        for w in Wg + Wl
    ]
    out_specs = [_spec_rows(bb * nx, (H,))] + [
        _spec_full(_grad_shape(w.shape)) for w in Wg + Wl
    ]
    outs = pl.pallas_call(
        kernel,
        grid=(B // bb,),
        in_specs=[
            _spec_rows(bb * nx, h.shape[2:]),
            _spec_rows(bb * nx, u.shape[2:]),
            _spec_rows(bb * nx, px.shape[2:]),
            _spec_rows(bb * nx, v.shape[2:]),
            _spec_full(E.shape),
            _spec_full(G.shape),
            _spec_full(A.shape),
        ]
        + [_spec_full(w.shape) for w in Wg]
        + [_spec_full(w.shape) for w in Wl]
        + [_spec_rows(bb * nx, (H,))],
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        interpret=interpret,
    )(_flatten2d(h), _flatten2d(u), _flatten2d(px), _flatten2d(v), E, G, A,
      *Wg, *Wl, _flatten2d(g))
    dh = outs[0].reshape(B, nx, H)
    dws = tuple(dw.reshape(w.shape) for dw, w in zip(outs[1:], Wg + Wl))
    return dh, dws[:12], dws[12:]


@functools.lru_cache(maxsize=None)
def make_fused_pair(interpret: bool, mm_dtype: str = "float32"):
    """Build the custom-VJP fused gated PAIR for a static config.

    Signature: f(h, u, px, v, ega=(E,G,A), Wg, Wl) -> [B,nx,H] where Wg/Wl
    are the gate/main GNN_LayerLin 12-tuples. Both layers are LayerLin
    (final_act=False, residual=False — the gated configuration,
    models_gnn.py:1220-1377); the gate combine is fused in VMEM.

    Backward: ONE fused kernel recomputes both layers' intermediates and
    differentiates the combine in VMEM (inputs stream once, no gn/ln stash
    traffic) whenever its ~2x working set has an admissible batch block;
    otherwise the forward stashes gn/ln and the VJP falls back to the
    combine backward in XLA + the single-layer backward kernel per layer.
    The choice is static per shapes, made from the same vmem_estimate that
    picks the blocks.
    """
    mm, storage = _parse_mm(mm_dtype)

    def _run_fwd(h, u, px, v, ega, Wg, Wl, stash):
        B, nx, H = h.shape
        out_dtype = h.dtype
        E, G, A = ega
        h, u, px, v, E, G, A, Wg, Wl = _cast_tree(
            storage, h, u, px, v, E, G, A, Wg, Wl)
        K = E.shape[0] // nx
        bb = _require_bb(
            _pick_bb(B, nx, K, H, u.shape[-1], v.shape[-1], backward=False,
                     pair=True),
            "pair forward")
        kernel = functools.partial(_pair_fwd_kernel, bb=bb, nx=nx,
                                   stash=stash, mm=mm)
        row_spec = _spec_rows(bb * nx, (H,))
        row_shape = jax.ShapeDtypeStruct((B * nx, H), out_dtype)
        n_out = 3 if stash else 1
        outs = pl.pallas_call(
            kernel,
            grid=(B // bb,),
            in_specs=[
                _spec_rows(bb * nx, h.shape[2:]),
                _spec_rows(bb * nx, u.shape[2:]),
                _spec_rows(bb * nx, px.shape[2:]),
                _spec_rows(bb * nx, v.shape[2:]),
                _spec_full(E.shape),
                _spec_full(G.shape),
                _spec_full(A.shape),
            ]
            + [_spec_full(w.shape) for w in Wg]
            + [_spec_full(w.shape) for w in Wl],
            out_specs=(row_spec,) * n_out,
            out_shape=(row_shape,) * n_out,
            interpret=interpret,
        )(_flatten2d(h), _flatten2d(u), _flatten2d(px), _flatten2d(v),
          E, G, A, *Wg, *Wl)
        reshape = lambda x: x.reshape(B, nx, H)
        if stash:
            return reshape(outs[0]), reshape(outs[1]), reshape(outs[2])
        return reshape(outs[0]), None, None

    def _bwd_blocking(h, u, v, ega):
        B, nx, H = h.shape
        K = ega[0].shape[0] // nx
        return _pair_bwd_bb(B, nx, K, H, u.shape[-1], v.shape[-1])

    @jax.custom_vjp
    def fused(h, u, px, v, ega, Wg, Wl):
        out, _, _ = _run_fwd(h, u, px, v, ega, Wg, Wl, stash=False)
        return out

    def fwd(h, u, px, v, ega, Wg, Wl):
        # stash gn/ln only when the fused pair backward can't run
        stash = _bwd_blocking(h, u, v, ega) == 0
        out, gn, ln = _run_fwd(h, u, px, v, ega, Wg, Wl, stash=stash)
        return out, (h, u, px, v, ega, Wg, Wl, gn, ln)

    def bwd(res, g):
        h, u, px, v, ega, Wg, Wl, gn, ln = res
        zeros = lambda t: jax.tree.map(jnp.zeros_like, t)
        bb = _bwd_blocking(h, u, v, ega)
        if bb > 0:
            dh, dwg, dwl = _pair_bwd_call(
                h, u, px, v, ega, Wg, Wl, g, bb=bb, interpret=interpret,
                mm=mm, storage=storage,
            )
            return (dh, zeros(u), zeros(px), zeros(v), zeros(ega), dwg, dwl)
        # fallback: combine backward in XLA + single-layer kernels
        # (h' = (1-tau)*h + tau*swish(ln), tau = sigmoid(gn))
        tau = jax.nn.sigmoid(gn)
        dgn = g * (_swish(ln) - h) * tau * (1.0 - tau)
        dln = g * tau * _dswish(ln)
        dh_g, dwg = _layer_bwd_call(h, u, px, v, ega, Wg, dgn,
                                    final_act=False, residual=False,
                                    interpret=interpret, mm=mm,
                                    storage=storage)
        dh_l, dwl = _layer_bwd_call(h, u, px, v, ega, Wl, dln,
                                    final_act=False, residual=False,
                                    interpret=interpret, mm=mm,
                                    storage=storage)
        dh = g * (1.0 - tau) + dh_g + dh_l
        return (dh, zeros(u), zeros(px), zeros(v), zeros(ega), dwg, dwl)

    fused.defvjp(fwd, bwd)
    return fused


def fused_gated_pair(h, u, px, v, ega, Wg, Wl, *, interpret: bool = False,
                     mm_dtype: str = "float32"):
    """Apply the fused gated layer+gate pair; biases may be 1-D."""
    to2d = lambda W: tuple(w[None] if w.ndim == 1 else w for w in W)
    return make_fused_pair(interpret, mm_dtype)(
        h, u, px, v, tuple(ega), to2d(Wg), to2d(Wl)
    )


def fused_mp_layer(h, u, px, v, ega, W, *, final_act: bool, residual: bool,
                   interpret: bool = False, mm_dtype: str = "float32"):
    """Apply the fused layer; biases in W may be 1-D (reshaped to [1,H])."""
    W2d = tuple(w[None] if w.ndim == 1 else w for w in W)
    out = make_fused_layer(final_act, residual, interpret, mm_dtype)(
        h, u, px, v, tuple(ega), W2d
    )
    return out


def vmem_estimate(nx: int, K: int, H: int, dtw: int, V: int,
                  bb: int = 1, backward: bool = True,
                  pair=False) -> int:
    """Rough per-grid-step VMEM footprint in bytes (f32): edge tensors
    dominate; used to gate the pallas path on large shapes and to pick the
    batch-block size. ``pair=True`` doubles the per-layer buffers (the
    fused pair FORWARD keeps both layers' intermediates resident);
    ``pair="seq"`` is the fused pair BACKWARD, whose recompute ordering
    keeps only ONE layer's intermediates live at a time (_pair_bwd_kernel)
    — a single layer's backward set plus both weight sets and a handful of
    combine-term node buffers."""
    edges = nx * K
    n_edge = 8 if backward else 4        # m0/m1/z2/m2 (+ grads in bwd)
    lay = 2 if pair is True else 1
    edge_bufs = lay * n_edge * bb * edges * H
    node_bufs = lay * (14 if backward else 10) * bb * nx * H
    mats = 2 * edges * nx + nx * edges   # E, G, A
    w_one = 2 * H * H + (2 * H + V) * H + H * H + (dtw + 1 + V) * H
    w_lay = 2 if (pair == "seq" or pair is True) else 1
    weights = w_lay * (2 if backward else 1) * w_one
    extra = 6 * bb * nx * H if pair == "seq" else 0  # gn/tau/dgn/dh_l/...
    return 4 * (edge_bufs + node_bufs + mats + weights + extra
                + bb * nx * (dtw + V + 1))
