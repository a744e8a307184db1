"""Fused Pallas TPU kernel for the LEM recurrent scan.

The torch reference's ONE hand-written native kernel is ``lem_cuda``
(/root/reference/experiments/models_gnn.py:283-302): a fused
forward+backward of the LEM cell over the temporal-bundling window. This is
its TPU-native equivalent. The input projections (the large MXU-friendly
[T*N, I] matmuls) stay in XLA (models/lem.py); the kernel fuses the
*sequential* part — per step, two recurrent matmuls plus the gate
arithmetic — keeping the (y, z) carry in VMEM across all T steps instead of
round-tripping HBM 2T times as the unrolled XLA scan does. Profiling showed
the two LEM scans are ~40% of the MSMP-PDE train step.

Layout: rows = B*nx node-samples, tiled R at a time (grid dim 0); time is
grid dim 1, minor, so the carry scratch persists across the T sweep of each
tile. The backward is a true BPTT kernel: the forward stashes the per-step
(y_t, z_t) states to HBM; the backward streams them in reverse, carrying
(dy, dz) in VMEM and accumulating the recurrent-weight gradients on-chip —
the same structure as the CUDA kernel's saved-activation backward.

Cell equations and parameter layout: models/lem.py (Rusch et al. LEM).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS_FWD = 1024  # row-tile sizes: fewer, larger sequential grid steps
ROWS_BWD = 512   # the backward streams ~2x the arrays -> smaller tile


def _sig(x):
    return jax.nn.sigmoid(x)


def _fwd_kernel(gx, zx, y0, z0, wy, wzz, yT, zT, *rest, T, H, dt,
                stash: bool):
    if stash:
        ys, zs, y_s, z_s = rest
    else:
        y_s, z_s = rest
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        y_s[...] = y0[...]
        z_s[...] = z0[...]

    g = gx[0] + jnp.dot(y_s[...], wy[...], preferred_element_type=jnp.float32)
    g1, g2, zc = g[:, :H], g[:, H : 2 * H], g[:, 2 * H :]
    dt1 = dt * _sig(g1)
    dt2 = dt * _sig(g2)
    z_new = (1.0 - dt1) * z_s[...] + dt1 * jnp.tanh(zc)
    a = zx[0] + jnp.dot(z_new, wzz[...], preferred_element_type=jnp.float32)
    y_new = (1.0 - dt2) * y_s[...] + dt2 * jnp.tanh(a)
    y_s[...] = y_new
    z_s[...] = z_new
    if stash:
        ys[0] = y_new
        zs[0] = z_new

    @pl.when(t == T - 1)
    def _():
        yT[...] = y_new
        zT[...] = z_new


def _bwd_kernel(gx, zx, y0, z0, wy, wzz, ysp, zsp, zsc, dyT, dzT,
                dgx, dzx, dy0, dz0, dwy, dwzz, dy_s, dz_s, *, T, H, dt):
    i = pl.program_id(0)
    t = pl.program_id(1)
    tr = T - 1 - t  # actual timestep this iteration handles

    @pl.when(jnp.logical_and(i == 0, t == 0))
    def _():
        dwy[...] = jnp.zeros(dwy.shape, dwy.dtype)
        dwzz[...] = jnp.zeros(dwzz.shape, dwzz.dtype)

    @pl.when(t == 0)
    def _():
        dy_s[...] = dyT[...]
        dz_s[...] = dzT[...]

    first = tr == 0
    y_prev = jnp.where(first, y0[...], ysp[0])
    z_prev = jnp.where(first, z0[...], zsp[0])
    z_cur = zsc[0]

    # recompute the step's activations from the stashed states
    g = gx[0] + jnp.dot(y_prev, wy[...], preferred_element_type=jnp.float32)
    g1, g2, zc = g[:, :H], g[:, H : 2 * H], g[:, 2 * H :]
    s1, s2 = _sig(g1), _sig(g2)
    dt1, dt2 = dt * s1, dt * s2
    th_zc = jnp.tanh(zc)
    a = zx[0] + jnp.dot(z_cur, wzz[...], preferred_element_type=jnp.float32)
    th_a = jnp.tanh(a)

    dy_t = dy_s[...]
    dz_t = dz_s[...]
    # y_t = (1-dt2) y_prev + dt2 tanh(a)
    da = dy_t * dt2 * (1.0 - th_a * th_a)
    dg2 = dy_t * (th_a - y_prev) * dt * s2 * (1.0 - s2)
    # a = zx + z_cur @ wzz
    dz_t = dz_t + jax.lax.dot_general(
        da, wzz[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwzz[...] += jax.lax.dot_general(
        z_cur, da, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dzx[0] = da
    # z_t = (1-dt1) z_prev + dt1 tanh(zc)
    dg1 = dz_t * (th_zc - z_prev) * dt * s1 * (1.0 - s1)
    dzc = dz_t * dt1 * (1.0 - th_zc * th_zc)
    dz_prev = dz_t * (1.0 - dt1)
    dg = jnp.concatenate([dg1, dg2, dzc], axis=1)  # [R, 3H]
    dgx[0] = dg
    dy_prev = dy_t * (1.0 - dt2) + jax.lax.dot_general(
        dg, wy[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwy[...] += jax.lax.dot_general(
        y_prev, dg, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dy_s[...] = dy_prev
    dz_s[...] = dz_prev

    @pl.when(t == T - 1)
    def _():
        dy0[...] = dy_prev
        dz0[...] = dz_prev


def _row(rows, shape_tail):
    """Block over the row-tile axis: [N, ...] -> (rows, ...) at tile i."""
    return pl.BlockSpec((rows,) + shape_tail,
                        lambda i, t: (i,) + (0,) * len(shape_tail),
                        memory_space=pltpu.VMEM)


def _timed(rows, shape_tail, T=None):
    """Block over (time, row-tile): [T, N, ...] -> (1, rows, ...);
    with T given, time runs reversed (backward sweep)."""
    if T is not None:
        def imap(i, t, T=T):
            return (T - 1 - t, i, 0)
    else:
        def imap(i, t):
            return (t, i, 0)

    return pl.BlockSpec((1, rows) + shape_tail, imap,
                        memory_space=pltpu.VMEM)


def _timed_prev(rows, shape_tail, T):
    """Like _timed(T) but one step earlier (clamped at 0)."""
    def imap(i, t, T=T):
        tr = T - 1 - t
        return (jnp.maximum(tr - 1, 0), i, 0)

    return pl.BlockSpec((1, rows) + shape_tail, imap,
                        memory_space=pltpu.VMEM)


def _full(shape):
    return pl.BlockSpec(shape, lambda i, t: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def make_lem_scan(dt: float, interpret: bool, rows_fwd: int = ROWS_FWD,
                  rows_bwd: int = ROWS_BWD):
    """custom-VJP LEM scan: (gx [T,N,3H], zx [T,N,H], y0, z0 [N,H],
    wy [H,3H], wzz [H,H]) -> (y_T, z_T). N must be a multiple of the row
    tiles (lem_scan pads). The primal (no-grad) path runs a stash-free
    kernel — no [T,N,H] state writes to HBM; under AD, the fwd stashes
    per-step states for the true-BPTT backward."""

    def _run_fwd(gx, zx, y0, z0, wy, wzz, stash):
        T, N, H3 = gx.shape
        H = H3 // 3
        R = min(rows_fwd, N)
        kern = functools.partial(_fwd_kernel, T=T, H=H, dt=dt, stash=stash)
        f32 = jnp.float32
        out_specs = [_row(R, (H,)), _row(R, (H,))]
        out_shape = [
            jax.ShapeDtypeStruct((N, H), f32),
            jax.ShapeDtypeStruct((N, H), f32),
        ]
        if stash:
            out_specs += [_timed(R, (H,)), _timed(R, (H,))]
            out_shape += [
                jax.ShapeDtypeStruct((T, N, H), f32),
                jax.ShapeDtypeStruct((T, N, H), f32),
            ]
        return pl.pallas_call(
            kern,
            grid=(N // R, T),
            in_specs=[
                _timed(R, (3 * H,)),                # gx
                _timed(R, (H,)),                    # zx
                _row(R, (H,)), _row(R, (H,)),       # y0, z0
                _full((H, 3 * H)), _full((H, H)),
            ],
            out_specs=tuple(out_specs),
            out_shape=tuple(out_shape),
            scratch_shapes=[
                pltpu.VMEM((R, H), f32), pltpu.VMEM((R, H), f32),
            ],
            interpret=interpret,
        )(gx, zx, y0, z0, wy, wzz)

    def _run_bwd(res, dyT, dzT):
        gx, zx, y0, z0, wy, wzz, ys, zs = res
        T, N, H3 = gx.shape
        H = H3 // 3
        R = min(rows_bwd, N)
        kern = functools.partial(_bwd_kernel, T=T, H=H, dt=dt)
        f32 = jnp.float32
        return pl.pallas_call(
            kern,
            grid=(N // R, T),
            in_specs=[
                _timed(R, (3 * H,), T),             # gx at tr
                _timed(R, (H,), T),                 # zx at tr
                _row(R, (H,)), _row(R, (H,)),       # y0, z0
                _full((H, 3 * H)), _full((H, H)),
                _timed_prev(R, (H,), T),            # ys at tr-1
                _timed_prev(R, (H,), T),            # zs at tr-1
                _timed(R, (H,), T),                 # zs at tr
                _row(R, (H,)), _row(R, (H,)),       # dyT, dzT
            ],
            out_specs=(
                _timed(R, (3 * H,), T),             # dgx
                _timed(R, (H,), T),                 # dzx
                _row(R, (H,)), _row(R, (H,)),       # dy0, dz0
                _full((H, 3 * H)), _full((H, H)),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((T, N, 3 * H), f32),
                jax.ShapeDtypeStruct((T, N, H), f32),
                jax.ShapeDtypeStruct((N, H), f32),
                jax.ShapeDtypeStruct((N, H), f32),
                jax.ShapeDtypeStruct((H, 3 * H), f32),
                jax.ShapeDtypeStruct((H, H), f32),
            ),
            scratch_shapes=[
                pltpu.VMEM((R, H), f32), pltpu.VMEM((R, H), f32),
            ],
            interpret=interpret,
        )(gx, zx, y0, z0, wy, wzz, ys, zs, zs, dyT, dzT)

    @jax.custom_vjp
    def scan(gx, zx, y0, z0, wy, wzz):
        yT, zT = _run_fwd(gx, zx, y0, z0, wy, wzz, stash=False)
        return yT, zT

    def fwd(gx, zx, y0, z0, wy, wzz):
        yT, zT, ys, zs = _run_fwd(gx, zx, y0, z0, wy, wzz, stash=True)
        return (yT, zT), (gx, zx, y0, z0, wy, wzz, ys, zs)

    def bwd(res, cots):
        dyT, dzT = cots
        dgx, dzx, dy0, dz0, dwy, dwzz = _run_bwd(res, dyT, dzT)
        return dgx, dzx, dy0, dz0, dwy, dwzz

    scan.defvjp(fwd, bwd)
    return scan


def lem_scan(gx, zx, y0, z0, wy, wzz, *, dt: float = 1.0,
             interpret: bool = False, rows_fwd: int = ROWS_FWD,
             rows_bwd: int = ROWS_BWD):
    """Pad rows to the tile size and run the fused scan.

    gx [T, N, 3H] (input projection + bias, time-major), zx [T, N, H],
    y0/z0 [N, H], wy = W[:, I:].T [H, 3H], wzz = Wz[:, I:].T [H, H].
    Padded rows have zero cotangents, so weight grads are unaffected.
    """
    T, N, H3 = gx.shape
    # Both grids floor-divide the padded N by their own row tile, so the
    # padded N must be a multiple of BOTH tiles (lcm) — padding only to the
    # larger tile would silently drop row blocks in whichever pass uses the
    # smaller one (e.g. rows_fwd=768/rows_bwd=512 -> rows 512.. never
    # written in the backward).
    tile = math.lcm(rows_fwd, rows_bwd)
    pad = (-N) % tile
    if pad:
        rp = [(0, 0), (0, pad), (0, 0)]
        gx = jnp.pad(gx, rp)
        zx = jnp.pad(zx, rp)
        y0 = jnp.pad(y0, [(0, pad), (0, 0)])
        z0 = jnp.pad(z0, [(0, pad), (0, 0)])
    yT, zT = make_lem_scan(float(dt), interpret, rows_fwd,
                           rows_bwd)(gx, zx, y0, z0, wy, wzz)
    if pad:
        yT, zT = yT[:N], zT[:N]
    return yT, zT
