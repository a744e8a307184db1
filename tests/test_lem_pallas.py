"""Exact-parity tests: fused Pallas LEM scan vs the XLA lax.scan path.

The Pallas kernel (ops/lem_pallas.py) is the TPU-native equivalent of the
reference's lem_cuda extension — same cell math, fused sequential scan with
a BPTT backward. Interpret mode on the CPU test mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmp_pde_tpu.models.lem import LEM


def _inputs(T=7, N=50, I=5, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(T, N, I)).astype(np.float32))


@pytest.mark.parametrize("N", [50, 512, 600])
def test_forward_parity(N):
    """Pallas scan == XLA scan for non-aligned, aligned and padded row
    counts (row tiling + zero padding must be invisible)."""
    seq = _inputs(N=N)
    m_x = LEM(hidden=32, impl="xla")
    m_p = LEM(hidden=32, impl="pallas")
    params = m_x.init(jax.random.PRNGKey(0), seq)
    y_x, (yx2, zx2) = m_x.apply(params, seq)
    y_p, (yp2, zp2) = m_p.apply(params, seq)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(zp2), np.asarray(zx2),
                               rtol=1e-5, atol=1e-6)


def test_nohoist_parity():
    """impl='nohoist' (in-step fused input projection, the CUDA kernel's
    layout) == impl='xla' (hoisted projection) for forward, final state and
    gradients — same params, same math up to matmul summation order."""
    seq = _inputs(T=9, N=60, I=5)
    m_x = LEM(hidden=32, impl="xla")
    m_n = LEM(hidden=32, impl="nohoist")
    params = m_x.init(jax.random.PRNGKey(0), seq)
    y_x, (yx2, zx2) = m_x.apply(params, seq)
    y_n, (yn2, zn2) = m_n.apply(params, seq)
    np.testing.assert_allclose(np.asarray(y_n), np.asarray(y_x),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(zn2), np.asarray(zx2),
                               rtol=1e-5, atol=1e-6)

    def loss(m):
        def f(p, s):
            y, _ = m.apply(p, s)
            return jnp.sum(y**2)

        return jax.grad(f, argnums=(0, 1))

    g_x, gs_x = loss(m_x)(params, seq)
    g_n, gs_n = loss(m_n)(params, seq)
    np.testing.assert_allclose(np.asarray(gs_n), np.asarray(gs_x),
                               rtol=1e-4, atol=1e-5)
    for k in g_x["params"]:
        np.testing.assert_allclose(
            np.asarray(g_n["params"][k]), np.asarray(g_x["params"][k]),
            rtol=1e-4, atol=1e-5, err_msg=k,
        )

    # stateful carry threads identically
    rng = np.random.default_rng(5)
    state = (jnp.asarray(rng.normal(size=(60, 32)).astype(np.float32)),
             jnp.asarray(rng.normal(size=(60, 32)).astype(np.float32)))
    y_x2, _ = m_x.apply(params, seq, state)
    y_n2, _ = m_n.apply(params, seq, state)
    np.testing.assert_allclose(np.asarray(y_n2), np.asarray(y_x2),
                               rtol=1e-5, atol=1e-6)


def test_forward_parity_with_state():
    """Stateful (Save*) path: a nonzero initial carry must thread through."""
    seq = _inputs()
    m_x = LEM(hidden=32, impl="xla")
    m_p = LEM(hidden=32, impl="pallas")
    params = m_x.init(jax.random.PRNGKey(0), seq)
    rng = np.random.default_rng(3)
    state = (jnp.asarray(rng.normal(size=(50, 32)).astype(np.float32)),
             jnp.asarray(rng.normal(size=(50, 32)).astype(np.float32)))
    y_x, s_x = m_x.apply(params, seq, state)
    y_p, s_p = m_p.apply(params, seq, state)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("rows_fwd,rows_bwd", [(24, 16), (16, 24)])
def test_mismatched_row_tiles(rows_fwd, rows_bwd):
    """lem_scan must pad rows to a multiple of BOTH grid tiles: with
    rows_fwd != rows_bwd and N between them (N=20), padding only to the
    larger tile makes the smaller-tile grid floor-divide to 1 block and
    silently skip real rows (garbage outputs/gradients, no error)."""
    from msmp_pde_tpu.ops import lem_pallas

    T, N, H = 4, 20, 8
    rng = np.random.default_rng(11)
    arrs = [rng.normal(size=s).astype(np.float32) for s in
            [(T, N, 3 * H), (T, N, H), (N, H), (N, H), (H, 3 * H), (H, H)]]
    gx, zx, y0, z0, wy, wzz = map(jnp.asarray, arrs)
    r1 = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))
    r2 = jnp.asarray(rng.normal(size=(N, H)).astype(np.float32))

    def loss(gx, zx, y0, z0, wy, wzz, **tiles):
        yT, zT = lem_pallas.lem_scan(gx, zx, y0, z0, wy, wzz, dt=0.1,
                                     interpret=True, **tiles)
        return jnp.sum(yT * r1) + jnp.sum(zT * r2), (yT, zT)

    args = (gx, zx, y0, z0, wy, wzz)
    (_, out_ref), g_ref = jax.value_and_grad(
        loss, argnums=tuple(range(6)), has_aux=True)(
            *args, rows_fwd=16, rows_bwd=16)
    (_, out), g = jax.value_and_grad(
        loss, argnums=tuple(range(6)), has_aux=True)(
            *args, rows_fwd=rows_fwd, rows_bwd=rows_bwd)

    for a, b in zip(out_ref, out):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(g_ref, g):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5)


def test_gradient_parity():
    """BPTT backward: gradients w.r.t. params, inputs and the initial state
    must match the XLA autodiff."""
    seq = _inputs(T=5, N=40)
    m_x = LEM(hidden=32, impl="xla")
    m_p = LEM(hidden=32, impl="pallas")
    params = m_x.init(jax.random.PRNGKey(0), seq)
    r1 = jnp.asarray(np.random.default_rng(7).normal(size=(40, 32)).astype(np.float32))
    r2 = jnp.asarray(np.random.default_rng(8).normal(size=(40, 32)).astype(np.float32))
    rng = np.random.default_rng(9)
    state = (jnp.asarray(rng.normal(size=(40, 32)).astype(np.float32)),
             jnp.asarray(rng.normal(size=(40, 32)).astype(np.float32)))

    def loss(p, s, st, model):
        y, (yl, zl) = model.apply(p, s, st)
        return jnp.sum(y * r1) + jnp.sum(zl * r2)

    gx = jax.grad(loss, argnums=(0, 1, 2))(params, seq, state, m_x)
    gp = jax.grad(loss, argnums=(0, 1, 2))(params, seq, state, m_p)

    def check(path, a, b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=1e-5, err_msg=str(path))

    jax.tree_util.tree_map_with_path(check, gx, gp)

def test_remat_parity():
    """impl='remat' / 'nohoist_remat' (scan step wrapped in jax.checkpoint:
    backward recomputes cell gates from the saved carries instead of
    stashing them) must match the non-remat impls for forward, state and
    gradients — remat changes the residual schedule, not the math."""
    seq = _inputs(T=9, N=60, I=5)
    m_x = LEM(hidden=32, impl="xla")
    params = m_x.init(jax.random.PRNGKey(0), seq)

    def loss_grads(m):
        def f(p, s):
            y, _ = m.apply(p, s)
            return jnp.sum(y**2)

        return jax.grad(f, argnums=(0, 1))(params, seq)

    y_ref, (_, z_ref) = m_x.apply(params, seq)
    g_ref, gs_ref = loss_grads(m_x)
    # T=9 exercises a non-trivial chunking (C=3) for nohoist_chunked, the
    # sqrt-checkpointed variant (carries saved at chunk boundaries only).
    for impl in ("remat", "nohoist_remat", "nohoist_chunked"):
        m_r = LEM(hidden=32, impl=impl)
        y_r, (_, z_r) = m_r.apply(params, seq)
        np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-6, err_msg=impl)
        np.testing.assert_allclose(np.asarray(z_r), np.asarray(z_ref),
                                   rtol=1e-5, atol=1e-6, err_msg=impl)
        g_r, gs_r = loss_grads(m_r)
        np.testing.assert_allclose(np.asarray(gs_r), np.asarray(gs_ref),
                                   rtol=1e-4, atol=1e-5, err_msg=impl)
        for k in g_ref["params"]:
            np.testing.assert_allclose(
                np.asarray(g_r["params"][k]), np.asarray(g_ref["params"][k]),
                rtol=1e-4, atol=1e-5, err_msg=f"{impl}:{k}",
            )
