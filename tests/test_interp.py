"""interp1d tests (vs numpy oracle + reference edge-clamp semantics)."""
import numpy as np
import jax.numpy as jnp

from msmp_pde_tpu.ops.interp import interp1d


def test_matches_numpy_interp_inside_domain():
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0, 16, 50))
    y = rng.normal(size=50)
    t = rng.uniform(x[0], x[-1], 200)
    got = np.asarray(interp1d(jnp.asarray(x), jnp.asarray(y), jnp.asarray(t)))
    want = np.interp(t, x, y)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_edge_clamping():
    """mask=True clamps out-of-range queries to the edge values
    (reference common/utils.py:27-31)."""
    x = jnp.asarray(np.linspace(0, 1, 10))
    y = jnp.asarray(np.linspace(2, 3, 10))
    t = jnp.asarray([-5.0, 0.0, 1.0, 7.0])
    got = np.asarray(interp1d(x, y, t))
    np.testing.assert_allclose(got, [2.0, 2.0, 3.0, 3.0], atol=1e-12)


def test_batched_rows():
    rng = np.random.default_rng(1)
    x = np.sort(rng.uniform(0, 1, (4, 20)), axis=1)
    y = rng.normal(size=(4, 20))
    t = rng.uniform(0.05, 0.95, (4, 33))
    got = np.asarray(interp1d(jnp.asarray(x), jnp.asarray(y), jnp.asarray(t)))
    for b in range(4):
        np.testing.assert_allclose(got[b], np.interp(t[b], x[b], y[b]),
                                   rtol=1e-10)


def test_interp_matrix_matches_interp1d():
    """W @ y must equal interp1d(x, y, t) exactly (same math, f64), for
    in-range and out-of-range queries and both mask modes."""
    from msmp_pde_tpu.ops.interp import interp_matrix

    rng = np.random.default_rng(7)
    x = np.sort(rng.uniform(0, 16, 64))
    t = np.concatenate([rng.uniform(-2, 18, 90), [x[0], x[-1]]])
    y = rng.normal(size=64)
    for mask in (True, False):
        w = np.asarray(interp_matrix(jnp.asarray(x), jnp.asarray(t),
                                     mask=mask))
        got = w @ y
        want = np.asarray(interp1d(jnp.asarray(x), jnp.asarray(y),
                                   jnp.asarray(t), mask=mask))
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)
    # rows are convex combinations under mask=True
    w = np.asarray(interp_matrix(jnp.asarray(x), jnp.asarray(t)))
    np.testing.assert_allclose(w.sum(1), 1.0, atol=1e-12)
    assert (w >= 0).all()


def test_fno2d_unstructured_identity_grid():
    """With x_coords == the uniform grid the resampling operator is the
    identity, so the unstructured model must reproduce the structured
    forward bit-for-bit (same params)."""
    import jax
    from msmp_pde_tpu.models.fno import FNO2d

    B, tw, nx = 2, 5, 40
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(B, tw, 2, nx)).astype(np.float32))
    var = jnp.asarray(rng.normal(size=(B, 2)).astype(np.float32))
    uniform = jnp.linspace(0.0, 16.0, nx, dtype=jnp.float32)
    kw = dict(tw=tw, modes=8, width=32, domain=(0.0, 16.0),
              eq_var_names=("a", "b"))
    m_s = FNO2d(**kw, unstructured=False)
    m_u = FNO2d(**kw, unstructured=True)
    params = m_s.init(jax.random.PRNGKey(0), u, var)
    out_s = m_s.apply(params, u, var)
    out_u = m_u.apply(params, u, var, uniform)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_s),
                               rtol=1e-6, atol=1e-6)
