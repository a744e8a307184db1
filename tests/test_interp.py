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
