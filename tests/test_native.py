"""Native preprocessing library: bit-parity with the numpy fallbacks."""
import numpy as np
import pytest

from msmp_pde_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built / no g++"
)


def _numpy_avg(u, ratio, pad):
    if pad == "periodic":
        left, right = u[..., -3:-1], u[..., 1:3]
    else:
        left, right = np.zeros_like(u[..., -3:-1]), np.zeros_like(u[..., 1:3])
    up = np.concatenate([left, u, right], axis=-1)
    n_out = u.shape[-1] // ratio
    idx = np.arange(n_out) * ratio
    out = np.zeros(u.shape[:-1] + (n_out,), u.dtype)
    for j in range(5):
        out += 0.2 * up[..., idx + j]
    return out


@pytest.mark.parametrize("pad", ["periodic", "zero"])
@pytest.mark.parametrize("ratio", [1, 2, 4])
def test_avg_downproject_parity(pad, ratio):
    rng = np.random.default_rng(0)
    u = rng.normal(size=(7, 13, 200))
    got = native.avg_downproject(u, ratio, pad)
    want = _numpy_avg(u, ratio, pad)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-14)


def test_mean_downproject_parity():
    rng = np.random.default_rng(1)
    u = rng.normal(size=(5, 200))
    got = native.mean_downproject(u, 2)
    idx = np.arange(100) * 2
    want = (u[..., idx] + u[..., idx + 1]) / 2
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-14)


def test_knn_parity():
    from msmp_pde_tpu.data.graph import build_neighbors_knn

    rng = np.random.default_rng(2)
    pts = rng.normal(size=(80, 2))
    got = native.knn_neighbors(pts, 3)
    want, _ = build_neighbors_knn(pts, 3)
    # same neighbor sets (order may differ on exact ties; none here)
    np.testing.assert_array_equal(np.sort(got, 1), np.sort(want, 1))
