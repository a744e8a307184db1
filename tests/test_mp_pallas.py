"""Exact-parity tests: fused Pallas MP layer vs the XLA reference path.

The Pallas kernel (ops/mp_pallas.py) must be a drop-in replacement for
models/gnn.py::GNNLayer — same params, same outputs, same gradients — on
both stencil and unstructured (kNN) neighbor lists. Runs in interpret mode
on the CPU test mesh; the TPU compiles the same kernel."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msmp_pde_tpu.data.graph import (
    build_neighbors_knn,
    build_neighbors_radius,
    cylindrical_coords,
)
from msmp_pde_tpu.models.gnn import GNNLayer
from msmp_pde_tpu.ops.mp_pallas import edge_matrices


def _inputs(nx=24, B=3, H=32, dtw=10, V=2, seed=0, graph="radius"):
    rng = np.random.default_rng(seed)
    x = np.linspace(0.0, 16.0, nx)
    if graph == "radius":
        idx, mask = build_neighbors_radius(x, 2)
    else:
        idx, mask = build_neighbors_knn(cylindrical_coords(x), 3)
    h = jnp.asarray(rng.normal(size=(B, nx, H)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(B, nx, dtw)).astype(np.float32))
    px = jnp.asarray(rng.normal(size=(B, nx)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nx, V)).astype(np.float32))
    return h, u, px, v, jnp.asarray(idx), jnp.asarray(mask)


@pytest.mark.parametrize("graph", ["radius", "knn"])
@pytest.mark.parametrize("final_act,residual", [(True, True), (False, False)])
def test_forward_parity(graph, final_act, residual):
    h, u, px, v, idx, mask = _inputs(graph=graph)
    layer = GNNLayer(hidden=32, final_act=final_act, residual=residual)
    params = layer.init(jax.random.PRNGKey(0), h, u, px, v, idx, mask)
    out_xla = layer.apply(params, h, u, px, v, idx, mask)
    ega = (edge_matrices(idx, mask), True, "float32")  # interpret off-TPU
    out_pal = layer.apply(params, h, u, px, v, idx, mask, ega=ega)
    np.testing.assert_allclose(
        np.asarray(out_pal), np.asarray(out_xla), rtol=2e-5, atol=2e-5
    )


def test_gradient_parity():
    h, u, px, v, idx, mask = _inputs()
    layer = GNNLayer(hidden=32, final_act=False, residual=False)
    params = layer.init(jax.random.PRNGKey(0), h, u, px, v, idx, mask)
    r = jnp.asarray(
        np.random.default_rng(7).normal(size=(3, 24, 32)).astype(np.float32)
    )
    ega = (edge_matrices(idx, mask), True, "float32")

    def loss(p, h, use_pallas):
        out = layer.apply(p, h, u, px, v, idx, mask,
                          ega=ega if use_pallas else None)
        return jnp.sum(out * r)

    gx_p, gx_h = jax.grad(loss, argnums=(0, 1))(params, h, False)
    gp_p, gp_h = jax.grad(loss, argnums=(0, 1))(params, h, True)
    np.testing.assert_allclose(np.asarray(gp_h), np.asarray(gx_h),
                               rtol=5e-4, atol=5e-5)

    def check(path, vx, vp):
        np.testing.assert_allclose(
            np.asarray(vp), np.asarray(vx), rtol=5e-4, atol=5e-5,
            err_msg=str(path),
        )

    jax.tree_util.tree_map_with_path(check, gx_p, gp_p)


def test_full_model_parity():
    """MSMP-PDE forward with mp_impl='pallas' (interpret) must match
    mp_impl='xla' with the same params."""
    from msmp_pde_tpu.models import get_model

    nx, tw, B = 24, 20, 2
    x = np.linspace(0.0, 16.0, nx)
    idx, mask = build_neighbors_radius(x, 2)
    rng = np.random.default_rng(1)
    window = jnp.asarray(rng.normal(size=(B, nx, tw)).astype(np.float32))
    pos_x = jnp.broadcast_to(jnp.asarray(x.astype(np.float32)), (B, nx))
    t = jnp.zeros((B,), jnp.float32)
    var_vec = jnp.zeros((B, 1), jnp.float32)
    outs = []
    for impl in ("xla", "pallas"):
        model, _ = get_model("MSMP-PDE", tw=tw, n_eq_vars=0, L=16.0,
                             tmax=4.0, dt=4.0 / 99, n_layers=2, mp_impl=impl)
        params = model.init(
            jax.random.PRNGKey(0), window, pos_x, t, var_vec,
            jnp.asarray(idx), jnp.asarray(mask),
        )
        out, _ = model.apply(params, window, pos_x, t, var_vec,
                             jnp.asarray(idx), jnp.asarray(mask))
        outs.append(np.asarray(out))
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-5, atol=2e-5)


def test_bf16_forward_close():
    """mm_dtype=bfloat16 keeps f32 accumulation: outputs stay within bf16
    operand-rounding distance (~2^-8 relative) of the f32 path."""
    h, u, px, v, idx, mask = _inputs()
    layer = GNNLayer(hidden=32, final_act=True, residual=True)
    params = layer.init(jax.random.PRNGKey(0), h, u, px, v, idx, mask)
    out_f32 = layer.apply(
        params, h, u, px, v, idx, mask,
        ega=(edge_matrices(idx, mask), True, "float32"),
    )
    out_bf16 = layer.apply(
        params, h, u, px, v, idx, mask,
        ega=(edge_matrices(idx, mask), True, "bfloat16"),
    )
    assert out_bf16.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out_bf16), np.asarray(out_f32), rtol=5e-2, atol=5e-2
    )
    # and it must actually differ (i.e. the cast is live, not a no-op)
    assert np.abs(np.asarray(out_bf16) - np.asarray(out_f32)).max() > 1e-6


def test_bf16_gradient_close():
    h, u, px, v, idx, mask = _inputs()
    layer = GNNLayer(hidden=32, final_act=False, residual=False)
    params = layer.init(jax.random.PRNGKey(0), h, u, px, v, idx, mask)
    r = jnp.asarray(
        np.random.default_rng(7).normal(size=(3, 24, 32)).astype(np.float32)
    )

    def loss(p, h, mm):
        out = layer.apply(p, h, u, px, v, idx, mask,
                          ega=(edge_matrices(idx, mask), True, mm))
        return jnp.sum(out * r)

    gx_p, gx_h = jax.grad(loss, argnums=(0, 1))(params, h, "float32")
    gb_p, gb_h = jax.grad(loss, argnums=(0, 1))(params, h, "bfloat16")
    np.testing.assert_allclose(np.asarray(gb_h), np.asarray(gx_h),
                               rtol=1e-1, atol=1e-1)

    def check(path, vx, vb):
        scale = max(np.abs(np.asarray(vx)).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(vb) / scale, np.asarray(vx) / scale,
            rtol=1e-1, atol=2e-2, err_msg=str(path),
        )

    jax.tree_util.tree_map_with_path(check, gx_p, gb_p)


def test_bf16_storage_close_to_f32():
    """mm_dtype='bfloat16s' (inputs/weight matrices pre-cast OUTSIDE the
    kernel — native-bf16 storage; biases stay f32) performs the same bf16-
    operand matmuls as 'bfloat16' modulo the once-rounded residual h, so
    outputs and grads must sit within bf16 operand-rounding distance of
    the f32 path AND very close to the in-kernel-cast bf16 path."""
    h, u, px, v, idx, mask = _inputs()
    layer = GNNLayer(hidden=32, final_act=True, residual=True)
    params = layer.init(jax.random.PRNGKey(0), h, u, px, v, idx, mask)
    r = jnp.asarray(
        np.random.default_rng(7).normal(size=(3, 24, 32)).astype(np.float32)
    )

    def run(mm):
        def loss(p, h):
            out = layer.apply(p, h, u, px, v, idx, mask,
                              ega=(edge_matrices(idx, mask), True, mm))
            return jnp.sum(out * r), out

        (l, out), g = jax.value_and_grad(loss, argnums=(0, 1),
                                         has_aux=True)(params, h)
        return out, g

    out_f, (gp_f, gh_f) = run("float32")
    out_b, _ = run("bfloat16")
    out_s, (gp_s, gh_s) = run("bfloat16s")
    assert out_s.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_f),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_b),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(gh_s), np.asarray(gh_f),
                               rtol=1e-1, atol=1e-1)

    def check(path, vf, vs):
        scale = max(np.abs(np.asarray(vf)).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(vs) / scale, np.asarray(vf) / scale,
            rtol=1e-1, atol=2e-2, err_msg=str(path),
        )

    jax.tree_util.tree_map_with_path(check, gp_f, gp_s)


def test_fused_pair_model_parity():
    """MSMP-PDE with mp_impl='pallas_pair' (ONE fused kernel per gated
    layer+gate pair incl. the combine) must match mp_impl='xla' with the
    same params: forward and gradients."""
    from msmp_pde_tpu.models import get_model

    nx, tw, B = 24, 20, 2
    x = np.linspace(0.0, 16.0, nx)
    idx, mask = build_neighbors_radius(x, 2)
    rng = np.random.default_rng(1)
    window = jnp.asarray(rng.normal(size=(B, nx, tw)).astype(np.float32))
    pos_x = jnp.broadcast_to(jnp.asarray(x.astype(np.float32)), (B, nx))
    t = jnp.zeros((B,), jnp.float32)
    var_vec = jnp.zeros((B, 1), jnp.float32)
    r = jnp.asarray(rng.normal(size=(B, nx, tw)).astype(np.float32))

    outs, grads = [], []
    for impl in ("xla", "pallas_pair"):
        model, _ = get_model("MSMP-PDE", tw=tw, n_eq_vars=0, L=16.0,
                             tmax=4.0, dt=4.0 / 99, n_layers=2, mp_impl=impl)
        params = model.init(
            jax.random.PRNGKey(0), window, pos_x, t, var_vec,
            jnp.asarray(idx), jnp.asarray(mask),
        )

        def loss(p):
            out, _ = model.apply(p, window, pos_x, t, var_vec,
                                 jnp.asarray(idx), jnp.asarray(mask))
            return jnp.sum(out * r), out

        (l, out), g = jax.value_and_grad(loss, has_aux=True)(params)
        outs.append(np.asarray(out))
        grads.append(g)
    np.testing.assert_allclose(outs[1], outs[0], rtol=2e-5, atol=2e-5)

    def check(path, vx, vp):
        # scale-aware: the update-MLP output biases (b4) have an
        # ANALYTICALLY ZERO gradient (the instance-norm backward projects
        # cotangents to zero column-sum, and db4 is exactly that sum), so
        # both paths produce only roundoff noise there — the absolute
        # floor covers noise-vs-noise; everything real matches at 1e-3.
        vx, vp = np.asarray(vx), np.asarray(vp)
        tol = max(1e-3 * np.abs(vx).max(), 2e-4)
        assert np.abs(vp - vx).max() <= tol, (
            f"{path}: max diff {np.abs(vp - vx).max():.3e} > {tol:.3e}"
        )

    jax.tree_util.tree_map_with_path(check, grads[0], grads[1])


def test_pair_bwd_fused_vs_fallback(monkeypatch):
    """The fused pair backward kernel (_pair_bwd_kernel, one launch for
    both layers + the combine) and the two-single-kernel fallback (taken
    when its blocking doesn't fit VMEM) must produce identical gradients.
    The fallback is forced by monkeypatching the blocking to 0, which also
    flips the forward into its gn/ln-stash mode."""
    from msmp_pde_tpu.ops import mp_pallas

    h, u, px, v, idx, mask = _inputs(nx=24, B=2, H=32)
    ega = edge_matrices(idx, mask)
    rng = np.random.default_rng(7)

    def make_w(key, H, dtw, V):
        ks = jax.random.split(key, 12)
        shapes = [(H, H), (H, H), (dtw, H), (1, H), (V, H), (H,),
                  (H, H), (H,), (2 * H + V, H), (H,), (H, H), (H,)]
        return tuple(
            (0.1 * jax.random.normal(k, s)).astype(jnp.float32)
            for k, s in zip(ks, shapes)
        )

    Wg = make_w(jax.random.PRNGKey(1), 32, 10, 2)
    Wl = make_w(jax.random.PRNGKey(2), 32, 10, 2)
    r = jnp.asarray(rng.normal(size=h.shape).astype(np.float32))

    def loss(h, Wg, Wl):
        out = mp_pallas.fused_gated_pair(h, u, px[..., None], v, ega, Wg, Wl,
                                         interpret=True)
        return jnp.sum(out * r)

    grads = {}
    for mode in ("fused", "fallback"):
        mp_pallas.make_fused_pair.cache_clear()
        if mode == "fallback":
            monkeypatch.setattr(mp_pallas, "_pair_bwd_bb",
                                lambda *a, **k: 0)
        else:
            monkeypatch.undo()
        grads[mode] = jax.grad(loss, argnums=(0, 1, 2))(h, Wg, Wl)
    mp_pallas.make_fused_pair.cache_clear()

    for gf, gb in zip(jax.tree.leaves(grads["fused"]),
                      jax.tree.leaves(grads["fallback"])):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gb),
                                   rtol=1e-5, atol=1e-5)
