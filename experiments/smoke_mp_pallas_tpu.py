"""TPU smoke test for the fused MP Pallas layer at the production config.

Interpret-mode tests validate semantics but not Mosaic lowering; this
compiles and runs the real kernel (fwd + bwd, E1 shapes: B=16, nx=100,
K=7, H=128) on the chip and checks parity vs the XLA path. Exit 0 = safe
for the queued training runs; non-zero = fall back to mp_impl=xla.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.data.graph import build_neighbors_radius
    from msmp_pde_tpu.models.gnn import GNNLayer
    from msmp_pde_tpu.ops.mp_pallas import edge_matrices

    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    nx, H, tw, B = 100, 128, 25, 16
    x = np.linspace(0.0, 16.0, nx)
    idx, mask = build_neighbors_radius(x, 3)
    idx, mask = jnp.asarray(idx), jnp.asarray(mask)
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(B, nx, H)).astype(np.float32))
    u = jnp.asarray(rng.normal(size=(B, nx, tw)).astype(np.float32))
    px = jnp.asarray(rng.normal(size=(B, nx)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(B, nx, 1)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(B, nx, H)).astype(np.float32))

    layer = GNNLayer(hidden=H, final_act=True, residual=True)
    params = layer.init(jax.random.PRNGKey(0), h, u, px, v, idx, mask)
    ega = (edge_matrices(idx, mask), False, "float32")  # compiled

    def loss(p, hh, use_pallas):
        out = layer.apply(p, hh, u, px, v, idx, mask,
                          ega=ega if use_pallas else None)
        return jnp.sum(out * r)

    # Parity thresholds are RELATIVE: the XLA path and the kernel reduce in
    # different orders and the MXU's f32 matmul is a multi-pass bf16
    # decomposition, so absolute deltas scale with the reduction length.
    # Semantic equivalence at 1e-7 is asserted separately in interpret mode
    # (tests/test_mp_pallas.py) with the exact same bb configuration.
    def relerr(a, b):
        return float(jnp.max(jnp.abs(a - b)) /
                     (1e-6 + jnp.max(jnp.abs(b))))

    out_x = layer.apply(params, h, u, px, v, idx, mask)
    out_p = layer.apply(params, h, u, px, v, idx, mask, ega=ega)
    oerr = relerr(out_p, out_x)

    f_x = jax.jit(jax.value_and_grad(loss, argnums=(0, 1)),
                  static_argnums=2)
    (lx, (gx_p, gx_h)) = f_x(params, h, False)
    (lp, (gp_p, gp_h)) = f_x(params, h, True)
    derr = relerr(gp_h, gx_h)
    perrs = jax.tree.map(relerr, gp_p, gx_p)
    wmax = max(jax.tree.leaves(perrs))
    print(f"rel errs: out {oerr:.2e}  dh {derr:.2e}  weight-grads {wmax:.2e}",
          flush=True)
    # Weight-grad bound: measured against CPU-f32 ground truth, the TPU
    # *XLA* path itself deviates 2-7e-3 relative (MXU bf16-pass
    # accumulation over 1600-row sums); the kernel shows the same profile.
    ok = oerr < 5e-3 and derr < 5e-3 and wmax < 2e-2
    print("SMOKE", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
