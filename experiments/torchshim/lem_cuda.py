"""Pure-torch stand-in for the external ``lem_cuda`` CUDA extension.

The reference binds a hand-written fused LEM forward/backward kernel
(models_gnn.py:283-330) whose source is not in the repo. This shim
implements the LEM cell equations (Rusch et al., ICLR 2022 — the same
math as our JAX msmp_pde_tpu/models/lem.py) with the binding's exact
interface, so the unmodified reference training stack runs on CPU:

    forward(inputs[T,N,I], weights[3H,I+H], weights_lin_z[H,I+H],
            bias[3H], bias_lin_z[H], y0, z0, dt[1,1])
        -> (all_y[T,N,H], all_z[T,N,H], saved..., saved..., saved..., saved...)
    backward(grad_y, grad_z, *saved, weights, weights_lin_z, bias,
             bias_lin_z, y0, z0, dt)
        -> (d_inputs, d_w, d_wz, d_b, d_bz, d_y0, d_z0)

Cell equations (gate-to-chunk assignment identical to models/lem.py):
    g               = [x_t, y] @ W.T + b          # [N, 3H]
    dt1, dt2        = dt*sigmoid(g[:H]), dt*sigmoid(g[H:2H])
    z'              = (1-dt1) z + dt1 tanh(g[2H:])
    y'              = (1-dt2) y + dt2 tanh([x_t, z'] @ Wz.T + bz)

The backward recomputes the forward under autograd (T <= 50 — cheap)
instead of replaying hand-written BPTT; the reference's LEMFunction saves
whatever tensors ``forward`` returns in slots 3-6, so slot 3 carries the
inputs the recomputation needs (the reference discards d_inputs —
models_gnn.py:303 returns None for it).
"""
import torch


def _run(inputs, weights, weights_lin_z, bias, bias_lin_z, y0, z0, dt):
    T = inputs.shape[0]
    H = weights.shape[0] // 3
    y, z = y0, z0
    ys, zs = [], []
    for t in range(T):
        xt = inputs[t]
        g = torch.cat([xt, y], dim=-1) @ weights.t() + bias
        g1, g2, zc = g.split(H, dim=-1)
        dt1 = dt * torch.sigmoid(g1)
        dt2 = dt * torch.sigmoid(g2)
        z = (1.0 - dt1) * z + dt1 * torch.tanh(zc)
        y = (1.0 - dt2) * y + dt2 * torch.tanh(
            torch.cat([xt, z], dim=-1) @ weights_lin_z.t() + bias_lin_z)
        ys.append(y)
        zs.append(z)
    return torch.stack(ys), torch.stack(zs)


def forward(inputs, weights, weights_lin_z, bias, bias_lin_z, y0, z0, dt):
    with torch.no_grad():
        all_y, all_z = _run(inputs, weights, weights_lin_z, bias,
                            bias_lin_z, y0, z0, dt)
    empty = inputs.new_zeros(0)
    # slot 3 ("all_X") = inputs: saved by LEMFunction for our backward
    return all_y, all_z, inputs, empty, empty, empty


def backward(grad_y, grad_z, all_X, all_X2, all_multi_scales,
             all_lin_new_z_state, weights, weights_lin_z, bias,
             bias_lin_z, y0, z0, dt):
    inputs = all_X
    with torch.enable_grad():
        leaves = [t.detach().requires_grad_(True)
                  for t in (weights, weights_lin_z, bias, bias_lin_z, y0, z0)]
        all_y, all_z = _run(inputs.detach(), *leaves[:4], leaves[4],
                            leaves[5], dt.detach())
        grads = torch.autograd.grad(
            (all_y, all_z), leaves, (grad_y, grad_z), allow_unused=True)
    d_w, d_wz, d_b, d_bz, d_y0, d_z0 = grads
    return None, d_w, d_wz, d_b, d_bz, d_y0, d_z0
