"""Long Expressive Memory (LEM) recurrent cell, Rusch et al. (ICLR 2022).

The reference binds an external hand-written CUDA kernel (``lem_cuda``,
/root/reference/experiments/models_gnn.py:283-361) — the one native kernel in
the whole system. On TPU the cell is a ``lax.scan`` over the (short, T=25)
temporal-bundling window. Parameter layout matches the binding's
(models_gnn.py:310-313): a fused [3H, I+H] block computing both multi-scale
gates and the z-candidate from [x_t, y], plus a [H, I+H] block computing the
y-candidate from [x_t, z_new]; all parameters init U(-1/sqrt(H), +1/sqrt(H))
(models_gnn.py:318-321).

Cell equations (LEM paper, eq. 5):
    dt1 = dt * sigmoid(W_1 [x, y] + b_1)        (multi-scale gate for z)
    dt2 = dt * sigmoid(W_2 [x, y] + b_2)        (multi-scale gate for y)
    z'  = (1 - dt1) * z + dt1 * tanh(W_z [x, y] + b_z)
    y'  = (1 - dt2) * y + dt2 * tanh(W_y [x, z'] + b_y)

TPU optimization (exact, not approximate): the input-dependent halves of
both matmuls are hoisted out of the scan as ONE large [T*N, I] x [I, 4H]
matmul (MXU-friendly), leaving only the recurrent [N, H] x [H, 4H]
contributions inside the scan — the standard fused-RNN input-projection
trick the CUDA kernel also uses.

Fidelity is at the training-dynamics level (SURVEY.md §7 hard-part 2): the
CUDA kernel's exact gate-to-chunk assignment is symmetric at init.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from msmp_pde_tpu.models.common import torch_uniform_init


class LEM(nn.Module):
    """Scan the cell over the leading time axis; returns the last y state
    (models_gnn.py:333-342) and the full (y, z) carry for the stateful
    Save* variants (models_gnn.py:345-361).

    impl: "xla" (unrolled lax.scan), "pallas" (fused VMEM-resident scan with
    BPTT backward, ops/lem_pallas.py — the TPU equivalent of the reference's
    lem_cuda kernel), "nohoist" (in-step fused input projection, the
    lem_cuda layout), "remat" / "nohoist_remat" (the same with the scan
    step wrapped in jax.checkpoint: the backward recomputes each cell's
    gates from the saved (y, z) carries instead of stashing ~3x more
    per-cell intermediates to HBM — a traffic-for-FLOPs trade aimed at the
    HBM-bound regime, PERF.md §2), "nohoist_chunked" (sqrt-style: carries
    saved only at chunk boundaries, C = divisor of T nearest sqrt(T),
    shrinking the carry stash ~C× for one extra chunk-forward of
    recompute; measured a tie at tw=25 and 0.955× at tw=50 — nohoist_remat
    wins at both production configs, PERF.md §2), or "auto". Exact parity
    asserted in tests/test_lem_pallas.py."""

    hidden: int
    dt: float = 1.0
    impl: str = "auto"

    @nn.compact
    def __call__(self, inputs, initial_state=None):
        """inputs [T, N, I] -> (y_last [N, H], (y, z) final state)."""
        T, N, I = inputs.shape
        H = self.hidden
        init = torch_uniform_init(H)  # stdv = 1/sqrt(nhid) for ALL params
        W = self.param("weights", init, (3 * H, I + H))
        Wz = self.param("weights_lin_z", init, (H, I + H))
        b = self.param("bias", init, (3 * H,))
        bz = self.param("bias_lin_z", init, (H,))

        if initial_state is None:
            y0 = jnp.zeros((N, H), inputs.dtype)
            z0 = jnp.zeros((N, H), inputs.dtype)
            initial_state = (y0, z0)

        # split [.., I+H] blocks into input / recurrent halves
        W_x, W_y = W[:, :I], W[:, I:]
        Wz_x, Wz_z = Wz[:, :I], Wz[:, I:]

        impl = self.impl
        if impl == "auto":
            # Measured on a v5e chip (full MSMP-PDE train pass at the E1
            # config). Round-3 (experiments/bench_pallas.py): the
            # unrolled-XLA scan beats the Pallas scan (5534 vs 4663
            # samples/s standalone; 5954 vs 5805 with the Pallas MP layer)
            # — XLA pipelines the hoisted projections into the short T=25
            # recurrence better than the grid-sequential kernel. Round-4
            # (experiments/bench_lem_layout.py, on-chip): nohoist_remat —
            # in-step fused input projection + jax.checkpoint'd scan step
            # — beats the hoisted XLA scan 7601 vs 6867 samples/s (2.105
            # vs 2.330 ms/step), confirming the HBM-bound roofline
            # (PERF.md §2): it cuts both the [T,N,4H] projection streams
            # and the backward's per-cell gate stash. auto therefore picks
            # nohoist_remat on TPU; off-TPU (CPU tests, where recompute
            # costs real FLOP time and nothing is HBM-bound) it stays on
            # the hoisted XLA scan. Exact parity across all impls is
            # asserted in tests/test_lem_pallas.py.
            impl = ("nohoist_remat" if jax.default_backend() == "tpu"
                    else "xla")
        dt = jnp.asarray(self.dt, inputs.dtype)

        if impl in ("nohoist", "nohoist_remat", "nohoist_chunked"):
            # In-step fused input projection — the CUDA kernel's own layout
            # (lem_cuda computes [x_t, y] @ W.T per step). The hoisted
            # variants materialize gx/zx [T, N, 4H] to HBM (~80 MB at the
            # E1 config) while the raw inputs are [T, N, I] with I ~ 5
            # (~1 MB); here each step does one [N, I+H] @ [I+H, 4H] matmul
            # (inner dim +I, ~4% more MACs) and streams only the raw
            # inputs. The 4th output block is the z-path's x-projection
            # ONLY (its recurrent operand is z_new, which doesn't exist at
            # matmul time), so Wz's recurrent half is zeroed in the fused
            # weight and z_new @ Wz_z.T stays a separate in-step matmul —
            # the per-step matmul count is unchanged (2). Same parameters,
            # same math up to matmul summation order; A/B'd on-chip
            # (experiments/bench_lem_layout.py).
            W4 = jnp.concatenate(
                [W, jnp.concatenate([Wz_x, jnp.zeros_like(Wz[:, I:])], 1)],
                axis=0,
            ).T  # [I+H, 4H]
            b4 = jnp.concatenate([b, bz])

            def step_nh(carry, x_t):
                y, z = carry
                p = jnp.concatenate([x_t, y], axis=-1) @ W4 + b4
                g1, g2, zc, zx_t = jnp.split(p, (H, 2 * H, 3 * H), axis=-1)
                dt1 = dt * jax.nn.sigmoid(g1)
                dt2 = dt * jax.nn.sigmoid(g2)
                z_new = (1.0 - dt1) * z + dt1 * jnp.tanh(zc)
                y_new = (1.0 - dt2) * y + dt2 * jnp.tanh(
                    zx_t + z_new @ Wz_z.T
                )
                return (y_new, z_new), None

            if impl == "nohoist_chunked":
                # sqrt-style checkpointing: save the (y, z) carries only at
                # chunk boundaries and recompute the C in-chunk steps on the
                # backward — the per-step remat's carry stash (2·[T,N,H] ≈
                # 41 MB/traversal at the E1 config) shrinks ~C×, while the
                # recompute FLOPs stay one extra chunk-forward (the LEM's
                # 2 matmuls/step are ~1% of the step's FLOPs). C = the
                # divisor of T nearest sqrt(T) (T=25 → 5); C=1 degenerates
                # to per-step remat, C=T to one whole-scan checkpoint.
                C = min((c for c in range(1, T + 1) if T % c == 0),
                        key=lambda c: abs(c - T ** 0.5))

                def chunk_nh(carry, x_chunk):
                    for i in range(C):
                        carry, _ = step_nh(carry, x_chunk[i])
                    return carry, None

                state, _ = jax.lax.scan(
                    jax.checkpoint(chunk_nh), initial_state,
                    inputs.reshape(T // C, C, N, I), unroll=True)
                return state[0], state

            if impl == "nohoist_remat":
                step_nh = jax.checkpoint(step_nh)
            state, _ = jax.lax.scan(step_nh, initial_state, inputs,
                                    unroll=True)
            return state[0], state

        # hoisted input projections: one [T*N, I] @ [I, 4H] matmul
        flat = inputs.reshape(T * N, I)
        proj = flat @ jnp.concatenate([W_x, Wz_x], axis=0).T \
            + jnp.concatenate([b, bz])
        gx = proj[:, : 3 * H].reshape(T, N, 3 * H)
        zx = proj[:, 3 * H :].reshape(T, N, H)

        if impl == "pallas":
            from msmp_pde_tpu.ops.lem_pallas import lem_scan

            yT, zT = lem_scan(
                gx, zx, initial_state[0], initial_state[1],
                W_y.T, Wz_z.T, dt=float(self.dt),
                interpret=jax.default_backend() != "tpu",
            )
            return yT, (yT, zT)

        def step(carry, xs):
            y, z = carry
            gx_t, zx_t = xs
            g = gx_t + y @ W_y.T
            g1, g2, zc = jnp.split(g, 3, axis=-1)
            dt1 = dt * jax.nn.sigmoid(g1)
            dt2 = dt * jax.nn.sigmoid(g2)
            z_new = (1.0 - dt1) * z + dt1 * jnp.tanh(zc)
            y_new = (1.0 - dt2) * y + dt2 * jnp.tanh(zx_t + z_new @ Wz_z.T)
            return (y_new, z_new), None

        # T is the short temporal-bundling window (20-50): fully unrolling
        # removes the while-loop + dynamic-update-slice machinery that
        # dominates the profile (the two LEM scans were ~35% of the E1 train
        # step before unrolling) and lets XLA software-pipeline the 25 cells.
        if impl == "remat":
            step = jax.checkpoint(step)
        state, _ = jax.lax.scan(step, initial_state, (gx, zx), unroll=True)
        return state[0], state
