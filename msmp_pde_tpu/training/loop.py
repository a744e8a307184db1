"""Training loop: pushforward trick + temporal bundling, fully jitted.

Re-designs the reference training step (/root/reference/experiments/
train_helper.py:66-148 and train.py:205-244) for TPU:

  * full trajectories live on device ([N, nt, (d,) nx] — a few hundred MB);
    one optimizer step is ONE jit call taking (params, opt_state,
    sample-indices, window-start steps): window slicing, pushforward
    rollout, loss, backward and the AdamW update all fuse into a single
    XLA program. No per-batch host graph building, no host->device batch
    copies (the reference rebuilds a PyG graph on host every batch,
    utils.py:320-428).

  * the pushforward unroll count is a static argument (values 0..unrolling,
    typically 2 programs), sampled per batch on host exactly like
    random.choice(unrolling) (train_helper.py:93); the no-grad rollout is
    jax.lax.stop_gradient (train_helper.py:106-122).

  * epoch structure parity: one "epoch" = t_res passes over the shuffled
    loader (train.py:241-244); loss = sqrt(sum-reduction MSE)
    (train_helper.py:136-138); AdamW(lr=1e-4, wd=0.01) with MultiStepLR
    milestones [unrolling, 5, 10, 15], gamma=0.4 (train.py:410-411).

Data parallelism: batch arrays are sharded over the mesh's 'dp' axis and
parameters are replicated; under jit XLA inserts the gradient all-reduce
(psum) over ICI automatically (parallel/mesh.py).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from msmp_pde_tpu.data.graph import GraphSpec, advance_windows, slice_windows
from msmp_pde_tpu.models.common import assemble_variables


# ----------------------------------------------------------------- layout
def window_to_grid(window: jnp.ndarray, d: int, tw: int) -> jnp.ndarray:
    """[B, nx, d*tw] (component-major) -> [B, tw, nx] or [B, tw, d, nx]."""
    B, nx, _ = window.shape
    if d == 1:
        return jnp.transpose(window, (0, 2, 1))
    w = window.reshape(B, nx, d, tw)
    return jnp.transpose(w, (0, 3, 2, 1))


def grid_to_window(grid: jnp.ndarray, d: int, tw: int) -> jnp.ndarray:
    """Inverse of window_to_grid."""
    if d == 1:
        return jnp.transpose(grid, (0, 2, 1))
    B = grid.shape[0]
    nx = grid.shape[-1]
    w = jnp.transpose(grid, (0, 3, 2, 1))  # [B, nx, d, tw]
    return w.reshape(B, nx, d * tw)


def make_var_fns(eq_norms: Dict[str, float], tmax: float):
    """Two variable-vector builders (the graph path gets normalized time and
    a negated beta, utils.py:392 + models_gnn.py:250-266; the grid path gets
    raw normalized eq params, models_fno.py:170-183)."""

    def graph_vars(t, variables, b_reads_a: bool = False):
        if b_reads_a and "b" in eq_norms and "a" in variables:
            # reference 2D models feed data.a into the b slot
            # (models_gnn2D.py:116 and every 2D variant) — preserved.
            variables = dict(variables, b=variables["a"])
        return assemble_variables(t, variables, eq_norms, tmax)

    grid_names = tuple(
        n for n in ("alpha", "beta", "gamma", "D", "r", "a", "b")
        if n in eq_norms
    )

    def grid_vars(variables):
        if not grid_names:
            return None
        return jnp.stack(
            [variables[n] / eq_norms[n] for n in grid_names], axis=-1
        )

    return graph_vars, grid_vars


@dataclasses.dataclass
class Trainer:
    """Builds and caches the jitted train/apply functions for one model.

    ``mesh`` (optional): a 1-D 'dp' jax.sharding.Mesh. When set, the jitted
    train step/pass programs carry NamedSharding constraints — params and
    trajectory arrays replicated, per-batch sample indices sharded — and
    GSPMD inserts the gradient all-reduce over ICI (SURVEY.md §2.4; the
    reference is strictly single-device)."""

    model: object
    kind: str  # graph | grid
    spec: GraphSpec
    eq_norms: Dict[str, float]
    unstructured_x: Optional[np.ndarray] = None
    mesh: Optional[object] = None

    def __post_init__(self):
        self.tw = self.spec.tw
        self.d = self.spec.n_components
        self.graph_vars, self.grid_vars = make_var_fns(
            self.eq_norms, self.spec.tmax
        )
        # jitted-program caches. Values hold a strong reference to the
        # optimizer object so its id() can never be reused by a new object
        # while the cache entry is alive (stale-id collision would silently
        # run a stale program).
        self._steps = {}
        self._metric_cache = {}

    # ------------------------------------------------------------ forward
    def forward(self, params, window, steps, variables, lem_state=None):
        """One model application on [B, nx, d*tw] windows; steps [B] are the
        label-window start indices (used for the time feature)."""
        spec = self.spec
        t = spec.t_grid[steps]
        if self.kind == "graph":
            var_vec = self.graph_vars(t, variables, b_reads_a=(self.d == 2))
            B = window.shape[0]
            pos_x = jnp.broadcast_to(spec.x, (B, spec.nx))
            out, state = self.model.apply(
                params, window, pos_x, t, var_vec, spec.idx, spec.mask,
                lem_state=lem_state,
            )
            return out, state
        # grid models
        grid_in = window_to_grid(window, self.d, self.tw)
        var_cols = self.grid_vars(variables)
        name = type(self.model).__name__
        if getattr(self.model, "unstructured", False):
            out = self.model.apply(params, grid_in, var_cols, spec.x)
        elif getattr(self.model, "eq_var_names", ()):
            out = self.model.apply(params, grid_in, var_cols)
        else:
            out = self.model.apply(params, grid_in)
        return grid_to_window(out, self.d, self.tw), None

    def init_params(self, key, batch_size: int = 2):
        spec = self.spec
        window = jnp.zeros((batch_size, spec.nx, self.d * self.tw), jnp.float32)
        steps = jnp.zeros((batch_size,), jnp.int32) + self.tw
        variables = {
            n: jnp.zeros((batch_size,), jnp.float32) for n in self.eq_norms
        }
        if self.kind == "graph":
            t = spec.t_grid[steps]
            var_vec = self.graph_vars(t, variables, b_reads_a=(self.d == 2))
            pos_x = jnp.broadcast_to(spec.x, (batch_size, spec.nx))
            return self.model.init(
                key, window, pos_x, t, var_vec, spec.idx, spec.mask
            )
        grid_in = window_to_grid(window, self.d, self.tw)
        var_cols = self.grid_vars(variables)
        if getattr(self.model, "unstructured", False):
            return self.model.init(key, grid_in, var_cols, spec.x)
        if getattr(self.model, "eq_var_names", ()):
            return self.model.init(key, grid_in, var_cols)
        return self.model.init(key, grid_in)

    # ------------------------------------------------------------ training
    def make_optimizer(self, lr: float, lr_decay: float, milestones,
                       steps_per_epoch: int):
        """AdamW + epoch-milestone decay (train.py:410-411)."""
        bounds = {int(m) * steps_per_epoch: lr_decay for m in milestones}
        schedule = optax.piecewise_constant_schedule(lr, bounds)
        return optax.adamw(
            learning_rate=schedule, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=0.01,
        )

    def _one_step(self, tx, unrolled: int):
        """The (untraced) single optimizer step for a static pushforward
        depth — shared by train_step_fn and train_pass_fn."""
        tw = self.tw

        def step(params, opt_state, u_all, var_all, idx_batch, steps):
            u_traj = jnp.take(u_all, idx_batch, axis=0)
            variables = {
                k: jnp.take(v, idx_batch, axis=0) for k, v in var_all.items()
            }
            window, labels = slice_windows(u_traj, steps, tw)

            # pushforward: no-grad rollout (train_helper.py:106-122)
            state = None
            for _ in range(unrolled):
                pred, state = self.forward(params, window, steps, variables,
                                           lem_state=state)
                pred = jax.lax.stop_gradient(pred)
                state = jax.lax.stop_gradient(state) if state is not None else None
                window = advance_windows(window, pred, self.d, tw)
                steps = steps + tw
            _, labels = slice_windows(u_traj, steps, tw)

            def loss_fn(p):
                pred, _ = self.forward(p, window, steps, variables,
                                       lem_state=state)
                return jnp.sqrt(jnp.sum((pred - labels) ** 2))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        return step

    def _dp_shardings(self, batched_ranks):
        """(in_shardings, out_shardings) for a step/pass signature
        ``(params, opt_state, u_all, var_all, *batched)`` on the dp mesh.
        ``batched_ranks``: for each trailing batched arg, the axis index that
        carries the per-sample batch dimension (sharded over 'dp'); None
        means replicated."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())

        def bsh(rank):
            if rank is None:
                return repl
            return NamedSharding(
                self.mesh, P(*([None] * rank), "dp")
            )

        in_sh = (repl, repl, repl, repl) + tuple(bsh(r) for r in batched_ranks)
        return in_sh, (repl, repl, repl)

    def train_step_fn(self, tx, unrolled: int):
        """Jitted optimizer step for a given (static) pushforward depth."""
        key = (id(tx), unrolled)
        if key not in self._steps:
            step = self._one_step(tx, unrolled)
            if self.mesh is not None:
                in_sh, out_sh = self._dp_shardings([0, 0])
                fn = jax.jit(step, in_shardings=in_sh, out_shardings=out_sh,
                             donate_argnums=(0, 1))
            else:
                fn = jax.jit(step, donate_argnums=(0, 1))
            self._steps[key] = (tx, fn)
        return self._steps[key][1]

    def train_pass_fn(self, tx, max_unroll: int):
        """One jit call executing a FULL pass over the shuffled loader: a
        lax.scan over the batches with lax.switch on the per-batch
        pushforward depth. This amortizes host->device dispatch (through the
        TPU tunnel a per-step dispatch costs more than the 4-5 ms step
        itself; fusing 100+ steps removes that wall entirely).

        Under a dp mesh the per-pass index/step arrays [n_batches, B] are
        sharded on their batch axis, so every scanned step is data-parallel
        with a psum'd gradient — the production multi-chip code path."""
        key = (id(tx), "pass", max_unroll)
        if key in self._steps:
            return self._steps[key][1]

        branches = [self._one_step(tx, u) for u in range(max_unroll + 1)]

        def pass_fn(params, opt_state, u_all, var_all, idx_pass, steps_pass,
                    unroll_flags):
            def body(carry, xs):
                p, o = carry
                idx, steps, uf = xs
                if len(branches) == 1:
                    p, o, loss = branches[0](p, o, u_all, var_all, idx, steps)
                else:
                    p, o, loss = jax.lax.switch(
                        uf, branches, p, o, u_all, var_all, idx, steps
                    )
                return (p, o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), (idx_pass, steps_pass, unroll_flags)
            )
            return params, opt_state, losses

        if self.mesh is not None:
            # idx_pass/steps_pass: [n_batches, B] — shard axis 1;
            # unroll_flags: [n_batches] — replicated (scan-carried control).
            in_sh, out_sh = self._dp_shardings([1, 1, None])
            fn = jax.jit(pass_fn, in_shardings=in_sh, out_shardings=out_sh,
                         donate_argnums=(0, 1))
        else:
            fn = jax.jit(pass_fn, donate_argnums=(0, 1))
        self._steps[key] = (tx, fn)
        return fn


def train_epoch(
    trainer: Trainer,
    tx,
    params,
    opt_state,
    u_all,
    var_all,
    epoch: int,
    batch_size: int,
    t_res: int,
    unrolling: int,
    rng: np.random.Generator,
    print_interval: int = 20,
    log=print,
    profile_dir: Optional[str] = None,
):
    """One reference epoch: t_res passes over the shuffled loader
    (train.py:233-244 + train_helper.py:89-147). With ``profile_dir`` the
    first pass is captured with jax.profiler (the reference only has
    wall-clock prints — SURVEY.md §5)."""
    tw = trainer.tw
    n = int(u_all.shape[0])
    batch_size = min(batch_size, n)
    n_batches = max(1, n // batch_size)
    max_unrolling = min(epoch, unrolling)
    unroll_choices = list(range(max_unrolling + 1))

    fn = trainer.train_pass_fn(tx, max_unrolling)
    losses = []
    for i in range(t_res):
        if profile_dir and i == 1:
            jax.profiler.start_trace(profile_dir)
        if profile_dir and i == 2:
            jax.profiler.stop_trace()
            log(f"Profiler trace written to {profile_dir}")
        perm = rng.permutation(n)[: n_batches * batch_size]
        perm = perm.reshape(n_batches, batch_size).astype(np.int32)
        flags = np.asarray(
            [rng.choice(unroll_choices) for _ in range(n_batches)], np.int32
        )
        steps = np.stack(
            [
                rng.integers(tw, t_res - tw - tw * int(f) + 1, size=batch_size)
                for f in flags
            ]
        ).astype(np.int32)
        params, opt_state, pass_losses = fn(
            params, opt_state, u_all, var_all,
            jnp.asarray(perm), jnp.asarray(steps), jnp.asarray(flags),
        )
        losses.append(pass_losses)
        if i % print_interval == 0:
            recent = float(jnp.mean(losses[-1]))
            log(f"Training Loss (progress: {i / t_res:.2f}): "
                f"{recent / batch_size}")
    mean_loss = float(jnp.mean(jnp.concatenate(losses)))
    return params, opt_state, mean_loss / batch_size
