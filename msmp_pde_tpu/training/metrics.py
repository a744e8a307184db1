"""Evaluation metrics: one-step losses, unrolled rollout losses, and the
paper's space-time L2 / relative-L2 norms.

Capability parity with /root/reference/experiments/train_helper.py:
  * test_timestep_losses (:150-203) — one forward pass at every
    time-window multiple;
  * test_unrolled_losses (:205-296) — full-trajectory rollout feeding
    predictions back through the pushforward window advance, plus the
    numerical-baseline comparison (u_base vs downprojected u_super);
  * compute_L2_norms (:362-471) with compute_spacetime_L2_norms (:298-328)
    — the headline metric: per-sample space-time L2 and relative L2 over
    the full rollout, averaged over the dataset.

Each metric's inner loop is one jitted program per batch; rollouts are
unrolled statically (8 window steps for the standard 250/25 config).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from msmp_pde_tpu.data.graph import advance_windows, slice_windows
from msmp_pde_tpu.training.loop import Trainer


def _batches(n, batch_size):
    for s in range(0, n - batch_size + 1, batch_size):
        yield np.arange(s, s + batch_size)


def test_timestep_losses(trainer: Trainer, params, u_all, var_all,
                         batch_size: int, t_res: int, log=print):
    """One-step losses at every tw multiple (train_helper.py:150-203)."""
    tw = trainer.tw
    n = int(u_all.shape[0])

    @jax.jit
    def one(params, u_traj, variables, steps):
        window, labels = slice_windows(u_traj, steps, tw)
        pred, _ = trainer.forward(params, window, steps, variables)
        return jnp.sum((pred - labels) ** 2)

    results = {}
    for step in range(tw, t_res - tw + 1):
        if step != tw and step % tw != 0:
            continue
        losses = []
        for idx in _batches(n, batch_size):
            u_traj = jnp.take(u_all, jnp.asarray(idx), axis=0)
            variables = {k: jnp.take(v, jnp.asarray(idx)) for k, v in var_all.items()}
            steps = jnp.full((len(idx),), step, jnp.int32)
            losses.append(one(params, u_traj, variables, steps) / len(idx))
        results[step] = float(jnp.mean(jnp.stack(losses)))
        log(f"Step {step}, mean loss {results[step]}")
    return results


def _rollout_collect(trainer: Trainer, params, u_traj, variables,
                     nr_gt_steps: int, t_res: int):
    """Shared rollout: returns per-step (pred, labels) stacked [S, B, nx, dtw].
    Window advance semantics follow train_helper.py:255-259."""
    tw = trainer.tw
    B = u_traj.shape[0]
    start = tw * nr_gt_steps
    steps0 = jnp.full((B,), start, jnp.int32)
    window, labels = slice_windows(u_traj, steps0, tw)
    pred, state = trainer.forward(params, window, steps0, variables)
    preds, labs = [pred], [labels]
    step_vals = list(range(tw * (nr_gt_steps + 1), t_res - tw + 1, tw))
    steps = steps0
    for sv in step_vals:
        steps = steps + tw
        window = advance_windows(window, pred, trainer.d, tw)
        _, labels = slice_windows(u_traj, steps, tw)
        pred, state = trainer.forward(params, window, steps, variables,
                                      lem_state=state)
        preds.append(pred)
        labs.append(labels)
    return jnp.stack(preds), jnp.stack(labs)


def test_unrolled_losses(trainer: Trainer, params, u_all, u_base_all, var_all,
                         batch_size: int, nr_gt_steps: int, t_res: int,
                         nx_base: int, log=print):
    """Unrolled forward loss + numerical-baseline loss
    (train_helper.py:205-296). Returns mean unrolled loss (the val metric)."""
    tw = trainer.tw
    n = int(u_all.shape[0])

    @jax.jit
    def one(params, u_traj, u_base, variables):
        preds, labs = _rollout_collect(trainer, params, u_traj, variables,
                                       nr_gt_steps, t_res)
        loss = jnp.sum((preds - labs) ** 2, axis=(1, 2, 3))  # [S]
        loss = jnp.sum(loss) / nx_base
        # numerical baseline windows (both trajectories, same steps)
        base_losses = []
        for step in range(tw * nr_gt_steps, t_res - tw + 1, tw):
            steps = jnp.full((u_traj.shape[0],), step, jnp.int32)
            _, lab_s = slice_windows(u_traj, steps, tw)
            _, lab_b = slice_windows(u_base, steps, tw)
            base_losses.append(jnp.sum((lab_s - lab_b) ** 2) / nx_base)
        return loss, jnp.sum(jnp.stack(base_losses))

    losses, base = [], []
    for idx in _batches(n, batch_size):
        jidx = jnp.asarray(idx)
        u_traj = jnp.take(u_all, jidx, axis=0)
        u_base = jnp.take(u_base_all, jidx, axis=0)
        variables = {k: jnp.take(v, jidx) for k, v in var_all.items()}
        l, b = one(params, u_traj, u_base, variables)
        losses.append(l / len(idx))
        base.append(b / len(idx))
    mean_loss = float(jnp.mean(jnp.stack(losses)))
    mean_base = float(jnp.mean(jnp.stack(base)))
    log(f"Unrolled forward losses {mean_loss}")
    log(f"Unrolled forward base losses {mean_base}")
    return mean_loss, mean_base


def compute_l2_norms(trainer: Trainer, params, u_all, var_all,
                     batch_size: int, nr_gt_steps: int, t_res: int,
                     log=print) -> Tuple[float, float]:
    """Space-time L2 and relative L2 over the full rollout — the paper
    metric (train_helper.py:362-471, :298-328)."""
    tw, d = trainer.tw, trainer.d
    n = int(u_all.shape[0])

    @jax.jit
    def one(params, u_traj, variables):
        preds, labs = _rollout_collect(trainer, params, u_traj, variables,
                                       nr_gt_steps, t_res)
        # [S, B, nx, d*tw] -> [B, S*tw, d, nx]
        S, B, nx, _ = preds.shape

        def rearr(a):
            a = a.reshape(S, B, nx, d, tw)
            return jnp.transpose(a, (1, 0, 4, 3, 2)).reshape(B, S * tw, d, nx)

        sq_err = (rearr(preds) - rearr(labs)) ** 2
        sq_norm = rearr(labs) ** 2
        # sum over d, mean over (t, x), sqrt -> per-sample L2
        l = jnp.sqrt(jnp.mean(jnp.sum(sq_err, axis=2), axis=(1, 2)))
        m = jnp.sqrt(jnp.mean(jnp.sum(sq_norm, axis=2), axis=(1, 2)))
        return l, m

    ls, ms = [], []
    for idx in _batches(n, batch_size):
        jidx = jnp.asarray(idx)
        u_traj = jnp.take(u_all, jidx, axis=0)
        variables = {k: jnp.take(v, jidx) for k, v in var_all.items()}
        l, m = one(params, u_traj, variables)
        ls.append(l)
        ms.append(m)
    l_mean = float(jnp.mean(jnp.concatenate(ls)))
    m_mean = float(jnp.mean(jnp.concatenate(ms)))
    rel = l_mean / m_mean
    log(f"L2 error {l_mean}")
    log(f"L2 relative error {100 * rel} %")
    return l_mean, rel
