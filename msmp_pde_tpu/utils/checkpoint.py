"""Checkpointing via orbax.

Superset of the reference's save-only best-validation ``torch.save(state_dict)``
(/root/reference/experiments/train.py:423-435): we checkpoint params AND
optimizer state + epoch counter, enabling mid-training resume (the reference
cannot resume — SURVEY.md §5).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(path: str, params, opt_state=None, epoch: Optional[int] = None):
    path = os.path.abspath(path)
    payload = {"params": params}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if epoch is not None:
        payload["epoch"] = epoch
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)


def restore_checkpoint(path: str, template: Any):
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, target=template)


def restore_params(path: str, trainer, params):
    """Restore just the params subtree, from either a training checkpoint
    (params + opt_state + epoch — what the train CLI writes) or a
    params-only one (what serving/export flows write). The serving path
    needs no optimizer state, but orbax requires the restore template to
    match the stored tree, so a throwaway opt template is built first and
    the params-only layout is the fallback."""
    tx = trainer.make_optimizer(1e-4, 0.4, [1, 5, 10, 15], 1000)
    try:
        template = {"params": params, "opt_state": tx.init(params),
                    "epoch": 0}
        return restore_checkpoint(path, template)["params"]
    except (ValueError, KeyError, TypeError):
        return restore_checkpoint(path, {"params": params})["params"]
