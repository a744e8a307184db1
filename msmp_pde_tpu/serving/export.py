"""AOT export of a rollout program via ``jax.export``.

Freezes (model code + checkpoint weights + horizon + batch shape) into one
serialized StableHLO artifact that replays with ZERO framework code — the
loader needs jax only, not this package. That is the deployment story the
reference lacks entirely (its eval scripts re-import the full model zoo and
rebuild the PyG graph per run, /root/reference/experiments/eval.py:570-720).

The artifact is platform-checked by jax.export at call time: export on the
serving platform (TPU for production, CPU for tests/CI).
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np


def export_rollout(engine, batch: int, n_windows: int,
                   path: Optional[str] = None,
                   platforms: Optional[tuple] = None) -> bytes:
    """Serialize one (batch, horizon) rollout program with the engine's
    params baked in as constants. Returns the bytes; also writes ``path``
    when given.

    ``platforms``: optional lowering platforms, e.g. ``("cpu", "tpu")`` to
    produce one artifact that serves on both; default = the current
    backend's platform only."""
    import jax
    from jax import export as jexport

    trainer = engine.trainer
    nx = int(trainer.spec.x.shape[-1])
    d, tw = trainer.d, trainer.tw
    params = engine.params
    fn = engine._rollout_fn(n_windows)

    def serve_fn(window, steps, variables):
        return fn(params, window, steps, variables)

    window_s = jax.ShapeDtypeStruct((batch, nx, d * tw), np.float32)
    steps_s = jax.ShapeDtypeStruct((batch,), np.int32)
    var_s = {k: jax.ShapeDtypeStruct((batch,), np.float32)
             for k in trainer.eq_norms}
    kw = {"platforms": tuple(platforms)} if platforms else {}
    exported = jexport.export(jax.jit(serve_fn), **kw)(window_s, steps_s,
                                                       var_s)
    blob = exported.serialize()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob


class ExportedRollout:
    """Thin callable over a deserialized artifact; mirrors
    ``RolloutEngine.rollout``'s numpy-in / numpy-out signature (fixed batch
    and horizon — the artifact's)."""

    def __init__(self, blob: bytes):
        from jax import export as jexport

        self._exported = jexport.deserialize(
            blob if isinstance(blob, bytearray) else bytearray(blob)
        )
        self.in_avals = self._exported.in_avals

    def __call__(self, window, steps, variables: Dict) -> np.ndarray:
        import jax.numpy as jnp

        out = self._exported.call(
            jnp.asarray(window, jnp.float32),
            jnp.asarray(steps, jnp.int32),
            {k: jnp.asarray(v, jnp.float32) for k, v in variables.items()},
        )
        return np.asarray(out)


def load_exported(path_or_bytes) -> ExportedRollout:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return ExportedRollout(path_or_bytes)
    with open(path_or_bytes, "rb") as f:
        return ExportedRollout(f.read())
