"""Batched rollout engine for serving trained surrogates.

The reference's inference story is its offline eval scripts
(/root/reference/experiments/eval.py:502-575 rolls a model out inside the
test harness); there is no deployable path. This module provides one,
TPU-first:

* the model is applied through the same ``Trainer.forward`` used in
  training (one code path to validate), but the rollout is compiled ONCE
  per (batch bucket, horizon) pair and reused for every request —
  requests are padded up to the nearest bucket so XLA never retraces;
* the whole horizon is one jitted program (windows advance through the
  pushforward rule, ``data.graph.advance_windows``) — one device dispatch
  per request, which matters through a network-attached TPU tunnel where
  per-call latency dominates small programs;
* grid metadata can come from an HDF5 attrs-only read (no trajectory data
  is loaded — a server does not need the training set) or, for the
  uniform-grid families, be reconstructed from the PDE definition alone.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np


@dataclasses.dataclass
class GridInfo:
    """The slice of dataset metadata a server needs: duck-types the
    ``PDEDataset`` attributes read by ``data.graph.build_graph_spec``."""

    x: np.ndarray
    nt: int
    dt: float
    tmin: float
    tmax: float
    n_components: int


def grid_from_h5(path: str, pde, mode: str, base_resolution,
                 super_resolution) -> GridInfo:
    """Attrs-only read of the grid metadata (no trajectory datasets are
    materialized). Mirrors the x/t handling of ``PDEDataset.__init__``
    (data/dataset.py:105-152): WE downprojects the super-resolution
    Chebyshev grid; unstructured AD serves the stored base grid."""
    import h5py

    from msmp_pde_tpu.data.dataset import _mean_downproject

    family = f"{pde}"
    key_base = f"pde_{base_resolution[0]}-{base_resolution[1]}"
    key_super = f"pde_{super_resolution[0]}-{super_resolution[1]}"
    with h5py.File(path, "r") as f:
        db = f[mode][key_base]
        nt = int(db.attrs["nt"])
        dt = float(db.attrs["dt"])
        tmin = float(db.attrs["tmin"])
        tmax = float(db.attrs["tmax"])
        x = np.asarray(db.attrs["x"], np.float64)
        if family == "WE":
            x_super = np.asarray(f[mode][key_super].attrs["x"], np.float64)
            ratio = x_super.shape[-1] // x.shape[-1]
            x = _mean_downproject(x_super[None], ratio)[0]
    return GridInfo(x=x.astype(np.float32), nt=nt, dt=dt, tmin=tmin,
                    tmax=tmax, n_components=2 if family == "AD" else 1)


def uniform_grid(pde, base_resolution) -> GridInfo:
    """Dataset-free grid for the uniform families: the datagen grid is
    ``linspace(0, L, nx)`` for CE/KF (generate.py:200) and structured AD
    (:397), and ``linspace(0, 2*pi*L, nx)`` for KS (:342). WE (Chebyshev)
    and unstructured AD grids live only in the data files — use
    ``grid_from_h5`` for those."""
    family = f"{pde}"
    nt, nx = base_resolution
    if family == "WE" or getattr(pde, "unstructured_grid", False):
        raise ValueError(
            f"{family} grid is data-defined; pass a dataset file"
        )
    L = float(getattr(pde, "L", 16.0))
    if family == "KS":
        x = np.linspace(0.0, 2 * np.pi * L, nx)
        tmin, tmax = float(pde.tstart), float(pde.tend)
        dt = (tmax - tmin) / nt  # dt_downsampled convention (generate.py:331)
    else:
        x = np.linspace(0.0, L, nx)
        tmin, tmax = float(getattr(pde, "tmin", 0.0)), float(pde.tmax)
        dt = (tmax - tmin) / (nt - 1)  # equations/base.py:36
    return GridInfo(x=x.astype(np.float32), nt=nt, dt=dt,
                    tmin=tmin, tmax=tmax,
                    n_components=2 if family == "AD" else 1)


def build_serving_trainer(experiment: str, model: str, *,
                          base_resolution=(250, 100),
                          super_resolution=(250, 200),
                          neighbors: int = 3, time_window: int = 25,
                          n_graph_layers: int = 6,
                          data_path: Optional[str] = None,
                          mode: str = "test",
                          mp_precision: str = "float32",
                          data_suffix: str = ""):
    """Dataset-light twin of ``training.setup.setup_experiment``: builds the
    same (trainer, eq_norms) the train/eval CLIs use, from grid metadata
    instead of loaded trajectories.

    ``data_suffix``: set to ``"_I"`` when serving a checkpoint trained on
    the interpolated uniform-grid datasets — it applies the same
    ``unstructured_grid = False`` override as setup_experiment
    (training/setup.py:120-122), so the serving graph (radius stencil)
    matches the training graph instead of the unstructured kNN graph."""
    from msmp_pde_tpu.data import build_graph_spec
    from msmp_pde_tpu.models import get_model
    from msmp_pde_tpu.training.loop import Trainer
    from msmp_pde_tpu.training.setup import (
        eq_variable_norms,
        pde_for_experiment,
    )

    pde = pde_for_experiment(experiment, tuple(base_resolution))
    if data_suffix:
        pde.unstructured_grid = False
    eq_norms = eq_variable_norms(experiment)
    if data_path is not None:
        grid = grid_from_h5(data_path, pde, mode, tuple(base_resolution),
                            tuple(super_resolution))
    else:
        grid = uniform_grid(pde, tuple(base_resolution))
    spec = build_graph_spec(pde, grid, neighbors, time_window)
    m, kind = get_model(
        model, tw=time_window, n_eq_vars=len(eq_norms),
        L=float(getattr(pde, "L", 16.0)), tmax=grid.tmax, dt=grid.dt,
        n_layers=n_graph_layers, eq_var_names=tuple(eq_norms.keys()),
        positions=np.asarray(grid.x), mp_precision=mp_precision,
        # serving never lowers the backward: shapes where only the forward
        # blocking fits VMEM still take the fused Pallas path
        mp_inference=True,
    )
    return Trainer(model=m, kind=kind, spec=spec, eq_norms=eq_norms)


class RolloutEngine:
    """Compile-once, serve-many rollout over fixed batch buckets.

    ``rollout(window, ...)`` takes initial windows [B, nx, d*tw] (the same
    component-major layout training uses, ``data.graph.slice_windows``) and
    returns the model's autoregressive predictions [B, n_windows, nx, d*tw].
    B is padded up to the nearest bucket so each (bucket, horizon) pair
    compiles exactly once; the pad rows are discarded before returning.

    ``mesh``: optional 1-D 'dp' ``jax.sharding.Mesh`` — requests whose
    bucket divides the mesh are batch-sharded across the serving slice
    (params replicated, GSPMD keeps the per-sample rollout local to its
    device), so throughput scales with chips like the training pass.
    """

    def __init__(self, trainer, params,
                 batch_buckets: Sequence[int] = (1, 4, 16), mesh=None):
        import jax

        self.trainer = trainer
        self.mesh = mesh
        if mesh is not None:
            from msmp_pde_tpu.parallel.mesh import replicate

            self.params = replicate(mesh, params)
        else:
            self.params = jax.device_put(params)
        self.buckets = tuple(sorted(set(int(b) for b in batch_buckets)))
        if not self.buckets:
            raise ValueError("need at least one batch bucket")
        self._programs = {}

    # ---------------------------------------------------------- program
    def _rollout_fn(self, n_windows: int):
        import jax
        import jax.numpy as jnp

        from msmp_pde_tpu.data.graph import advance_windows

        trainer = self.trainer
        tw, d = trainer.tw, trainer.d
        nt = int(trainer.spec.t_grid.shape[0])

        def fn(params, window, steps, variables):
            # time feature frozen at the last in-horizon window beyond the
            # data horizon, like the eval long-rollout (eval.py:202-216)
            def t_clamp(s):
                return jnp.clip(s, tw, nt - tw)

            pred, state = trainer.forward(params, window, t_clamp(steps),
                                          variables)
            preds = [pred]
            for _ in range(n_windows - 1):
                steps = steps + tw
                if state is not None:
                    # eval parity for stateful (Save*) models: the
                    # long-rollout loop beyond the data horizon calls
                    # forward WITHOUT accumulated state
                    # (metrics.rollout_store / eval.py:502-575); the LEM
                    # default init is zeros (models/lem.py:62-64), so a
                    # per-sample zero-reset reproduces that exactly for
                    # windows past nt - tw.
                    in_h = steps <= nt - tw
                    state = jax.tree.map(
                        lambda s: jnp.where(
                            in_h.reshape((-1,) + (1,) * (s.ndim - 1)),
                            s, jnp.zeros_like(s)),
                        state,
                    )
                window = advance_windows(window, pred, d, tw)
                pred, state = trainer.forward(params, window, t_clamp(steps),
                                              variables, lem_state=state)
                preds.append(pred)
            return jnp.stack(preds, axis=1)  # [B, S, nx, d*tw]

        return fn

    def _program(self, bucket: int, n_windows: int, var_keys):
        import jax

        key = (bucket, n_windows, var_keys)
        if key not in self._programs:
            self._programs[key] = jax.jit(self._rollout_fn(n_windows))
        return self._programs[key]

    # ---------------------------------------------------------- serving
    def _bucket_for(self, B: int) -> int:
        for b in self.buckets:
            if B <= b:
                return b
        # oversize requests round up to a multiple of the largest bucket;
        # the caller is chunked over it
        return self.buckets[-1]

    def default_variables(self, B: int) -> Dict[str, np.ndarray]:
        return {k: np.zeros((B,), np.float32)
                for k in self.trainer.eq_norms}

    def rollout(self, window, variables: Optional[Dict] = None,
                start_step=None, n_windows: int = 1) -> np.ndarray:
        """``start_step``: scalar or per-sample [B] label-window start
        indices (the time-feature anchor); default ``tw``."""
        import jax.numpy as jnp

        trainer = self.trainer
        tw = trainer.tw
        window = np.asarray(window, np.float32)
        nx = int(trainer.spec.x.shape[-1])
        dtw = trainer.d * tw
        if window.ndim != 3 or window.shape[1:] != (nx, dtw):
            # strict: a wrong-grid window must fail loudly — grid models
            # would silently rebuild their coordinate grid from the input
            # shape and "predict" on a grid they were never trained on,
            # and every novel shape would compile a fresh program
            raise ValueError(
                f"window must be [B, {nx}, {dtw}] for this engine "
                f"(nx={nx}, d={trainer.d}, tw={tw}), got {window.shape}"
            )
        B = window.shape[0]
        if variables is None:
            variables = self.default_variables(B)
        else:
            # strict: a misspelled or missing equation variable must fail
            # loudly, not silently condition the model on zeros
            want = set(self.trainer.eq_norms)
            got = set(variables)
            if got != want:
                raise ValueError(
                    f"equation variables mismatch: expected {sorted(want)}, "
                    f"got {sorted(got)}"
                )
            variables = dict(variables)
        if start_step is None:
            steps = np.full((B,), tw, np.int32)
        else:  # scalar or per-sample [B]
            steps = np.broadcast_to(
                np.asarray(start_step, np.int32), (B,)
            ).copy()

        bucket = self._bucket_for(B)
        if B > bucket:  # chunk oversize requests over the largest bucket
            chunks = [
                self.rollout(window[s:s + bucket],
                             {k: v[s:s + bucket] for k, v in
                              variables.items()},
                             start_step=steps[s:s + bucket],
                             n_windows=n_windows)
                for s in range(0, B, bucket)
            ]
            return np.concatenate(chunks, axis=0)

        pad = bucket - B
        if pad:
            window = np.concatenate(
                [window, np.zeros((pad,) + window.shape[1:], np.float32)]
            )
            steps = np.concatenate([steps, np.full((pad,), tw, np.int32)])
            variables = {
                k: np.concatenate(
                    [np.asarray(v, np.float32), np.zeros((pad,), np.float32)]
                )
                for k, v in variables.items()
            }
        prog = self._program(bucket, int(n_windows),
                             tuple(sorted(variables)))
        inputs = (jnp.asarray(window), jnp.asarray(steps),
                  {k: jnp.asarray(v) for k, v in variables.items()})
        if (self.mesh is not None and getattr(self.mesh, "size", 1) > 1
                and bucket % self.mesh.size == 0):
            # dp-shard the request across the serving slice; GSPMD keeps
            # every per-sample op local, so the rollout scales with devices
            from msmp_pde_tpu.parallel.mesh import shard_batch

            inputs = shard_batch(self.mesh, inputs)
        preds = prog(self.params, *inputs)
        return np.asarray(preds)[:B]

    def trajectory(self, window, **kw) -> np.ndarray:
        """Rollout reshaped to physical layout [B, S*tw, d, nx]."""
        preds = self.rollout(window, **kw)
        return windows_to_trajectory(preds, self.trainer.d, self.trainer.tw)

    def warmup(self, n_windows: int = 1):
        """Pre-compile every bucket at the given horizon."""
        nx = int(self.trainer.spec.x.shape[-1])
        d, tw = self.trainer.d, self.trainer.tw
        for b in self.buckets:
            self.rollout(np.zeros((b, nx, d * tw), np.float32),
                         n_windows=n_windows)


def windows_to_trajectory(preds: np.ndarray, d: int, tw: int) -> np.ndarray:
    """[B, S, nx, d*tw] component-major windows -> [B, S*tw, d, nx]
    (the rearr of training.metrics.rollout_store)."""
    B, S, nx, _ = preds.shape
    a = preds.reshape(B, S, nx, d, tw)
    return np.transpose(a, (0, 1, 4, 3, 2)).reshape(B, S * tw, d, nx)
