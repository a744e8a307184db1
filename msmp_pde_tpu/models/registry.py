"""Model registry: the 27 reference model names -> configured modules.

Name -> class mapping parity with ``getModel``
(/root/reference/experiments/train.py:24-194). Each entry returns
(flax module, kind) where kind is:

  * "graph" — the MP-PDE family; forward(window [B, nx, d*tw], pos_x, t,
    var_vec, idx, mask) on the static neighbor-list graph;
  * "grid"  — CNN/FNO baselines; forward(window [B, tw(, d), nx], ...)
    on the raw grid layout.
"""
from __future__ import annotations

from typing import Tuple

from msmp_pde_tpu.models.cnn import BaseCNN
from msmp_pde_tpu.models.fno import FNO1d, FNO2d, VNO1d
from msmp_pde_tpu.models.gnn import MPSolver


def get_model(
    name: str,
    *,
    tw: int,
    n_eq_vars: int,
    L: float,
    tmax: float,
    dt: float,
    n_layers: int = 6,
    eq_var_names: Tuple[str, ...] = (),
    positions=None,
    mp_impl: str = "auto",
    lem_impl: str = "auto",
    mp_precision: str = "float32",
    mp_inference: bool = False,
    mp_remat: bool = False,
) -> Tuple[object, str]:
    common = dict(tw=tw, layers=n_layers, L=L, tmax=tmax, dt=dt,
                  mp_impl=mp_impl, lem_impl=lem_impl,
                  mp_precision=mp_precision, mp_inference=mp_inference,
                  mp_remat=mp_remat)
    g1 = dict(common, n_components=1)
    g2 = dict(common, n_components=2)
    # FNO param variants consume alpha/beta/gamma/D/r in 1D
    # (models_fno.py:170-183) and a/b in 2D (models_fno2D.py:169-176).
    fno_vars = tuple(
        v for v in eq_var_names
        if v in ("alpha", "beta", "gamma", "D", "r", "a", "b")
    )

    graph = {
        # --- 1D (models_gnn.py) ---
        "MP-PDE": lambda: MPSolver(**g1, encoder="mlp", gate="none"),
        "Gated": lambda: MPSolver(**g1, encoder="mlp", gate="sigmoid"),
        "LEM": lambda: MPSolver(**g1, encoder="lem", gate="none"),
        "MSMP-PDE": lambda: MPSolver(**g1, encoder="lem", gate="sigmoid"),
        "MSSMP-PDE": lambda: MPSolver(**g1, twin_scale=True),
        "MSGMP-PDE": lambda: MPSolver(
            **g1, encoder="lem", gate="sigmoid", decoder="glu", hidden=164
        ),
        "SaveMSMP-PDE": lambda: MPSolver(
            **g1, encoder="lem", gate="sigmoid", save_state=True
        ),
        "LSTMGated": lambda: MPSolver(**g1, encoder="lstm", gate="sigmoid"),
        "LSTM": lambda: MPSolver(**g1, encoder="lstm", gate="none"),
        # --- 2D systems (models_gnn2D.py) ---
        "MP-PDE2D": lambda: MPSolver(**g2, encoder="mlp", gate="none"),
        "Gated2D": lambda: MPSolver(**g2, encoder="mlp", gate="sigmoid"),
        "MSMP-PDE2D": lambda: MPSolver(**g2, encoder="lem", gate="sigmoid"),
        "MSGMP-PDE2D": lambda: MPSolver(
            **g2, encoder="lem", gate="sigmoid", decoder="glu", hidden=164
        ),
        "SaveMSMP-PDE2D": lambda: MPSolver(
            **g2, encoder="lem", gate="sigmoid", save_state=True
        ),
        "MSG2-PDE2D": lambda: MPSolver(**g2, encoder="lem", gate="grad"),
        "LSTMGated2D": lambda: MPSolver(**g2, encoder="lstm", gate="sigmoid"),
        "LEM2D": lambda: MPSolver(**g2, encoder="lem", gate="none"),
        "GLEMGated2D": lambda: MPSolver(
            **g2, encoder="lem", gate="sigmoid", layer_type="gat"
        ),
        "LSTM2D": lambda: MPSolver(**g2, encoder="lstm", gate="none"),
    }
    grid = {
        "BaseCNN": lambda: BaseCNN(tw=tw, dt=dt, n_components=1),
        "BaseCNN2D": lambda: BaseCNN(tw=tw, dt=dt, n_components=2),
        "FNO": lambda: FNO1d(tw=tw, domain=(0.0, L)),
        "FNOP": lambda: FNO1d(tw=tw, domain=(0.0, L), eq_var_names=fno_vars),
        "VNO": lambda: VNO1d(tw=tw, domain=(0.0, L), positions=positions),
        "FNO2D": lambda: FNO2d(tw=tw, domain=(0.0, L)),
        "FNO2DP": lambda: FNO2d(tw=tw, domain=(0.0, L), eq_var_names=fno_vars),
        "FNO2DPU": lambda: FNO2d(
            tw=tw, domain=(0.0, L), eq_var_names=fno_vars, unstructured=True
        ),
    }
    if name in graph:
        return graph[name](), "graph"
    if name in grid:
        return grid[name](), "grid"
    raise ValueError(f"unknown model {name!r}")


MODEL_REGISTRY = (
    "MP-PDE", "BaseCNN", "Gated", "LEM", "MSMP-PDE", "MSSMP-PDE", "MSGMP-PDE",
    "SaveMSMP-PDE", "LSTMGated", "LSTM", "FNO", "VNO", "FNOP",
    "MP-PDE2D", "Gated2D", "MSMP-PDE2D", "MSGMP-PDE2D", "SaveMSMP-PDE2D",
    "MSG2-PDE2D", "BaseCNN2D", "LSTMGated2D", "LEM2D", "GLEMGated2D",
    "LSTM2D", "FNO2D", "FNO2DP", "FNO2DPU",
)
