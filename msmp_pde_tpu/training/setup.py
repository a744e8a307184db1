"""Shared experiment setup: TaskID -> PDE, eq-variable norms, datasets,
graph spec, model, trainer. Used by the train/eval/cv CLIs.

Mirrors the dispatch blocks of /root/reference/experiments/train.py:305-401.
"""
from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np

from msmp_pde_tpu.data import PDEDataset, build_graph_spec
from msmp_pde_tpu.equations import AD, CE, KF, KS, WE
from msmp_pde_tpu.models import get_model
from msmp_pde_tpu.training.loop import Trainer


def pde_for_experiment(experiment: str, base_resolution):
    """Experiment -> PDE instance + resolution asserts (train.py:305-330).

    Divergence: the reference blocks all WE training via a model-name check
    that can never pass (train.py:313-314, args.model is never 'GNN') — we
    allow WE training."""
    nt, nx = base_resolution
    if experiment in ("E1", "E2", "E3", "kdv"):
        assert nt == 250 and nx in (100, 50, 40)
        return CE(tmax=4.0 if experiment in ("E1", "E2") else 2.0,
                  grid_size=(nt, nx))
    if experiment in ("WE1", "WE2", "WE3"):
        assert nt == 250 and nx in (100, 50, 40, 20)
        return WE(tmax=100.0, grid_size=(nt, nx))
    if experiment == "KF":
        assert nt == 250 and nx in (100, 50, 40)
        return KF(tmax=5.0, grid_size=(nt, nx))
    if experiment == "KS":
        assert nt in (250, 500) and nx in (100, 50, 40)
        return KS(L=22.0 / (2 * np.pi), nx=nx, dt=0.00025, tend=100.0,
                  dt_downsampled=100.0 / nt)
    if experiment in ("RP", "RPU", "MSWG", "MSWG3"):
        assert nt in (250, 500) and nx in (100, 50, 40)
        L = 2 * np.pi if experiment in ("MSWG", "MSWG3") else 16.0
        tmax = {"RP": 4.0, "RPU": 4.0, "MSWG": 3.0, "MSWG3": 1.0}[experiment]
        pde = AD(tmax=tmax, grid_size=(nt, nx), L=L)
        pde.unstructured_grid = experiment == "RPU"
        return pde
    raise ValueError(f"unknown experiment {experiment!r}")


def eq_variable_norms(experiment: str, parameter_ablation: bool = False):
    """Equation-specific input variables per task (train.py:374-395)."""
    if parameter_ablation:
        return {}
    return {
        "E2": {"beta": 0.2},
        "E3": {"alpha": 3.0, "beta": 0.4, "gamma": 1.0},
        "WE3": {"bc_left": 1, "bc_right": 1},
        "KF": {"D": 1e-4, "r": 1.0},
        "RP": {"a": 1.0, "b": 1.0},
        "RPU": {"a": 1.0, "b": 1.0},
        "MSWG": {"a": 1.0, "b": 1.0},
        "MSWG3": {"a": 1.0, "b": 1.0},
    }.get(experiment, {})


def data_family(experiment: str) -> str:
    for fam, exps in {
        "CE": ("E1", "E2", "E3", "kdv"),
        "WE": ("WE1", "WE2", "WE3"),
        "KF": ("KF",),
        "KS": ("KS",),
        "AD": ("RP", "RPU", "MSWG", "MSWG3"),
    }.items():
        if experiment in exps:
            return fam
    raise ValueError(experiment)


def resolve_data_path(data_dir: str, fam: str, experiment: str, suffix: str,
                      mode: str) -> str:
    """Dataset file for one mode: our merged layout
    ``{fam}_{experiment}.h5`` (all three mode groups in one file) first, then
    the reference's one-file-per-mode layout ``{fam}_{mode}_{experiment}.h5``
    (generate_data.py:328-330) — torch-reference-generated files load
    unmodified."""
    import os

    merged = f"{data_dir}/{fam}_{experiment}{suffix}.h5"
    if os.path.exists(merged):
        return merged
    per_mode = f"{data_dir}/{fam}_{mode}_{experiment}{suffix}.h5"
    if os.path.exists(per_mode):
        return per_mode
    return merged  # canonical name in the error message if neither exists


@dataclasses.dataclass
class Experiment:
    pde: object
    eq_norms: Dict[str, float]
    datasets: Dict[str, PDEDataset]
    spec: object
    model: object
    kind: str
    trainer: Trainer

    @property
    def t_res(self) -> int:
        return self.datasets["train"].nt


def setup_experiment(args, modes=("train", "valid", "test"),
                     data_dir: str = "data") -> Experiment:
    pde = pde_for_experiment(args.experiment, tuple(args.base_resolution))
    eq_norms = eq_variable_norms(
        args.experiment, getattr(args, "parameter_ablation", False)
    )
    fam = data_family(args.experiment)
    suffix = getattr(args, "data_suffix", "")
    if suffix:
        # training on the interpolated (_I) uniform-grid datasets
        pde.unstructured_grid = False
    datasets = {
        m: PDEDataset(
            resolve_data_path(data_dir, fam, args.experiment, suffix, m),
            pde, m,
            base_resolution=tuple(args.base_resolution),
            super_resolution=tuple(args.super_resolution),
        )
        for m in modes
    }
    ds0 = datasets[modes[0]]
    spec = build_graph_spec(pde, ds0, args.neighbors, args.time_window)
    model, kind = get_model(
        args.model,
        tw=args.time_window,
        n_eq_vars=len(eq_norms),
        L=float(getattr(pde, "L", 16.0)),
        tmax=float(ds0.tmax),
        dt=float(ds0.dt),
        n_layers=args.n_graph_layers,
        eq_var_names=tuple(eq_norms.keys()),
        positions=np.asarray(ds0.x),
        mp_precision=getattr(args, "mp_precision", "float32"),
        mp_remat=getattr(args, "mp_remat", False),
    )
    trainer = Trainer(model=model, kind=kind, spec=spec, eq_norms=eq_norms)
    return Experiment(
        pde=pde, eq_norms=eq_norms, datasets=datasets, spec=spec,
        model=model, kind=kind, trainer=trainer,
    )
