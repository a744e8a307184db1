"""Minimal pure-torch stand-in for torch_geometric — just the surface the
reference imports (common/utils.py:9-12, experiments/models_gnn.py:5,7,
models_gnn2D.py:3,6), so the unmodified reference training stack runs on
CPU for the estimate-free accuracy head-to-head (VERDICT r2 #2)."""
from . import data, nn, utils  # noqa: F401
