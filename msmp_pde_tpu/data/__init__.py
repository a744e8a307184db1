from msmp_pde_tpu.data.dataset import PDEDataset
from msmp_pde_tpu.data.graph import (
    GraphSpec,
    build_neighbors_radius,
    build_neighbors_knn,
    build_graph_spec,
    slice_windows,
    advance_windows,
)
