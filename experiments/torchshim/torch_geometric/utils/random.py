"""erdos_renyi_graph — the reference imports it (common/utils.py:12) but
only calls it when random_probability > 0, which is hardcoded to 0
(common/utils.py:294). Implemented anyway for completeness."""
import torch


def erdos_renyi_graph(num_nodes, edge_prob, directed=False):
    mask = torch.rand(num_nodes, num_nodes) < edge_prob
    mask.fill_diagonal_(False)
    if not directed:
        mask = mask | mask.t()
    src, dst = mask.nonzero(as_tuple=True)
    return torch.stack([src, dst], dim=0)
