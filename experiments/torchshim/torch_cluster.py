"""Pure-torch stand-in for the ``torch_cluster`` CUDA/C++ extension.

Implements exactly the two graph builders the reference uses
(common/utils.py:10,368-380): ``radius_graph`` and ``knn_graph``, with
torch_cluster's edge convention (edge_index[0] = source/neighbor j,
edge_index[1] = target/query i; flow='source_to_target'), batch-aware,
no self loops. Brute-force distance matrices — fine at the reference's
graph sizes (<= a few thousand nodes per batch).
"""
import torch


def _as_2d(x):
    return x.view(-1, 1) if x.dim() == 1 else x


def _pairwise_ok(x, batch):
    """[N, N] bool: same-batch, not self."""
    n = x.size(0)
    same = batch.view(-1, 1) == batch.view(1, -1)
    eye = torch.eye(n, dtype=torch.bool, device=x.device)
    return same & ~eye


def radius_graph(x, r, batch=None, loop=False, max_num_neighbors=None,
                 flow="source_to_target"):
    x = _as_2d(x)
    n = x.size(0)
    if batch is None:
        batch = torch.zeros(n, dtype=torch.long, device=x.device)
    dist = torch.cdist(x, x)
    ok = _pairwise_ok(x, batch) if not loop else (
        batch.view(-1, 1) == batch.view(1, -1))
    adj = (dist <= r) & ok
    tgt, src = adj.nonzero(as_tuple=True)  # adj[i, j]: j within r of i
    return torch.stack([src, tgt], dim=0)


def knn_graph(x, k, batch=None, loop=False, flow="source_to_target"):
    x = _as_2d(x)
    n = x.size(0)
    if batch is None:
        batch = torch.zeros(n, dtype=torch.long, device=x.device)
    dist = torch.cdist(x, x)
    ok = _pairwise_ok(x, batch) if not loop else (
        batch.view(-1, 1) == batch.view(1, -1))
    dist = dist.masked_fill(~ok, float("inf"))
    k_eff = min(k, n - 1)
    _, nbr = dist.topk(k_eff, dim=1, largest=False)  # [N, k] neighbors of i
    tgt = torch.arange(n, device=x.device).view(-1, 1).expand_as(nbr)
    return torch.stack([nbr.reshape(-1), tgt.reshape(-1)], dim=0)
