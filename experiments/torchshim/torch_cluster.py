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


def _pairwise_ok(x, batch, loop):
    """[N, N] bool: same-batch (and not self unless ``loop``)."""
    n = x.size(0)
    same = batch.view(-1, 1) == batch.view(1, -1)
    if loop:
        return same
    eye = torch.eye(n, dtype=torch.bool, device=x.device)
    return same & ~eye


def _topk_edges(dist, cap):
    """Per-row nearest <= cap finite-distance entries of an inf-masked
    [N, N] matrix -> (src, tgt) with torch_cluster's edge convention.
    Rows with fewer than ``cap`` valid entries (small graphs) contribute
    only their valid edges — topk fill-ins at inf distance are dropped,
    never cross-graph edges."""
    n = dist.size(0)
    vals, nbr = dist.topk(min(cap, n), dim=1, largest=False)
    tgt = torch.arange(n, device=dist.device).view(-1, 1).expand_as(nbr)
    keep = torch.isfinite(vals)
    return nbr[keep], tgt[keep]


def radius_graph(x, r, batch=None, loop=False, max_num_neighbors=32,
                 flow="source_to_target"):
    x = _as_2d(x)
    n = x.size(0)
    if batch is None:
        batch = torch.zeros(n, dtype=torch.long, device=x.device)
    dist = torch.cdist(x, x)
    ok = _pairwise_ok(x, batch, loop)
    # torch_cluster caps at max_num_neighbors (default 32) per query node;
    # it keeps an arbitrary in-radius subset — we keep the nearest, which
    # is deterministic and coincides whenever the cap is not hit.
    dist = dist.masked_fill(~ok | (dist > r), float("inf"))
    src, tgt = _topk_edges(dist, max_num_neighbors)
    return torch.stack([src, tgt], dim=0)


def knn_graph(x, k, batch=None, loop=False, flow="source_to_target"):
    x = _as_2d(x)
    n = x.size(0)
    if batch is None:
        batch = torch.zeros(n, dtype=torch.long, device=x.device)
    dist = torch.cdist(x, x)
    dist = dist.masked_fill(~_pairwise_ok(x, batch, loop), float("inf"))
    src, tgt = _topk_edges(dist, k)
    return torch.stack([src, tgt], dim=0)
