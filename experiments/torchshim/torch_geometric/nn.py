"""Pure-torch stand-ins for the PyG layers the reference uses.

Functional: ``MessagePassing`` (aggr='mean', the only aggr the reference
uses — models_gnn.py:42,117), ``InstanceNorm`` (affine=False, biased
per-graph variance — PyG defaults), ``global_mean_pool``.

Import-only stubs: GCNConv/GATConv/SAGEConv/TransformerConv/RGATConv/
avg_pool_x/BatchNorm are imported by the reference (models_gnn.py:7,
models_gnn2D.py:6) but — except RGATConv in the GLEM2D variant — never
instantiated on the E1 head-to-head path; they raise if constructed.
"""
import inspect

import torch
from torch import nn


def _scatter_reduce(src, index, n, reduce):
    shape = (n,) + tuple(src.shape[1:])
    acc = torch.zeros(shape, dtype=src.dtype, device=src.device)
    expand = index.long().view((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
    acc.scatter_add_(0, expand, src)
    if reduce == "mean":
        count = torch.zeros(n, dtype=src.dtype, device=src.device)
        count.scatter_add_(0, index.long(),
                           torch.ones_like(index, dtype=src.dtype))
        acc = acc / count.clamp(min=1).view((n,) + (1,) * (src.dim() - 1))
    return acc


class MessagePassing(nn.Module):
    """Signature-introspecting propagate, matching PyG semantics for the
    reference's usage: flow='source_to_target' (messages from j =
    edge_index[0] to i = edge_index[1]), mean aggregation at i, ``update``
    called with (aggregated, <node args by name>)."""

    def __init__(self, aggr="mean", node_dim=-2, flow="source_to_target"):
        super().__init__()
        assert flow == "source_to_target"
        self.aggr = aggr

    def propagate(self, edge_index, **kwargs):
        src, dst = edge_index[0].long(), edge_index[1].long()
        msg_kwargs = {}
        for name in inspect.signature(self.message).parameters:
            if name.endswith("_i"):
                msg_kwargs[name] = kwargs[name[:-2]].index_select(0, dst)
            elif name.endswith("_j"):
                msg_kwargs[name] = kwargs[name[:-2]].index_select(0, src)
            else:
                msg_kwargs[name] = kwargs[name]
        msg = self.message(**msg_kwargs)
        n = kwargs["x"].size(0)
        agg = _scatter_reduce(msg, dst, n, self.aggr)
        upd_names = list(inspect.signature(self.update).parameters)
        upd_args = [agg] + [kwargs[name] for name in upd_names[1:]]
        return self.update(*upd_args)

    def message(self, x_j):  # pragma: no cover - always overridden
        return x_j

    def update(self, aggr_out):  # pragma: no cover - always overridden
        return aggr_out


class InstanceNorm(nn.Module):
    """PyG InstanceNorm defaults: affine=False, track_running_stats=False;
    per-graph per-channel normalization with biased variance and eps
    inside the sqrt (the same semantics as our JAX
    models/common.py::instance_norm)."""

    def __init__(self, in_channels, eps=1e-5, momentum=0.1, affine=False,
                 track_running_stats=False):
        super().__init__()
        assert not affine and not track_running_stats
        self.eps = eps

    def forward(self, x, batch=None):
        if batch is None:
            batch = torch.zeros(x.size(0), dtype=torch.long, device=x.device)
        b = batch.long()
        n = int(b.max().item()) + 1
        mean = _scatter_reduce(x, b, n, "mean")
        centered = x - mean.index_select(0, b)
        var = _scatter_reduce(centered * centered, b, n, "mean")
        return centered / (var + self.eps).sqrt().index_select(0, b)


def global_mean_pool(x, batch):
    n = int(batch.max().item()) + 1
    return _scatter_reduce(x, batch.long(), n, "mean")


def avg_pool_x(*args, **kwargs):
    raise NotImplementedError("avg_pool_x is imported but unused by the "
                              "reference (models_gnn.py:7)")


class _ImportOnlyStub(nn.Module):
    def __init__(self, *args, **kwargs):
        raise NotImplementedError(
            f"{type(self).__name__} shim is import-only; the E1 head-to-head "
            "path never constructs it")


class BatchNorm(_ImportOnlyStub):
    pass


class GCNConv(_ImportOnlyStub):
    pass


class GATConv(_ImportOnlyStub):
    pass


class SAGEConv(_ImportOnlyStub):
    pass


class TransformerConv(_ImportOnlyStub):
    pass


class RGATConv(_ImportOnlyStub):
    pass
