"""Pure-torch stand-in for the ``torch_scatter`` CUDA extension.

Only the surface the reference uses is implemented: ``scatter`` with
``reduce`` in {sum, add, mean} along dim 0 (models_gnn.py:9,
models_gnn2D.py:7,600). Used so the unmodified reference
``experiments/train.py`` can run on CPU for the estimate-free accuracy
head-to-head (VERDICT r2 #2).
"""
import torch


def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
    if dim < 0:
        dim = src.dim() + dim
    if dim != 0:
        # the reference only scatters along the node dimension; normalize
        # by moving it to the front and back
        src_t = src.transpose(0, dim)
        res = scatter(src_t, index, 0, None, dim_size, reduce)
        return res.transpose(0, dim)
    n = int(dim_size) if dim_size is not None else int(index.max().item()) + 1
    shape = (n,) + tuple(src.shape[1:])
    acc = torch.zeros(shape, dtype=src.dtype, device=src.device)
    idx = index.long()
    expand = idx.view((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
    acc.scatter_add_(0, expand, src)
    if reduce in ("sum", "add"):
        result = acc
    elif reduce == "mean":
        count = torch.zeros(n, dtype=src.dtype, device=src.device)
        count.scatter_add_(0, idx, torch.ones_like(idx, dtype=src.dtype))
        count = count.clamp(min=1).view((n,) + (1,) * (src.dim() - 1))
        result = acc / count
    else:
        raise NotImplementedError(f"reduce={reduce}")
    if out is not None:
        out.copy_(result)
        return out
    return result
