"""PyG ``Data``: an attribute bag of tensors with ``.to(device)``.

The reference builds one batched graph by hand (common/utils.py:320-428)
and never uses Batch/collation, so a plain container suffices.
"""
import torch


class Data:
    def __init__(self, x=None, edge_index=None, **kwargs):
        self.x = x
        self.edge_index = edge_index
        for k, v in kwargs.items():
            setattr(self, k, v)

    def to(self, device):
        for k, v in list(self.__dict__.items()):
            if torch.is_tensor(v):
                setattr(self, k, v.to(device))
        return self

    @property
    def num_nodes(self):
        return self.x.size(0) if self.x is not None else None

    def __repr__(self):
        keys = ", ".join(sorted(self.__dict__))
        return f"Data({keys})"
