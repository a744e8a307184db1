"""Run the TORCH REFERENCE's own training stack, unmodified, on CPU.

Executes /root/reference/experiments/train.py verbatim via runpy, with the
pure-torch dependency shims in experiments/torchshim/ standing in for the
CUDA extensions its import graph needs (torch_geometric / torch_cluster /
torch_scatter / lem_cuda — SURVEY.md §2.3). Process-level patches (no
reference-code edits):

  * torch.Tensor.cuda -> identity when CUDA is unavailable (the LEMcuda
    module hardcodes ``.cuda()`` on its dt tensor, models_gnn.py:313)
  * torch.cuda.synchronize -> no-op
  * matplotlib Agg backend

Used for the estimate-free accuracy north star (VERDICT r2 #2): the
reference trains end-to-end at reduced scale on its own generated data;
our CLI trains at the identical config on the same files; RESULTS.md
records the head-to-head nRMSE delta.

Usage:
  python experiments/torchref_train.py --workdir=data_torchref_small \
      [any reference train.py flags, e.g. --experiment=E1 --model=MSMP-PDE]

The workdir must contain data/{PDE}_{mode}_{experiment}.h5; checkpoints
and logs are written beneath it.
"""
import os
import runpy
import sys

SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "torchshim")
REF = "/root/reference"


def main():
    argv = sys.argv[1:]
    workdir = "data_torchref_small"
    passthrough = []
    for a in argv:
        if a.startswith("--workdir="):
            workdir = a.split("=", 1)[1]
        else:
            passthrough.append(a)

    import matplotlib
    matplotlib.use("Agg")
    import torch
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.cuda.synchronize = lambda *a, **k: None

    sys.path.insert(0, REF)
    sys.path.insert(0, SHIM)
    os.chdir(workdir)
    sys.argv = ["train.py"] + passthrough
    runpy.run_path(os.path.join(REF, "experiments", "train.py"),
                   run_name="__main__")


if __name__ == "__main__":
    main()
