"""Slice the first N samples of each split out of an existing dataset.

Used for sample-budget-matched controls: the torch-reference KS cross-data
training set is CPU-generated and therefore small (128/16/16 — its datagen
runs at ~2 min/sample on this 1-core host, reference
generate/generate_data.py:544-650), so the own-data comparison row must be
trained at the SAME sample budget or the comparison conflates data
provenance with dataset size.

Usage:
  python experiments/make_subset.py --experiment KS \
      --train 128 --valid 16 --test 16 --suffix _s128
writes data/KS_KS_s128.h5 from data/KS_KS.h5 (every dataset sliced on its
first axis, all group/dataset attrs copied verbatim).
"""
import argparse
import os
import sys

import h5py

PREFIX = {"E1": "CE", "E2": "CE", "E3": "CE", "kdv": "KdV", "nsorted": "CE",
          "WE1": "WE", "WE2": "WE", "WE3": "WE", "KF": "KF", "KS": "KS",
          "RP": "AD", "RPU": "AD", "MSWG": "AD", "MSWG3": "AD"}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", required=True)
    p.add_argument("--train", type=int, default=128)
    p.add_argument("--valid", type=int, default=16)
    p.add_argument("--test", type=int, default=16)
    p.add_argument("--suffix", default="_s128")
    p.add_argument("--data_dir", default="data")
    args = p.parse_args()

    base = f"{PREFIX[args.experiment]}_{args.experiment}"
    src = os.path.join(args.data_dir, base + ".h5")
    dst = os.path.join(args.data_dir, base + args.suffix + ".h5")
    n_for = {"train": args.train, "valid": args.valid, "test": args.test}

    with h5py.File(src) as fi, h5py.File(dst, "w") as fo:
        for mode, gi in fi.items():
            n = n_for.get(mode)
            if n is None:
                continue
            go = fo.create_group(mode)
            for k, v in gi.attrs.items():
                go.attrs[k] = v
            for name, ds in gi.items():
                data = ds[:n] if ds.ndim >= 1 and ds.shape[0] >= n else ds[()]
                out = go.create_dataset(name, data=data)
                for k, v in ds.attrs.items():
                    out.attrs[k] = v
            print(f"{mode}: {list(gi)} -> first {n} samples", file=sys.stderr)
    print(dst)


if __name__ == "__main__":
    main()
