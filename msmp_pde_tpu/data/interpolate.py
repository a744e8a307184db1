"""RPU re-gridding: interpolate unstructured-grid AD datasets onto a uniform
grid, writing ``*_I.h5`` files.

Capability parity with /root/reference/common/interpolateDataset.py — same
output schema (groups per mode, per-resolution keys with uniform-grid attrs,
a/b parameter datasets). TPU-native difference: the reference interpolates
with a triple-nested Python loop over (sample, component, time)
(:98-106); here the whole dataset is one vectorized interp1d call.

Divergence (bug fix, documented): the reference *creates* the a/b datasets
but then overwrites the dict slot instead of writing the data
(:76-80), leaving zeros in the file; we copy the parameters properly.

    python -m msmp_pde_tpu.data.interpolate --experiment=RPU
"""
from __future__ import annotations

import argparse
import os

import h5py
import numpy as np


def interpolate_file(src: str, dst: str, x0: float = 0.0, xL: float = 16.0):
    import jax
    import jax.numpy as jnp

    from msmp_pde_tpu.ops.interp import interp1d

    if os.path.exists(dst):
        os.remove(dst)
    with h5py.File(src, "r") as fin, h5py.File(dst, "a") as fout:
        for mode in fin:
            gin = fin[mode]
            gout = fout.create_group(mode)
            for key in gin:
                if len(key.split("-")) <= 1:
                    gout.create_dataset(key, data=gin[key][:])
                    continue
                nx = int(key.split("-")[-1])
                x_struct = np.linspace(x0, xL, nx)
                x_rand = np.asarray(gin[key].attrs["x"])
                u = gin[key][:]  # [N, d, nt, nx]
                flat = u.reshape(-1, nx)
                out = np.asarray(
                    interp1d(
                        jnp.broadcast_to(jnp.asarray(x_rand)[None], flat.shape),
                        jnp.asarray(flat),
                        jnp.broadcast_to(jnp.asarray(x_struct)[None], flat.shape),
                    )
                ).reshape(u.shape)
                ds = gout.create_dataset(key, data=out)
                for a in ("dt", "nt", "tmin", "tmax"):
                    ds.attrs[a] = gin[key].attrs[a]
                ds.attrs["dx"] = xL / nx
                ds.attrs["nx"] = nx
                ds.attrs["x"] = x_struct
                print(f"{mode}/{key}: interpolated {u.shape}")


def main(args):
    import jax

    jax.config.update("jax_platforms", "cpu")
    src = f"data/AD_{args.experiment}.h5"
    dst = f"data/AD_{args.experiment}_I.h5"
    interpolate_file(src, dst, 0.0, args.domain_length)
    print(f"Wrote {dst}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--experiment", type=str, default="RPU")
    p.add_argument("--domain_length", type=float, default=16.0)
    main(p.parse_args())
