"""Checkpoint / resume of the fmax products.

Equivalent of DumpProducts / ReadProductsFromDumps (fmax.c:372-506,
pinocchio.c:220-236): after the expensive collapse+displacement phase the
per-particle products are written to disk so a later run can skip straight
to fragmentation.  Consistency (grid size, seed, LPT order) is checked on
restart like the reference's summary file.
"""

from __future__ import annotations

import json
import os

import numpy as np

DUMP_DIR = "DumpProducts"


def dump_products(params, fmax_result, directory=".") -> str:
    ddir = os.path.join(directory, DUMP_DIR)
    os.makedirs(ddir, exist_ok=True)
    meta = dict(GridSize=params.GridSize, RandomSeed=params.RandomSeed,
                BoxSize=params.BoxSize, lpt_order=params.lpt_order,
                nsmooth=int(fmax_result.smoothing.n))
    with open(os.path.join(ddir, "summary.json"), "w") as fd:
        json.dump(meta, fd)
    arrays = dict(Fmax=np.asarray(fmax_result.products.Fmax),
                  Rmax=np.asarray(fmax_result.products.Rmax),
                  radii=fmax_result.smoothing.radii,
                  variance=fmax_result.smoothing.variance,
                  true_variance=fmax_result.smoothing.true_variance)
    for k, v in fmax_result.products.vel.items():
        arrays[f"vel_{k}"] = np.asarray(v)
    path = os.path.join(ddir, "products.npz")
    np.savez(path, **arrays)
    return path


def read_dumps(params, directory="."):
    """Returns an FmaxResult-compatible object or raises on mismatch."""
    from ..fmax import FmaxResult, Products, Smoothing
    from ..grids import Grid
    import jax.numpy as jnp

    ddir = os.path.join(directory, DUMP_DIR)
    with open(os.path.join(ddir, "summary.json")) as fd:
        meta = json.load(fd)
    for key, want in (("GridSize", params.GridSize),
                      ("RandomSeed", params.RandomSeed),
                      ("BoxSize", params.BoxSize),
                      ("lpt_order", params.lpt_order)):
        if meta[key] != want:
            raise ValueError(f"dump mismatch for {key}: dump has "
                             f"{meta[key]}, run wants {want}")
    data = np.load(os.path.join(ddir, "products.npz"))
    vel = {k[4:]: jnp.asarray(data[k]) for k in data.files
           if k.startswith("vel_")}
    sm = Smoothing(radii=data["radii"], variance=data["variance"],
                   true_variance=data["true_variance"])
    grid = Grid(N=params.GridSize, BoxSize=params.BoxSize_htrue)
    products = Products(Fmax=jnp.asarray(data["Fmax"]),
                        Rmax=jnp.asarray(data["Rmax"]), vel=vel)
    return FmaxResult(products=products, smoothing=sm, grid=grid,
                      kdensity=None, timings={})
