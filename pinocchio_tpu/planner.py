"""Run planner: predict memory and decomposition for a planned run without
allocating anything.

Analog of the reference's run_planner tool (run_planner.c:44-427,
DOCUMENTATION:786-797), built on this engine's memory model instead of the
MPI one: per-chip HBM for the fmax stage, host memory for fragmentation,
sub-box decomposition and boundary overhead, output file sizes.

Usage: python -m pinocchio_tpu.planner <parameter_file> [--chips N]
       [--hbm-gb G] [--subboxes N]
"""

from __future__ import annotations

import argparse
import math

from .config import Params, read_parameter_file
from .cosmology import Cosmology

GB = 1024.0 ** 3


def plan(params: Params, n_chips: int = 1, hbm_gb: float = 16.0,
         subboxes: int = None, verbose: bool = True) -> dict:
    cosmo = Cosmology(params)
    from .fmax import Smoothing
    from .fragment.subbox import choose_nbox, subbox_geometries
    from .io.catalogs import largest_halo_mass

    N = params.GridSize
    ntot = N ** 3
    sm = Smoothing.build(params, cosmo)
    largest = largest_halo_mass(params, cosmo)
    nfields = {1: 1, 2: 2, 3: 4}[params.lpt_order]

    # ---- fmax stage (device) ----
    f4 = 4
    per_chip_cells = ntot / n_chips
    mem = dict(
        kdensity=per_chip_cells * (N // 2 + 1) / N * 2 * f4 * 2,
        hessian=6 * per_chip_cells * f4,
        fmax_rmax=2 * per_chip_cells * f4,
        displacements=3 * nfields * per_chip_cells * f4,
        fft_scratch=4 * per_chip_cells * f4 * 2,
    )
    nseg = len(params.output_z) if params.recompute_displacements else 1
    mem["displacements"] *= nseg
    device_total = sum(mem.values())

    # ---- fragmentation (host) ----
    # collapsed fraction estimate from the linear variance: P(F >= Flast)
    import numpy as np
    from scipy.stats import norm as gauss
    sigma = math.sqrt(sm.variance[-1])
    D = float(cosmo.GrowingMode(params.zlast, params.k_for_GM))
    frac_coll = min(1.0, 2.0 * float(gauss.sf(1.686 / (sigma * D))) * 3.5)
    nstored = frac_coll * ntot
    bytes_per_particle = (4 + 4 + 3 * nfields * 4 * (1 + nseg) + 4 + 4 + 4)
    host_frag = nstored * bytes_per_particle + ntot * 4   # + loc grid

    nsub = subboxes or n_chips
    nbox = choose_nbox(params, cosmo, largest, nsub)
    geoms = subbox_geometries(params, cosmo, largest, nbox)
    overhead = sum(float(np.prod(g.L)) for g in geoms) / ntot

    # ---- outputs (estimate_file_size analog, fragment.c:964-1065) ----
    npeaks_est = ntot / 6 * params.PredPeakFactor
    catalog_bytes = npeaks_est * 0.3 * 56 * len(params.output_z)

    report = dict(
        grid=N, n_chips=n_chips, nsmooth=sm.n,
        device_bytes=device_total,
        device_breakdown=mem,
        fits_hbm=device_total < hbm_gb * GB,
        est_collapsed_fraction=frac_coll,
        host_fragmentation_bytes=host_frag,
        nbox=nbox, boundary_overhead=overhead,
        est_catalog_bytes=catalog_bytes,
        largest_halo_Msun=largest,
    )
    if verbose:
        print(f"RUN PLAN for {N}^3 on {n_chips} chip(s), "
              f"{hbm_gb:.0f} GB HBM each")
        print(f"  smoothing radii:            {sm.n}")
        print(f"  largest expected halo:      {largest:.3g} Msun")
        print(f"  device memory (fmax stage): "
              f"{device_total / GB:.2f} GB/chip "
              f"{'(OK)' if report['fits_hbm'] else '(EXCEEDS HBM!)'}")
        for k, v in mem.items():
            print(f"     {k:<16s} {v / GB:8.3f} GB")
        print(f"  est. collapsed fraction:    {frac_coll:.2f}")
        print(f"  host fragmentation memory:  {host_frag / GB:.2f} GB")
        print(f"  sub-box decomposition:      {nbox}, boundary overhead "
              f"{overhead:.2f}x")
        print(f"  est. catalog output size:   "
              f"{catalog_bytes / GB * 1024:.1f} MB")
    return report


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("parameter_file")
    ap.add_argument("--chips", type=int, default=1)
    ap.add_argument("--hbm-gb", type=float, default=16.0)
    ap.add_argument("--subboxes", type=int, default=None)
    ap.add_argument("--grid", type=int, default=None)
    ap.add_argument("--norad", action="store_true")
    args = ap.parse_args(argv)
    overrides = {"norad": True} if args.norad else {}
    params = read_parameter_file(args.parameter_file, **overrides)
    if args.grid:
        params.GridSize = args.grid
    plan(params, n_chips=args.chips, hbm_gb=args.hbm_gb,
         subboxes=args.subboxes)


if __name__ == "__main__":
    main()
