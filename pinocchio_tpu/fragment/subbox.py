"""Multi-subbox fragmentation: the domain decomposition of the reference's
V5 fragmentation (set_subboxes, initialization.c:933-1140) on one host.

The grid is split into nbox[0] x nbox[1] x nbox[2] sub-volumes, each padded
with a boundary layer ('safe') sized to BoundaryLayerFactor times the
Lagrangian radius of the largest expected halo.  Each sub-volume runs the
same native sweep independently — there is no communication during group
building (DOCUMENTATION:127-133) — and only halos whose peak lies in the
well-resolved region ('good') are kept, so the union over sub-boxes is
exact up to boundary-layer truncation of the largest halos.

Sub-boxes are swept concurrently: the native call releases the GIL, so a
thread pool keeps all host cores busy.
"""

from __future__ import annotations

import math
from concurrent.futures import ThreadPoolExecutor
from typing import List, Tuple

import numpy as np

from ..config import Params
from ..cosmology import Cosmology
from .driver import (CatalogSnapshot, FragmentResult, SubboxGeometry,
                     run_fragmentation)


def _host_copy(params, fmax_result, verbose=False):
    from ..fmax import fetch_products_host
    return fetch_products_host(params, fmax_result, verbose=verbose)


def find_start(L: int, n: int, ibox: int) -> int:
    # initialization.c:1142-1159
    if n == 1:
        return 0
    LL, MM = L // n, L % n
    if ibox == 0:
        return 0
    if ibox <= MM:
        return ibox * (LL + 1)
    return ibox * LL + MM


def find_length(L: int, n: int, ibox: int) -> int:
    # initialization.c:1161-1179
    if n == 1:
        return L
    LL, MM = L // n, L % n
    return LL + 1 if ibox < MM else LL


def choose_nbox(params: Params, cosmo: Cosmology, largest_mass: float,
                ntasks: int) -> Tuple[int, int, int]:
    """Factorization of ntasks minimizing the communicated boundary
    surface (set_subboxes, initialization.c:958-994)."""
    N = params.GridSize
    sizeG = float(cosmo.SizeForMass(largest_mass)) / params.InterPartDist
    best, best_surface = (1, 1, ntasks), float("inf")
    for k in range(1, ntasks + 1):
        if ntasks % k:
            continue
        for j in range(1, ntasks // k + 1):
            if (ntasks // k) % j:
                continue
            i = ntasks // k // j
            N1 = find_length(N, i, 0)
            N2 = find_length(N, j, 0)
            N3 = find_length(N, k, 0)
            this = ((2 * N2 * N3 if i > 1 else 0)
                    + (2 * N1 * N3 if j > 1 else 0)
                    + (2 * N1 * N2 if k > 1 else 0))
            tt = this
            if N1 / 2 < sizeG:
                this += tt * (2 * sizeG / N1) ** 2
            if N2 / 2 < sizeG:
                this += tt * (2 * sizeG / N2) ** 2
            if N3 / 2 < sizeG:
                this += tt * (2 * sizeG / N3) ** 2
            if this < best_surface:
                best_surface = this
                best = (i, j, k)
    return best


def subbox_geometries(params: Params, cosmo: Cosmology, largest_mass: float,
                      nbox: Tuple[int, int, int]) -> List[SubboxGeometry]:
    """All sub-box geometries with boundary layers
    (initialization.c:1011-1057)."""
    N = params.GridSize
    sizeG = float(cosmo.SizeForMass(largest_mass)) / params.InterPartDist
    BB = int(params.BoundaryLayerFactor * sizeG + 1)
    geoms = []
    for bx in range(nbox[0]):
        for by in range(nbox[1]):
            for bz in range(nbox[2]):
                mybox = (bx, by, bz)
                Lgrid = [find_length(N, nbox[d], mybox[d])
                         for d in range(3)]
                pbc = [1 if nbox[d] == 1 else 0 for d in range(3)]
                safe = [0 if pbc[d] else
                        min(BB, N // 2 - Lgrid[d] // 2 - 1)
                        for d in range(3)]
                Lgwbl = [Lgrid[d] + 2 * safe[d] for d in range(3)]
                start = [find_start(N, nbox[d], mybox[d])
                         for d in range(3)]
                stabl = [start[d] - safe[d] for d in range(3)]
                geoms.append(SubboxGeometry(
                    L=tuple(Lgwbl), pbc=tuple(pbc), safe=tuple(safe),
                    stabl=tuple(stabl), G=(N, N, N)))
    return geoms


def run_fragmentation_multibox(params: Params, cosmo: Cosmology,
                               fmax_result, nbox, plc_geom=None,
                               scaledep_gm=None, largest_mass=None,
                               max_workers: int = None,
                               verbose: bool = True) -> FragmentResult:
    """Fragment the box as nbox independent sub-domains and merge."""
    if largest_mass is None:
        from ..io.catalogs import largest_halo_mass
        largest_mass = largest_halo_mass(params, cosmo)
    geoms = subbox_geometries(params, cosmo, largest_mass, nbox)

    # materialize the products on the host ONCE: each sub-box sweep slices
    # these numpy arrays instead of re-fetching full device arrays
    # (the device->host link costs ~seconds/GB here)
    fmax_result = _host_copy(params, fmax_result, verbose=verbose)
    if verbose:
        g0 = geoms[0]
        print(f"  fragmentation over {len(geoms)} sub-boxes "
              f"{nbox}; box 0: L={g0.L} safe={g0.safe}")

    def one(geom):
        return run_fragmentation(params, cosmo, fmax_result,
                                 plc_geom=plc_geom,
                                 scaledep_gm=scaledep_gm, geom=geom,
                                 verbose=False)

    if len(geoms) == 1:
        results = [one(geoms[0])]
    else:
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            results = list(ex.map(one, geoms))

    # ---- merge ----
    catalogs = []
    for iout, z in enumerate(params.output_z):
        parts = [r.catalogs[iout] for r in results]
        catalogs.append(CatalogSnapshot(
            z=z,
            name=np.concatenate([s.name for s in parts]),
            mass=np.concatenate([s.mass for s in parts]),
            q=np.concatenate([s.q for s in parts]),
            x=np.concatenate([s.x for s in parts]),
            v=np.concatenate([s.v for s in parts])))

    counters = np.sum([r.counters for r in results], axis=0)
    merged = FragmentResult(
        catalogs=catalogs,
        groups=[r.groups for r in results],     # list: one per sub-box
        counters=counters,
        npeaks=sum(r.npeaks for r in results),
        nstored=sum(r.nstored for r in results),
        timings={"total": max(r.timings["total"] for r in results)},
        best_pred_peak_factor=max(r.best_pred_peak_factor
                                  for r in results))
    if results[0].plc is not None:
        from .driver import PlcResult
        merged.plc = PlcResult(
            name=np.concatenate([r.plc.name for r in results]),
            z=np.concatenate([r.plc.z for r in results]),
            mass=np.concatenate([r.plc.mass for r in results]),
            x=np.concatenate([r.plc.x for r in results]),
            v=np.concatenate([r.plc.v for r in results]),
            nz=np.sum([r.plc.nz for r in results], axis=0),
            overflow=any(r.plc.overflow for r in results))
    if verbose:
        print(f"  merged: {counters[0]} peaks, {counters[14]} good halos")
    return merged
