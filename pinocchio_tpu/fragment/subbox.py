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

import ctypes
import math
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import List, Tuple

import numpy as np

from ..config import Params
from ..cosmology import Cosmology
from .driver import (CatalogSnapshot, FragmentResult, SubboxGeometry,
                     run_fragmentation, _f32p, _i32p, _u8p)


def _host_copy(params, fmax_result, verbose=False, host_slice=None,
               all_geoms=None):
    """host_slice: multi-host mode — materialize ONLY this process's share
    of the products instead of gathering the global arrays through one
    host's RAM.  When the products are sharded over a multi-device mesh
    divisible into host groups, this runs the packed sparse all_to_all
    (parallel/exchange, the distribute.c:58-175 analog) so boundary-layer
    particles held by OTHER hosts' chips arrive too; otherwise it falls
    back to the per-shard local fetch (fetch_local_sparse), which is exact
    whenever the host's sub-boxes lie within its own shards."""
    import dataclasses

    from ..fmax import fetch_products_host
    local_only = host_slice is not None and host_slice[1] > 1
    if local_only and fmax_result.host_products is None \
            and not isinstance(fmax_result.products.Fmax, np.ndarray):
        sharding = getattr(fmax_result.products.Fmax, "sharding", None)
        mesh = getattr(sharding, "mesh", None)
        if (all_geoms is not None and mesh is not None
                and mesh.devices.size > 1
                and mesh.devices.size % host_slice[1] == 0):
            from ..parallel.exchange import exchange_products
            sp = exchange_products(params, fmax_result, mesh, all_geoms,
                                   host_slice[1],
                                   verbose=verbose)[host_slice[0]]
            if sp.segments is not None:
                # RECOMPUTE segments routed by the exchange, aligned
                # with the sparse rows
                return dataclasses.replace(
                    fmax_result, host_products=sp,
                    vel_segments=sp.segments, vel_segments_dev=None,
                    seg_sparse=True)
        else:
            from ..parallel.multihost import fetch_local_sparse
            sp = fetch_local_sparse(params, fmax_result)
        return dataclasses.replace(fmax_result, host_products=sp)
    return fetch_products_host(params, fmax_result, verbose=verbose)


def _exchange_mesh(fmax_result, nhosts: int):
    """The device mesh to run the cross-host exchange over, or None when
    the products are already on host / unsharded (same availability test
    as _host_copy's exchange branch)."""
    if fmax_result.host_products is not None \
            or isinstance(fmax_result.products.Fmax, np.ndarray):
        return None
    sharding = getattr(fmax_result.products.Fmax, "sharding", None)
    mesh = getattr(sharding, "mesh", None)
    if (mesh is not None and mesh.devices.size > 1
            and mesh.devices.size % nhosts == 0):
        return mesh
    return None


def _host_mem_bytes() -> float:
    """Total physical host memory (the budget ceiling for the sweep's
    gathered arrays)."""
    try:
        return float(os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES"))
    except (ValueError, OSError, AttributeError):
        return 16.0 * 1024 ** 3


def _single_turn_bytes(params, cosmo, geoms) -> float:
    """Predicted host bytes to sweep every sub-box's FULL padded volume
    (single-turn): padded cells x collapsed fraction x per-particle sweep
    payload (F, pos, displacement rows, group id, zacc)."""
    from ..planner import collapsed_fraction
    frac = collapsed_fraction(params, cosmo)
    nfields = {1: 1, 2: 2, 3: 4}[params.lpt_order]
    per_particle = 4 + 4 + 3 * nfields * 4 + 4 + 4
    padded = sum(float(np.prod(g.L)) for g in geoms)
    return padded * frac * per_particle


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


def turn0_bounds(geom: SubboxGeometry):
    """Turn-0 map box: the well-resolved region plus a 1-cell rim on each
    non-periodic side (create_map, fragment.c:708-751)."""
    r1, r2 = [], []
    for d in range(3):
        if geom.pbc[d]:
            r1.append(0)
            r2.append(geom.L[d])
        else:
            r1.append(max(0, geom.safe[d] - 1))
            r2.append(min(geom.L[d], geom.L[d] - geom.safe[d] + 1))
    return r1, r2


def _map_update_lib():
    from .. import native
    lib = native.load("groupsweep")
    if not getattr(lib, "_map_update_sig", False):
        lib.map_update.restype = ctypes.c_int
        lib.map_update.argtypes = [
            ctypes.c_int32, _i32p, _f32p, _i32p, _i32p, _i32p, _i32p,
            _u8p, ctypes.c_double, ctypes.POINTER(ctypes.c_int64)]
        lib._map_update_sig = True
    return lib


def boundary_sphere_map(params: Params, geom: SubboxGeometry, quick_res,
                        r1, r2):
    """Native update_map (build_groups.c:2246-2318): per quick-pass group,
    request a sphere of radius BoundaryLayerFactor * R_Lag(mass) around
    its Lagrangian CM; returns (add_map[ncells] uint8, counts[2]) with
    counts = (cells added, cells beyond the boundary layer)."""
    lib = _map_update_lib()
    ncells = int(np.prod(geom.L))
    add = np.zeros(ncells, np.uint8)
    counts = np.zeros(2, np.int64)
    g = quick_res.groups
    mass = np.ascontiguousarray(g.mass, np.int32)
    gq = np.ascontiguousarray(quick_res.groups_q, np.float32)
    arr3 = lambda v: np.ascontiguousarray(v, np.int32)  # noqa: E731
    rc = lib.map_update(
        np.int32(g.ngroups), mass.ctypes.data_as(_i32p),
        gq.ctypes.data_as(_f32p),
        arr3(geom.L).ctypes.data_as(_i32p),
        arr3(geom.pbc).ctypes.data_as(_i32p),
        arr3(r1).ctypes.data_as(_i32p), arr3(r2).ctypes.data_as(_i32p),
        add.ctypes.data_as(_u8p),
        ctypes.c_double(params.BoundaryLayerFactor),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if rc != 0:
        raise RuntimeError(f"map_update failed with code {rc}")
    return add, counts


def quick_pass_spheres(params: Params, geom: SubboxGeometry, quick_res,
                       r1, r2) -> np.ndarray:
    """Boundary-request spheres from one sub-box's quick pass, in GLOBAL
    grid coordinates: [ns, 4] float32 rows (cx, cy, cz, radius_cells) for
    every group whose request sphere (radius = BoundaryLayerFactor x
    R_Lagrangian, update_map build_groups.c:2252-2262) extends beyond the
    already-shipped turn-0 region.  This is what crosses hosts instead of
    the reference's per-cell frag_map_update bitmap (distribute.c:689-698)
    — a few floats per boundary-touching halo instead of bits per cell."""
    g = quick_res.groups
    if g.ngroups <= 1:
        return np.zeros((0, 4), np.float32)
    mass = np.asarray(g.mass[2:g.ngroups + 1], np.float64)
    c = quick_res.groups_q[2:g.ngroups + 1].astype(np.int32)
    size = (params.BoundaryLayerFactor
            * np.cbrt(mass / 4.188790205) + 0.5).astype(np.int32)
    # a sphere is needed unless fully inside along EVERY non-pbc dim
    # (map_update's fast path, groupsweep.c:1499-1505)
    fully = np.ones(len(mass), bool)
    for d in range(3):
        if not geom.pbc[d]:
            fully &= (c[:, d] - size >= r1[d]) & (c[:, d] + size < r2[d])
    keep = (mass > 0) & (size > 0) & ~fully
    N = geom.G[0]
    out = np.empty((int(keep.sum()), 4), np.float32)
    out[:, :3] = (c[keep] + np.asarray(geom.stabl, np.int32)) % N
    out[:, 3] = size[keep]
    return out


def _allgather_spheres(sph: np.ndarray, host_id: int, nhosts: int):
    """Every process needs every host's sphere list to pack the turn-1
    exchange.  Multi-process: two small collectives (counts, then padded
    rows — the MPI_Reduce of map counts, fragment.c:222).  Single-process
    mocks run each host's exchange separately, so only this host's list
    matters."""
    import jax
    if jax.process_count() == 1:
        return {host_id: sph}
    from jax.experimental import multihost_utils as mh
    counts = np.asarray(mh.process_allgather(
        np.array([len(sph)], np.int32))).ravel()
    cap = max(1, int(counts.max()))
    pad = np.zeros((cap, 4), np.float32)
    pad[:len(sph)] = sph
    allp = np.asarray(mh.process_allgather(pad))
    return {h: allp[h][:counts[h]] for h in range(nhosts)}


def _two_turn_exchange(params: Params, cosmo: Cosmology, fmax_result,
                       all_geoms, my_geoms, host_slice, mesh,
                       scaledep_gm=None, verbose: bool = False):
    """The V5 two-turn needed-particle scheme ACROSS hosts
    (fragment.c:159-316 + distribute.c two-pass maps): turn-0 exchange
    ships only each host's well-resolved regions + 1-cell rim; local
    quick sweeps find the halos; their boundary spheres are allgathered
    and a turn-1 exchange ships exactly the map-selected boundary cells.
    Cross-host wire bytes scale with the collapsed fraction of the
    RESOLVED volume plus actual halo boundary spheres, not the full
    padded volumes.  Returns (fmax_result with merged host products,
    per-sub-box cell masks for the final sweeps, quick seconds)."""
    import dataclasses

    from ..parallel.exchange import exchange_products, merge_sparse
    h, H = host_slice
    t0 = time.perf_counter()
    out0 = exchange_products(params, fmax_result, mesh, all_geoms, H,
                             turn=0, verbose=verbose)
    sp0 = out0[h]
    fr0 = dataclasses.replace(fmax_result, host_products=sp0)
    if sp0.segments is not None:
        fr0 = dataclasses.replace(fr0, vel_segments=sp0.segments,
                                  vel_segments_dev=None, seg_sparse=True)

    from .driver import run_fragmentation

    def quick_one(geom):
        r1, r2 = turn0_bounds(geom)
        base = np.zeros(geom.L, np.uint8)
        base[r1[0]:r2[0], r1[1]:r2[1], r1[2]:r2[2]] = 1
        base = base.ravel()
        if all(geom.pbc):
            return base, None
        qres = run_fragmentation(params, cosmo, fr0, geom=geom,
                                 scaledep_gm=scaledep_gm, cell_mask=base,
                                 quick=True, verbose=False)
        add, _counts = boundary_sphere_map(params, geom, qres, r1, r2)
        return base | add, quick_pass_spheres(params, geom, qres, r1, r2)

    if len(my_geoms) == 1:
        quick_out = [quick_one(my_geoms[0])]
    else:
        with ThreadPoolExecutor() as ex:
            quick_out = list(ex.map(quick_one, my_geoms))
    masks = [m for m, _ in quick_out]
    sph_parts = [s for _, s in quick_out if s is not None]
    t_quick = time.perf_counter() - t0
    sph = (np.concatenate(sph_parts) if sph_parts
           else np.zeros((0, 4), np.float32))
    spheres = _allgather_spheres(sph, h, H)
    out1 = exchange_products(params, fmax_result, mesh, all_geoms, H,
                             turn=1, spheres=spheres, verbose=verbose)
    sp = merge_sparse(sp0, out1.get(h))
    fr = dataclasses.replace(fmax_result, host_products=sp)
    if sp.segments is not None:
        fr = dataclasses.replace(fr, vel_segments=sp.segments,
                                 vel_segments_dev=None, seg_sparse=True)
    if verbose:
        print(f"  two-turn exchange: {len(sp0.ci)} resolved + "
              f"{len(sp.ci) - len(sp0.ci)} boundary particle-copies "
              f"({len(sph)} spheres), quick pass {t_quick:.1f}s")
    return fr, masks, t_quick


def run_fragmentation_two_turn(params: Params, cosmo: Cosmology,
                               fmax_result, geom: SubboxGeometry,
                               plc_geom=None, scaledep_gm=None,
                               verbose: bool = False) -> FragmentResult:
    """The V5 two-turn needed-particle scheme for one sub-box
    (fragment.c:159-316): turn 0 loads only the well-resolved region +
    1-cell rim and runs a stripped quick sweep; update_map adds
    boundary-layer spheres around the halos it found; turn 1 re-selects
    that union and runs the full sweep.  Fragmentation memory and sweep
    work scale with the collapsed fraction of the RESOLVED region, not
    the padded volume."""
    t0 = time.perf_counter()
    r1, r2 = turn0_bounds(geom)
    base = np.zeros(geom.L, np.uint8)
    base[r1[0]:r2[0], r1[1]:r2[1], r1[2]:r2[2]] = 1
    base = base.ravel()
    qres = run_fragmentation(params, cosmo, fmax_result, geom=geom,
                             scaledep_gm=scaledep_gm, cell_mask=base,
                             quick=True, verbose=False)
    add, counts = boundary_sphere_map(params, geom, qres, r1, r2)
    t_quick = time.perf_counter() - t0
    res = run_fragmentation(params, cosmo, fmax_result,
                            plc_geom=plc_geom, scaledep_gm=scaledep_gm,
                            geom=geom, cell_mask=base | add,
                            verbose=False)
    res.timings["quick"] = t_quick
    res.timings["boundary_requested"] = float(counts[0])
    res.timings["beyond_boundary"] = float(counts[1])
    if verbose:
        print(f"  two-turn: {int(counts[0])} boundary particles "
              f"requested, {res.nstored} stored"
              + (f", {int(counts[1])} beyond the boundary layer"
                 if counts[1] else ""))
    return res


def _merge_back(geoms, results, N):
    """distribute_back analog (distribute.c:718-948): collect each
    sub-box's per-particle zacc / group name for its WELL-RESOLVED region
    (boundary-layer copies are dropped, keep_data_back's good_particle
    test, distribute.c:813-817) and re-express positions in GLOBAL grid
    order so the timeless snapshot can scatter them (SNAPSHOT products)."""
    pos_parts, zacc_parts, grup_parts = [], [], []
    for geom, res in zip(geoms, results):
        if res.particle_pos is None or res.particle_grup is None:
            return None, None, None
        pos = res.particle_pos.astype(np.int64)
        Ly, Lz = geom.L[1], geom.L[2]
        k = pos % Lz
        j = (pos // Lz) % Ly
        i = pos // (Lz * Ly)
        good = np.ones(len(pos), bool)
        for d, c in ((0, i), (1, j), (2, k)):
            if geom.safe[d]:
                good &= (c >= geom.safe[d]) & (c < geom.L[d] - geom.safe[d])
        gi = (i[good] + geom.stabl[0]) % N
        gj = (j[good] + geom.stabl[1]) % N
        gk = (k[good] + geom.stabl[2]) % N
        pos_parts.append((gi * N + gj) * N + gk)
        zacc_parts.append(res.particle_zacc[good])
        grup_parts.append(res.particle_grup[good])
    return (np.concatenate(pos_parts), np.concatenate(zacc_parts),
            np.concatenate(grup_parts))


def run_fragmentation_multibox(params: Params, cosmo: Cosmology,
                               fmax_result, nbox, plc_geom=None,
                               scaledep_gm=None, largest_mass=None,
                               max_workers: int = None,
                               two_turn: bool = None,
                               host_slice: Tuple[int, int] = None,
                               verbose: bool = True) -> FragmentResult:
    """Fragment the box as nbox independent sub-domains and merge.

    two_turn (default: on unless params.classic_fragmentation) selects the
    V5 needed-particle scheme; sub-boxes with PBCs in all directions have
    no boundary layer and always take the single-turn path
    (fragment.c:190-199 all_pbc).

    host_slice=(host_id, nhosts): multi-host mode — this process sweeps
    only its round-robin share of the sub-boxes and fetches only its own
    chips' shards (parallel/multihost)."""
    if largest_mass is None:
        from ..io.catalogs import largest_halo_mass
        largest_mass = largest_halo_mass(params, cosmo)
    geoms = subbox_geometries(params, cosmo, largest_mass, nbox)
    if two_turn is None:
        # memory-driven default: the two-turn scheme costs a second sweep
        # of the well-resolved region (quick pass), so prefer the
        # single-turn full-padded-volume load when it fits comfortably in
        # host memory, and fall back to the V5 needed-particle scheme when
        # it would not (the reference is always-two-turn because its MPI
        # hosts are memory-bound, fragment.c:159-316; a 125 GB host is not
        # at 256^3-512^3)
        two_turn = (not params.classic_fragmentation
                    and _single_turn_bytes(params, cosmo, geoms)
                    > 0.5 * _host_mem_bytes())
    multi_host = host_slice is not None and host_slice[1] > 1
    all_geoms = geoms
    if multi_host:
        from ..parallel.multihost import host_subboxes
        geoms = host_subboxes(geoms, *host_slice)
        if not geoms:
            raise ValueError(f"host {host_slice[0]} owns no sub-boxes "
                             f"(nbox={nbox}, nhosts={host_slice[1]})")

    # materialize the products on the host ONCE: each sub-box sweep slices
    # these numpy arrays instead of re-fetching full device arrays
    # (the device->host link costs ~seconds/GB here)
    t_copy = time.perf_counter()
    masks = None
    t_quick = 0.0
    if multi_host and two_turn:
        mesh = _exchange_mesh(fmax_result, host_slice[1])
        if mesh is not None and any(not all(g.pbc) for g in geoms):
            # two-turn WIRE protocol: quick sweeps run between the two
            # exchanges, so only resolved + sphere-selected boundary
            # cells ever cross hosts (fragment.c:193-316)
            fmax_result, masks, t_quick = _two_turn_exchange(
                params, cosmo, fmax_result, all_geoms, geoms, host_slice,
                mesh, scaledep_gm=scaledep_gm, verbose=verbose)
    if masks is None:
        fmax_result = _host_copy(params, fmax_result, verbose=verbose,
                                 host_slice=host_slice,
                                 all_geoms=all_geoms)
    t_copy = time.perf_counter() - t_copy - t_quick
    if verbose:
        g0 = geoms[0]
        print(f"  fragmentation over {len(geoms)} sub-boxes "
              f"{nbox}; box 0: L={g0.L} safe={g0.safe}"
              + (" (two-turn)" if two_turn else ""))

    def one(args):
        i, geom = args
        if masks is not None:
            # quick pass already ran inside the two-turn exchange
            return run_fragmentation(params, cosmo, fmax_result,
                                     plc_geom=plc_geom,
                                     scaledep_gm=scaledep_gm, geom=geom,
                                     cell_mask=masks[i], verbose=False)
        if two_turn and not all(geom.pbc):
            return run_fragmentation_two_turn(
                params, cosmo, fmax_result, geom, plc_geom=plc_geom,
                scaledep_gm=scaledep_gm, verbose=False)
        return run_fragmentation(params, cosmo, fmax_result,
                                 plc_geom=plc_geom,
                                 scaledep_gm=scaledep_gm, geom=geom,
                                 verbose=False)

    if len(geoms) == 1:
        results = [one((0, geoms[0]))]
    else:
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            results = list(ex.map(one, enumerate(geoms)))

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
        timings={"total": max(r.timings["total"] for r in results),
                 "transfer": t_copy,
                 **{k: sum(r.timings.get(k, 0.0) for r in results)
                    + (t_quick if k == "quick" else 0.0)
                    for k in ("sort", "peaks", "sweep", "quick")},
                 "overhead": (sum(r.nstored for r in results)
                              / float(params.GridSize) ** 3)},
        best_pred_peak_factor=max(r.best_pred_peak_factor
                                  for r in results))
    if params.WriteTimelessSnapshot:
        # distribute_back analog: per-particle zacc / group name in
        # GLOBAL grid order for the timeless snapshot (SNAPSHOT products)
        (merged.particle_pos, merged.particle_zacc,
         merged.particle_grup) = _merge_back(geoms, results,
                                             params.GridSize)
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
        nreq = int(sum(r.timings.get("boundary_requested", 0.0)
                       for r in results))
        nbeyond = int(sum(r.timings.get("beyond_boundary", 0.0)
                          for r in results))
        msg = (f"  merged: {counters[0]} peaks, {counters[14]} good "
               f"halos; stored/total overhead "
               f"{merged.timings['overhead']:.3f}")
        if two_turn:
            msg += f" ({nreq} boundary particles requested)"
        print(msg)
        if nbeyond:
            print(f"  WARNING: {nbeyond} requested particles lie beyond "
                  f"the boundary layer, some halos may be inaccurate")
    return merged
