"""Fragmentation driver: from fmax products to halos.

Python-side orchestration of the native group sweep (native/groupsweep.c):
particle selection + Fmax sort (fragment.c:484-520), peak counting
(fragment.c:605-706), growth-weight tables, and the ctypes bridge.

Round-1 scope: a single sub-box spanning the full grid with periodic
boundaries — the configuration the reference uses for any single-task run
(set_subboxes, initialization.c:933-1140, nbox=1 -> pbc on, safe=0).
Multi-subbox domains with boundary layers ride on the same C kernel.
"""

from __future__ import annotations

import ctypes
import math
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from ..config import Params
from ..cosmology import Cosmology
from ..fmax import FmaxResult
from .. import native

FILAMENT = 1
DELTAM = 0.05
NCOUNTERS = 16

_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)
_f32p = ctypes.POINTER(ctypes.c_float)
_f64p = ctypes.POINTER(ctypes.c_double)
_u64p = ctypes.POINTER(ctypes.c_uint64)
_u8p = ctypes.POINTER(ctypes.c_uint8)


class _SweepInput(ctypes.Structure):
    _fields_ = [
        ("n", ctypes.c_int64),
        ("Fmax", _f32p), ("pos", _i32p),
        ("v1", _f32p), ("v2", _f32p), ("v31", _f32p), ("v32", _f32p),
        ("loc", _i32p), ("rowmap", _i32p),
        ("L", ctypes.c_int32 * 3), ("pbc", ctypes.c_int32 * 3),
        ("safe", ctypes.c_int32 * 3), ("stabl", ctypes.c_int32 * 3),
        ("G", ctypes.c_int32 * 3),
        ("f_m", ctypes.c_double), ("f_rm", ctypes.c_double),
        ("espo", ctypes.c_double), ("f_a", ctypes.c_double),
        ("f_ra", ctypes.c_double), ("f_200", ctypes.c_double),
        ("sigmaD0", ctypes.c_double), ("sigma_grid", ctypes.c_double),
        ("min_halo_mass", ctypes.c_int32), ("lpt_order", ctypes.c_int32),
        ("tab_n", ctypes.c_int32),
        ("tab_lo", ctypes.c_double), ("tab_dlog", ctypes.c_double),
        ("tab_w1", _f64p), ("tab_w2", _f64p),
        ("tab_w31", _f64p), ("tab_w32", _f64p),
        ("tab_dv1", _f64p), ("tab_dv2", _f64p),
        ("tab_dv31", _f64p), ("tab_dv32", _f64p),
        ("tab_D1", _f64p),
        ("nout", ctypes.c_int32), ("outF", _f64p),
        ("maxg", ctypes.c_int32),
        # scale-dependent growth block
        ("sd_nk", ctypes.c_int32),
        ("sd_logk_lo", ctypes.c_double), ("sd_dlogk", ctypes.c_double),
        ("sd_w1", _f64p), ("sd_w2", _f64p),
        ("sd_w31", _f64p), ("sd_w32", _f64p),
        ("sd_dv1", _f64p), ("sd_dv2", _f64p),
        ("sd_dv31", _f64p), ("sd_dv32", _f64p),
        ("sd_rad_gm0", ctypes.c_double),
        ("sd_nsmooth", ctypes.c_int32), ("sd_logk_displ", _f64p),
        ("sd_logk_part", ctypes.c_double), ("sd_ipd", ctypes.c_double),
        # RECOMPUTE_DISPLACEMENTS segment block
        ("nseg", ctypes.c_int32), ("segF", _f64p),
        ("seg_v1", ctypes.POINTER(_f32p)), ("seg_v2", ctypes.POINTER(_f32p)),
        ("seg_v31", ctypes.POINTER(_f32p)),
        ("seg_v32", ctypes.POINTER(_f32p)),
        ("seg_w1", _f64p), ("seg_w2", _f64p),
        ("seg_w31", _f64p), ("seg_w32", _f64p),
        # streaming watermark: rows [0, *rows_ready) of every v/seg table
        # are delivered; NULL = all tables complete before the sweep
        ("rows_ready", _i64p),
    ]


class _CaptureBuffers(ctypes.Structure):
    _fields_ = [("name", _u64p), ("mass", _i32p),
                ("q", _f32p), ("x", _f32p), ("v", _f32p),
                ("count", _i32p)]


class _PlcInput(ctypes.Structure):
    _fields_ = [
        ("enabled", ctypes.c_int32),
        ("Fstart", ctypes.c_double), ("Fstop", ctypes.c_double),
        ("center", ctypes.c_double * 3), ("zvers", ctypes.c_double * 3),
        ("ipd", ctypes.c_double), ("aperture", ctypes.c_double),
        ("brent_err", ctypes.c_double),
        ("nrepl", ctypes.c_int32),
        ("repl_ijk", _i32p), ("repl_F1", _f64p), ("repl_F2", _f64p),
        ("tab_rF", _f64p),
        ("nzbins", ctypes.c_int32),
        ("delta_z", ctypes.c_double), ("z_last", ctypes.c_double),
        ("cap", ctypes.c_int64),
    ]


class _PlcOutput(ctypes.Structure):
    _fields_ = [("name", _u64p), ("zred", _f32p), ("mass", _i32p),
                ("x", _f32p), ("v", _f32p), ("nz", _f64p),
                ("count", ctypes.POINTER(ctypes.c_int64)),
                ("overflow", _i32p)]


class _SweepOutput(ctypes.Structure):
    _fields_ = [("mass", _i32p), ("name", _u64p),
                ("halo_app", _i32p), ("ll", _i32p),
                ("merged_with", _i32p), ("mass_at_merger", _i32p),
                ("t_appear", _f32p), ("t_peak", _f32p), ("t_merge", _f32p),
                ("good", _u8p), ("alive", _u8p),
                ("ngroups", _i32p), ("counters", _u64p),
                ("group_of_particle", _i32p), ("zacc", _f32p),
                ("gq", _f32p)]


def fragment_parameters(order: int, use_sim_params: bool = False):
    """Calibrated fragmentation parameters per LPT order
    (set_fragment_parameters, fragment.c:48-116)."""
    f_200 = 0.171
    table = {
        # order: (f_m=f_a, f_rm, espo, f_ra, sigmaD0)
        1: ((0.495, -0.075, 0.852, 0.500, 1.7) if use_sim_params else
            (0.505, 0.000, 0.820, 0.300, 1.7)),
        2: ((0.475, -0.020, 0.780, 0.650, 1.5) if use_sim_params else
            (0.501, 0.052, 0.745, 0.334, 1.5)),
        3: ((0.455, 0.000, 0.755, 0.700, 1.2) if use_sim_params else
            (0.5024, 0.1475, 0.6852, 0.4584, 1.2)),
    }
    f_m, f_rm, espo, f_ra, sigmaD0 = table[min(order, 3)]
    return dict(f_m=f_m, f_a=f_m, f_rm=f_rm, espo=espo, f_ra=f_ra,
                f_200=f_200, sigmaD0=sigmaD0)


def growth_tables(params: Params, cosmo: Cosmology, n: int = 8192,
                  Fhi: float = 1500.0, k_dens: float = None):
    """Uniform-log10(F) tables of the displacement weights, velocity growth
    factors and D(z) used inside the sweep (set_weight / set_obj_vel,
    build_groups.c:1411-1460)."""
    Flast = params.Flast
    lo = math.log10(Flast) - 1e-4
    hi = math.log10(Fhi)
    logF = np.linspace(lo, hi, n)
    z = 10.0 ** logF - 1.0
    zl = params.zlast
    k = params.k_for_GM

    D1 = cosmo.GrowingMode(z, k_dens if k_dens is not None else k)
    w1 = cosmo.GrowingMode(z, k) / cosmo.GrowingMode(zl, k)
    w2 = cosmo.GrowingMode_2LPT(z, k) / cosmo.GrowingMode_2LPT(zl, k)
    w31 = cosmo.GrowingMode_3LPT_1(z, k) / cosmo.GrowingMode_3LPT_1(zl, k)
    w32 = cosmo.GrowingMode_3LPT_2(z, k) / cosmo.GrowingMode_3LPT_2(zl, k)
    fac = cosmo.Hubble(z) / (1.0 + z) * params.InterPartDist
    dv1 = fac * cosmo.fomega(z, k)
    dv2 = fac * cosmo.fomega_2LPT(z, k)
    dv31 = fac * cosmo.fomega_3LPT_1(z, k)
    dv32 = fac * cosmo.fomega_3LPT_2(z, k)
    # comoving distance in grid units, for the PLC crossing condition
    rF = cosmo.ComovingDistance(z) / params.InterPartDist
    dlog = logF[1] - logF[0]
    arrs = dict(w1=w1, w2=w2, w31=w31, w32=w32,
                dv1=dv1, dv2=dv2, dv31=dv31, dv32=dv32, D1=D1, rF=rF)
    return lo, dlog, {k_: np.ascontiguousarray(v, np.float64)
                      for k_, v in arrs.items()}


def growth_tables_2d(params: Params, cosmo: Cosmology, n: int = 8192,
                     Fhi: float = 1500.0):
    """Scale-dependent variant: [NK_BINS, n] tables of the weights and
    velocity factors over the (log10 k, log10 F) grid; the C sweep
    interpolates bilinearly, reproducing set_weight + InterpolateGrowth
    (build_groups.c:1411-1444, cosmo.c:1728-1755)."""
    from ..cosmology import DELTALOGK, LOGKMIN, NK_BINS
    Flast = params.Flast
    lo = math.log10(Flast) - 1e-4
    logF = np.linspace(lo, math.log10(Fhi), n)
    z = 10.0 ** logF - 1.0
    zl = params.zlast
    ks = 10.0 ** (LOGKMIN + DELTALOGK * np.arange(NK_BINS))
    out = {nm: np.zeros((NK_BINS, n)) for nm in
           ("w1", "w2", "w31", "w32", "dv1", "dv2", "dv31", "dv32")}
    for j, k in enumerate(ks):
        fac = cosmo.Hubble(z) / (1.0 + z) * params.InterPartDist
        out["w1"][j] = cosmo.GrowingMode(z, k) / cosmo.GrowingMode(zl, k)
        out["w2"][j] = (cosmo.GrowingMode_2LPT(z, k)
                        / cosmo.GrowingMode_2LPT(zl, k))
        out["w31"][j] = (cosmo.GrowingMode_3LPT_1(z, k)
                         / cosmo.GrowingMode_3LPT_1(zl, k))
        out["w32"][j] = (cosmo.GrowingMode_3LPT_2(z, k)
                         / cosmo.GrowingMode_3LPT_2(zl, k))
        out["dv1"][j] = fac * cosmo.fomega(z, k)
        out["dv2"][j] = fac * cosmo.fomega_2LPT(z, k)
        out["dv31"][j] = fac * cosmo.fomega_3LPT_1(z, k)
        out["dv32"][j] = fac * cosmo.fomega_3LPT_2(z, k)
    return {k_: np.ascontiguousarray(v, np.float64)
            for k_, v in out.items()}


def _segment_weight_tables(params: Params, cosmo: Cosmology, scaledep_gm,
                           n: int = 8192, Fhi: float = 1500.0):
    """Per-segment displacement interpolation weights over log10 F (and the
    NkBINS log10 k grid when scale-dependent): set_weight's two branches
    (build_groups.c:1414-1442)."""
    from ..cosmology import DELTALOGK, LOGKMIN, NK_BINS
    lo = math.log10(params.Flast) - 1e-4
    logF = np.linspace(lo, math.log10(Fhi), n)
    z = 10.0 ** logF - 1.0
    zs = params.output_z
    nseg = len(zs)
    if scaledep_gm is not None:
        ks = 10.0 ** (LOGKMIN + DELTALOGK * np.arange(NK_BINS))
        shape = (nseg, NK_BINS, n)
    else:
        ks = [params.k_for_GM]
        shape = (nseg, 1, n)
    out = {nm: np.zeros(shape) for nm in ("w1", "w2", "w31", "w32")}
    fns = dict(w1=cosmo.GrowingMode, w2=cosmo.GrowingMode_2LPT,
               w31=cosmo.GrowingMode_3LPT_1, w32=cosmo.GrowingMode_3LPT_2)
    for j, k in enumerate(ks):
        for nm, fn in fns.items():
            D = fn(z, k)
            for s_ in range(nseg):
                if s_ == 0:
                    out[nm][s_, j] = D / fn(zs[0], k)
                else:
                    D0 = fn(zs[s_ - 1], k)
                    out[nm][s_, j] = (D - D0) / (fn(zs[s_], k) - D0)
    if scaledep_gm is None:
        out = {k_: v[:, 0, :] for k_, v in out.items()}
    return {k_: np.ascontiguousarray(v, np.float64)
            for k_, v in out.items()}


# initial group-array capacity per stored particle on the sparse path
# (measured peak fraction is ~0.085 at 256^3; the sweep regrows on -2)
PEAKS_PER_STORED = 0.12


def _subsel_lib():
    """groupsweep.so with the sub-box loading helper signatures set."""
    lib = native.load("groupsweep")
    if not getattr(lib, "_subsel_sig", False):
        lib.subbox_select.restype = ctypes.c_int64
        lib.subbox_select.argtypes = [
            _i64p, ctypes.c_int64, ctypes.c_int32, _i32p, _i32p, _i32p,
            _i32p, _i32p]
        lib.gather_rows3.restype = None
        lib.gather_rows3.argtypes = [_f32p, _i32p, ctypes.c_int64, _f32p]
        lib.gather_f32.restype = None
        lib.gather_f32.argtypes = [_f32p, _i32p, ctypes.c_int64, _f32p]
        lib.gather_i64.restype = None
        lib.gather_i64.argtypes = [_i64p, _i32p, ctypes.c_int64, _i64p]
        lib.fill_loc.restype = None
        lib.fill_loc.argtypes = [_i32p, ctypes.c_int64, _i32p]
        lib._subsel_sig = True
    return lib


def count_peaks(F: np.ndarray, Flast: float, pbc=(1, 1, 1)) -> int:
    """Vectorized peak count (count_peaks, fragment.c:605-706): local
    maxima of Fmax among stored particles; borders excluded along
    non-periodic dims."""
    cond = F >= Flast
    for axis in range(3):
        for shift in (1, -1):
            cond &= F > np.roll(F, shift, axis=axis)
    for axis in range(3):
        if not pbc[axis]:
            sl = [slice(None)] * 3
            for edge in (0, -1):
                sl[axis] = edge
                cond[tuple(sl)] = False
    return int(cond.sum())


@dataclass
class SubboxGeometry:
    """One fragmentation sub-domain (subbox_data, pinocchio.h:352-366)."""
    L: tuple            # local grid-with-boundary dims (Lgwbl)
    pbc: tuple
    safe: tuple
    stabl: tuple        # offset of the local grid in the global grid
    G: tuple            # global grid dims


@dataclass
class CatalogSnapshot:
    z: float
    name: np.ndarray           # u64
    mass: np.ndarray           # particles, i32
    q: np.ndarray              # [n,3] Lagrangian CM, global grid units
    x: np.ndarray              # [n,3] Eulerian, global grid units
    v: np.ndarray              # [n,3] km/s


@dataclass
class GroupState:
    ngroups: int
    mass: np.ndarray
    name: np.ndarray
    halo_app: np.ndarray
    ll: np.ndarray
    merged_with: np.ndarray
    mass_at_merger: np.ndarray
    t_appear: np.ndarray
    t_peak: np.ndarray
    t_merge: np.ndarray
    good: np.ndarray
    alive: np.ndarray


@dataclass
class PlcResult:
    name: np.ndarray
    z: np.ndarray
    mass: np.ndarray
    x: np.ndarray            # [n,3] true Mpc from the cone vertex
    v: np.ndarray            # [n,3] km/s
    nz: np.ndarray
    overflow: bool


@dataclass
class FragmentResult:
    catalogs: List[CatalogSnapshot]
    groups: GroupState
    counters: np.ndarray
    npeaks: int
    nstored: int
    plc: Optional[PlcResult] = None
    # per stored particle (sorted by descending Fmax, see `pos`):
    particle_pos: np.ndarray = None      # linear cell index (LOCAL sub-box
                                         # order; GLOBAL grid order after the
                                         # multibox merge)
    particle_group: np.ndarray = None    # final group id (1 = filament)
    particle_zacc: np.ndarray = None     # accretion redshift or -1
    # global group NAME per stored particle (the reference's snapshot GRUP
    # semantics: frag[iz].group_ID = groups[group_ID[iz]].name with
    # groups[FILAMENT].name = 1, build_groups.c:968-973); filled only when
    # params.WriteTimelessSnapshot
    particle_grup: np.ndarray = None
    timings: Dict[str, float] = field(default_factory=dict)
    # advice: the PredPeakFactor that would have been enough
    # (fragment.c:362,477: max peaks per task * 6 / particles per task)
    best_pred_peak_factor: float = 0.0
    # final Lagrangian CM per group [ngroups+1, 3] in LOCAL sub-box
    # coords (consumed by the two-turn boundary-sphere update_map)
    groups_q: np.ndarray = None


def run_fragmentation(params: Params, cosmo: Cosmology,
                      fmax_result: FmaxResult, plc_geom=None,
                      scaledep_gm=None, geom: SubboxGeometry = None,
                      cell_mask: np.ndarray = None, quick: bool = False,
                      verbose: bool = True,
                      _maxg_override: int = None) -> FragmentResult:
    """cell_mask: optional uint8/bool array over the local padded grid
    (ravelled, z fastest) restricting the stored particle set — the host
    analog of the reference's needed-particle bitmaps (frag_map,
    distribute.c:670-698).  quick: stripped first-turn sweep
    (quick_build_groups, build_groups.c:1882-2243): no catalogs, no PLC,
    no segment recomputation — just the group state + CMs for update_map."""
    t_all = time.perf_counter()
    timings = {}
    N = fmax_result.grid.N
    Flast = params.Flast
    if geom is None:
        geom = SubboxGeometry(L=(N, N, N), pbc=(1, 1, 1), safe=(0, 0, 0),
                              stabl=(0, 0, 0), G=(N, N, N))
    if quick:
        plc_geom = None

    # ---- gather products to host, select and sort (fragment.c:484-520) ----
    t0 = time.perf_counter()
    from ..fmax import fetch_products_host
    fmax_result = fetch_products_host(params, fmax_result, verbose=verbose)
    sp = fmax_result.host_products
    full_box = tuple(geom.L) == (N, N, N) and tuple(geom.stabl) == (0, 0, 0)
    ncells = int(np.prod(geom.L))
    stream = None                  # set on the streaming sparse path

    if sp is not None:
        # sparse host products (needed particles only): membership test by
        # cell coordinates instead of a dense sub-domain extraction
        lib = _subsel_lib()
        if full_box:
            rows = np.arange(len(sp.ci), dtype=np.int32)
            lin = sp.ci
        else:
            # one streaming C pass for the wrapped-membership test +
            # local linear index (the numpy int64 vector chain was
            # allocation-bound: ~10 temporaries of 0.8 GB each at 512^3)
            nsp = len(sp.ci)
            rows = np.empty(nsp, np.int32)
            lin32 = np.empty(nsp, np.int32)
            arr3 = lambda v: np.ascontiguousarray(v, np.int32)  # noqa
            m = lib.subbox_select(
                sp.ci.ctypes.data_as(_i64p), ctypes.c_int64(nsp),
                np.int32(N),
                arr3(geom.L).ctypes.data_as(_i32p),
                arr3(geom.stabl).ctypes.data_as(_i32p),
                arr3(geom.G).ctypes.data_as(_i32p),
                rows.ctypes.data_as(_i32p), lin32.ctypes.data_as(_i32p))
            rows = rows[:m]
            lin = lin32[:m]
        if cell_mask is not None:
            keep = cell_mask[lin] != 0
            rows = rows[keep]
            lin = lin[keep]
        if sp.sorted_by == "F":
            # rows were filtered order-preserving from a device-side
            # (-F, cell)-sorted transfer: already in sweep order
            sel = lin
        else:
            Fsel = sp.F[rows]
            order = np.argsort(-Fsel, kind="stable")
            rows = rows[order]
            sel = lin[order]
        n = len(sel)
        rows = np.ascontiguousarray(rows, np.int32)
        Fs = np.empty(n, np.float32)
        lib.gather_f32(np.ascontiguousarray(sp.F, np.float32)
                       .ctypes.data_as(_f32p),
                       rows.ctypes.data_as(_i32p), ctypes.c_int64(n),
                       Fs.ctypes.data_as(_f32p))
        pos = np.ascontiguousarray(sel, np.int32)
        gsel = np.empty(n, np.int64)
        lib.gather_i64(sp.ci.ctypes.data_as(_i64p),
                       rows.ctypes.data_as(_i32p), ctypes.c_int64(n),
                       gsel.ctypes.data_as(_i64p))
        F_grid = None                # peak capacity sized from n instead
        # the rowmap convention must cover EVERY per-particle table the
        # sweep reads: with DENSE vel_segments (seg_sparse False) the
        # segment tables are per-box [n,3] arrays, so fall back to
        # per-box copies of the displacement tables too
        use_rowmap = (fmax_result.vel_segments is None or quick
                      or fmax_result.seg_sparse)
        # streaming tables (fmax.StreamingVel): hand the sweep the
        # possibly-still-filling buffers plus the rows_ready watermark —
        # the sweep starts on the delivered prefix instead of blocking
        # for the full device->host transfer
        stream = (sp.vel.stream if use_rowmap
                  and hasattr(sp.vel, "stream") else None)
        if use_rowmap:
            # no per-box displacement copies: the sweep reads the shared
            # sparse tables through rowmap (one ~GB gather per table per
            # sub-box saved; the tables are read-only across box threads)
            rowmap = rows

            def gather_vel(key):
                if key not in sp.vel:
                    return None
                if stream is not None:
                    return sp.vel.buffer(key)
                return np.ascontiguousarray(sp.vel[key], np.float32)
        else:
            rowmap = None

            def gather_vel(key):
                if key not in sp.vel:
                    return None
                src = np.ascontiguousarray(sp.vel[key], np.float32)
                out = np.empty((n, 3), np.float32)
                lib.gather_rows3(src.ctypes.data_as(_f32p),
                                 rows.ctypes.data_as(_i32p),
                                 ctypes.c_int64(n),
                                 out.ctypes.data_as(_f32p))
                return out
    else:
        F_full = np.asarray(fmax_result.products.Fmax)
        if full_box:
            cell_sel = None          # identity extraction
            F_grid = F_full
        else:
            # extract the sub-domain (with PBC-wrapped boundary layer)
            # from the full grid: 'distribute' collapsed to a gather
            idx = [(np.arange(geom.stabl[d], geom.stabl[d] + geom.L[d])
                    % geom.G[d]) for d in range(3)]
            cell_sel = np.ravel_multi_index(
                np.meshgrid(*idx, indexing="ij"), (N, N, N)).ravel()
            F_grid = F_full.ravel()[cell_sel].reshape(geom.L)
        if cell_mask is not None:
            F_grid = np.where(
                cell_mask.reshape(geom.L) != 0, F_grid,
                np.float32(-10.0)).astype(np.float32)
        sel = np.flatnonzero(F_grid.ravel() >= Flast).astype(np.int64)
        Fsel = F_grid.ravel()[sel]
        order = np.argsort(-Fsel, kind="stable")
        sel = sel[order]
        n = len(sel)
        Fs = np.ascontiguousarray(Fsel[order], np.float32)
        pos = np.ascontiguousarray(sel, np.int32)
        gsel = sel if cell_sel is None else cell_sel[sel]

        rowmap = None

        def gather_vel(key):
            if key not in fmax_result.products.vel:
                return None
            v = np.asarray(fmax_result.products.vel[key]).reshape(3, -1)
            out = np.empty((len(gsel), 3), np.float32)
            for c in range(3):   # one pass per component, no transpose
                out[:, c] = v[c].take(gsel)
            return out

    v1 = gather_vel("v1")
    v2 = gather_vel("v2")
    v31 = gather_vel("v31")
    v32 = gather_vel("v32")

    # RECOMPUTE_DISPLACEMENTS: gather every segment's displacement set
    if getattr(fmax_result, "vel_segments_dev", None) \
            and fmax_result.vel_segments is None:
        raise ValueError(
            "deferred device segments present but not routed: fragment "
            "through the host-sliced exchange path or rerun the fmax "
            "stage with defer_segments=False")
    seg_vel = None
    if fmax_result.vel_segments is not None and not quick:
        if fmax_result.seg_sparse:
            # segment arrays are needed-particle rows aligned with the
            # sparse products: the sweep reads them through rowmap too
            # (streaming tables stay non-blocking — same watermark)
            def gather_seg(vs, key):
                if key not in vs or (not hasattr(vs, "buffer")
                                     and vs[key] is None):
                    return None
                if hasattr(vs, "buffer"):
                    return vs.buffer(key)
                return np.ascontiguousarray(vs[key], np.float32)
        else:
            def gather_seg(vs, key):
                if key not in vs:
                    return None
                return np.ascontiguousarray(
                    np.asarray(vs[key]).reshape(3, -1)[:, gsel].T,
                    np.float32)
        seg_vel = [{k: gather_seg(vs, k)
                    for k in ("v1", "v2", "v31", "v32")}
                   for vs in fmax_result.vel_segments]

    loc = np.full(ncells, -1, np.int32)
    if sp is not None:
        _subsel_lib().fill_loc(pos.ctypes.data_as(_i32p),
                               ctypes.c_int64(n),
                               loc.ctypes.data_as(_i32p))
    else:
        loc[sel] = np.arange(n, dtype=np.int32)
    timings["sort"] = time.perf_counter() - t0

    # ---- guard rails (fragment.c:258-283, build_groups.c:350-357) ----
    # Nalloc analog: the particle count the MaxMemPerParticle budget can
    # hold; overflow prints the reference's advice and aborts only under
    # ExitIfExtraParticles (first-turn overflow always aborts there; this
    # single-turn driver maps to the warn-or-abort turn-1 case)
    nfields = {1: 1, 2: 2, 3: 4}[params.lpt_order]
    nseg = (len(fmax_result.vel_segments)
            if fmax_result.vel_segments is not None else 1)
    bytes_per_stored = (8 + 4 + 3 * nfields * 4) \
        + (4 + 4 + 3 * nfields * 4 * nseg + 4 + 4)
    nalloc = int(ncells * max(0.0, params.MaxMemPerParticle - 8)
                 / bytes_per_stored)
    if n > nalloc:
        need = int((n - nalloc) * bytes_per_stored / ncells) + 1 \
            + int(params.MaxMemPerParticle)
        print(f"CRITICAL WARNING: budget allows {nalloc} stored particles "
              f"but {n} are needed (overhead {n / ncells:.3f}).\n"
              f"Please increase MaxMemPerParticle to at least {need}"
              + (" — aborting (ExitIfExtraParticles)"
                 if params.ExitIfExtraParticles else ""))
        if params.ExitIfExtraParticles:
            raise MemoryError(
                f"stored particles {n} exceed the MaxMemPerParticle "
                f"budget ({nalloc}); set MaxMemPerParticle >= {need}")

    # ---- peaks and capacity ----
    t0 = time.perf_counter()
    if F_grid is not None:
        npeaks = count_peaks(F_grid, Flast, geom.pbc)
        maxg = npeaks + 3
    else:
        # sparse path: skip the dense pre-count (it would rebuild the
        # full padded F grid just to roll it 6 times); size the group
        # arrays from the stored count with margin and regrow on sweep
        # overflow — the reference's own contract (PredNpeaks,
        # build_groups.c:350-357), with a retry instead of an abort
        npeaks = -1
        maxg = _maxg_override or int(PEAKS_PER_STORED * n) + 8192
    timings["peaks"] = time.perf_counter() - t0
    if verbose:
        print(f"  fragmentation: {n} stored particles, "
              f"overhead {n / ncells:.3f}")

    # ---- tables and parameters ----
    fpar = fragment_parameters(min(2, params.lpt_order),
                               params.use_sim_params)
    k_dens_S = (scaledep_gm.k_GM_dens[-1] if scaledep_gm is not None
                else None)
    tab_lo, tab_dlog, tabs = growth_tables(params, cosmo, k_dens=k_dens_S)
    sd_tabs = (growth_tables_2d(params, cosmo)
               if scaledep_gm is not None else None)
    sigma_grid = math.sqrt(float(fmax_result.smoothing.true_variance[-1]))
    # quick turn captures no catalogs (nout=0 -> the capture trigger
    # never fires, like quick_build_groups skipping write_catalog)
    outF = np.ascontiguousarray(
        [] if quick else params.output_F, np.float64)
    nout = len(outF)

    # ---- capture + output buffers ----
    cap_name = np.zeros(nout * maxg, np.uint64)
    cap_mass = np.zeros(nout * maxg, np.int32)
    cap_q = np.zeros(nout * maxg * 3, np.float32)
    cap_x = np.zeros(nout * maxg * 3, np.float32)
    cap_v = np.zeros(nout * maxg * 3, np.float32)
    cap_count = np.zeros(nout, np.int32)

    g_mass = np.zeros(maxg, np.int32)
    g_name = np.zeros(maxg, np.uint64)
    g_halo_app = np.zeros(maxg, np.int32)
    g_ll = np.zeros(maxg, np.int32)
    g_mw = np.zeros(maxg, np.int32)
    g_mam = np.zeros(maxg, np.int32)
    g_tap = np.zeros(maxg, np.float32)
    g_tpk = np.zeros(maxg, np.float32)
    g_tmg = np.zeros(maxg, np.float32)
    g_good = np.zeros(maxg, np.uint8)
    g_alive = np.zeros(maxg, np.uint8)
    g_q = np.zeros(maxg * 3, np.float32)
    g_ngroups = np.zeros(1, np.int32)
    counters = np.zeros(NCOUNTERS, np.uint64)
    gop = np.zeros(n, np.int32)
    zacc = np.zeros(n, np.float32)

    def p(arr, typ):
        return arr.ctypes.data_as(typ) if arr is not None else typ()

    si = _SweepInput(
        n=n,
        Fmax=p(Fs, _f32p), pos=p(pos, _i32p),
        v1=p(v1, _f32p), v2=p(v2, _f32p),
        v31=p(v31, _f32p), v32=p(v32, _f32p),
        loc=p(loc, _i32p), rowmap=p(rowmap, _i32p),
        L=(ctypes.c_int32 * 3)(*geom.L),
        pbc=(ctypes.c_int32 * 3)(*geom.pbc),
        safe=(ctypes.c_int32 * 3)(*geom.safe),
        stabl=(ctypes.c_int32 * 3)(*geom.stabl),
        G=(ctypes.c_int32 * 3)(*geom.G),
        f_m=fpar["f_m"], f_rm=fpar["f_rm"], espo=fpar["espo"],
        f_a=fpar["f_a"], f_ra=fpar["f_ra"], f_200=fpar["f_200"],
        sigmaD0=fpar["sigmaD0"], sigma_grid=sigma_grid,
        min_halo_mass=params.MinHaloMass, lpt_order=params.lpt_order,
        tab_n=len(tabs["w1"]), tab_lo=tab_lo, tab_dlog=tab_dlog,
        tab_w1=p(tabs["w1"], _f64p), tab_w2=p(tabs["w2"], _f64p),
        tab_w31=p(tabs["w31"], _f64p), tab_w32=p(tabs["w32"], _f64p),
        tab_dv1=p(tabs["dv1"], _f64p), tab_dv2=p(tabs["dv2"], _f64p),
        tab_dv31=p(tabs["dv31"], _f64p), tab_dv32=p(tabs["dv32"], _f64p),
        tab_D1=p(tabs["D1"], _f64p),
        nout=nout, outF=p(outF, _f64p), maxg=maxg,
        rows_ready=(stream.ready.ctypes.data_as(_i64p)
                    if stream is not None else _i64p()))

    if scaledep_gm is not None:
        from ..cosmology import DELTALOGK, LOGKMIN, NK_BINS
        logk_displ = np.ascontiguousarray(
            np.log10(scaledep_gm.k_GM_displ), np.float64)
        si.sd_nk = NK_BINS
        si.sd_logk_lo = LOGKMIN
        si.sd_dlogk = DELTALOGK
        si.sd_w1 = p(sd_tabs["w1"], _f64p)
        si.sd_w2 = p(sd_tabs["w2"], _f64p)
        si.sd_w31 = p(sd_tabs["w31"], _f64p)
        si.sd_w32 = p(sd_tabs["w32"], _f64p)
        si.sd_dv1 = p(sd_tabs["dv1"], _f64p)
        si.sd_dv2 = p(sd_tabs["dv2"], _f64p)
        si.sd_dv31 = p(sd_tabs["dv31"], _f64p)
        si.sd_dv32 = p(sd_tabs["dv32"], _f64p)
        si.sd_rad_gm0 = float(scaledep_gm.Rad_GM[0])
        si.sd_nsmooth = len(logk_displ)
        si.sd_logk_displ = p(logk_displ, _f64p)
        si.sd_logk_part = float(logk_displ[-1])
        si.sd_ipd = params.InterPartDist

    # segment plumbing (RECOMPUTE_DISPLACEMENTS)
    _seg_keepalive = []
    if seg_vel is not None:
        nseg = len(seg_vel)
        segF = np.ascontiguousarray(params.output_F, np.float64)
        assert nseg == len(segF)

        def ptr_array(key):
            arr_t = (_f32p * nseg)()
            for i, vs in enumerate(seg_vel):
                a = vs[key]
                arr_t[i] = p(a, _f32p)
                _seg_keepalive.append(a)
            return arr_t

        pv1, pv2 = ptr_array("v1"), ptr_array("v2")
        pv31, pv32 = ptr_array("v31"), ptr_array("v32")
        _seg_keepalive += [segF, pv1, pv2, pv31, pv32]
        # per-segment weight tables: segment 0 = D(z)/D(z0); segment s =
        # (D(z)-D(z_{s-1}))/(D(z_s)-D(z_{s-1})) (set_weight,
        # build_groups.c:1414-1442)
        segw = _segment_weight_tables(params, cosmo, scaledep_gm,
                                      n=len(tabs["w1"]))
        _seg_keepalive.append(segw)
        si.nseg = nseg
        si.segF = p(segF, _f64p)
        si.seg_v1, si.seg_v2 = pv1, pv2
        si.seg_v31, si.seg_v32 = pv31, pv32
        si.seg_w1 = p(segw["w1"], _f64p)
        si.seg_w2 = p(segw["w2"], _f64p)
        si.seg_w31 = p(segw["w31"], _f64p)
        si.seg_w32 = p(segw["w32"], _f64p)

    cb = _CaptureBuffers(name=p(cap_name, _u64p), mass=p(cap_mass, _i32p),
                         q=p(cap_q, _f32p), x=p(cap_x, _f32p),
                         v=p(cap_v, _f32p), count=p(cap_count, _i32p))

    so = _SweepOutput(mass=p(g_mass, _i32p), name=p(g_name, _u64p),
                      halo_app=p(g_halo_app, _i32p), ll=p(g_ll, _i32p),
                      merged_with=p(g_mw, _i32p),
                      mass_at_merger=p(g_mam, _i32p),
                      t_appear=p(g_tap, _f32p), t_peak=p(g_tpk, _f32p),
                      t_merge=p(g_tmg, _f32p),
                      good=p(g_good, _u8p), alive=p(g_alive, _u8p),
                      ngroups=p(g_ngroups, _i32p),
                      counters=p(counters, _u64p),
                      group_of_particle=p(gop, _i32p),
                      zacc=p(zacc, _f32p),
                      gq=p(g_q, _f32p))

    # ---- past light cone buffers ----
    plc_on = plc_geom is not None and plc_geom.enabled
    if plc_on:
        plc_cap = 4 * plc_geom.Nmax
        plc_name = np.zeros(plc_cap, np.uint64)
        plc_z = np.zeros(plc_cap, np.float32)
        plc_mass = np.zeros(plc_cap, np.int32)
        plc_x = np.zeros(plc_cap * 3, np.float32)
        plc_v = np.zeros(plc_cap * 3, np.float32)
        plc_nz = np.zeros(max(plc_geom.nzbins, 1), np.float64)
        plc_count = np.zeros(1, np.int64)
        plc_over = np.zeros(1, np.int32)
        repl_ijk = np.ascontiguousarray(plc_geom.repls_ijk.ravel(),
                                        np.int32)
        repl_F1 = np.ascontiguousarray(plc_geom.repls_F1, np.float64)
        repl_F2 = np.ascontiguousarray(plc_geom.repls_F2, np.float64)
        pi = _PlcInput(
            enabled=1, Fstart=plc_geom.Fstart, Fstop=plc_geom.Fstop,
            center=(ctypes.c_double * 3)(*plc_geom.center),
            zvers=(ctypes.c_double * 3)(*plc_geom.zvers),
            ipd=params.InterPartDist, aperture=params.PLCAperture,
            brent_err=1e-2 * params.InterPartDist,
            nrepl=len(repl_F1),
            repl_ijk=p(repl_ijk, _i32p), repl_F1=p(repl_F1, _f64p),
            repl_F2=p(repl_F2, _f64p), tab_rF=p(tabs["rF"], _f64p),
            nzbins=plc_geom.nzbins, delta_z=plc_geom.delta_z,
            z_last=min(params.StartingzForPLC, params.LastzForPLC),
            cap=plc_cap)
        po = _PlcOutput(name=p(plc_name, _u64p), zred=p(plc_z, _f32p),
                        mass=p(plc_mass, _i32p), x=p(plc_x, _f32p),
                        v=p(plc_v, _f32p), nz=p(plc_nz, _f64p),
                        count=plc_count.ctypes.data_as(
                            ctypes.POINTER(ctypes.c_int64)),
                        overflow=p(plc_over, _i32p))
        pi_ref, po_ref = ctypes.byref(pi), ctypes.byref(po)
    else:
        pi_ref = po_ref = None

    lib = native.load("groupsweep")
    lib.sweep.restype = ctypes.c_int
    lib.sweep.argtypes = [ctypes.POINTER(_SweepInput),
                          ctypes.POINTER(_CaptureBuffers),
                          ctypes.POINTER(_SweepOutput),
                          ctypes.POINTER(_PlcInput),
                          ctypes.POINTER(_PlcOutput)]

    if stream is not None and sp.sorted_by != "F":
        # ooc streams land in STORAGE order while the sweep processes in
        # descending-F order: the C watermark spin would burn both host
        # cores re-checking random rows for the whole stream phase
        # (measured 3x LPT stretch at 256^3).  The sweep cannot make
        # useful progress on a partial storage-order prefix anyway, so
        # park on the stream events (zero CPU) until every table this
        # sweep reads has fully landed — the selection+sort above
        # already ran DURING the streams, which is the overlap win.
        t0 = time.perf_counter()
        for key in sp.vel:
            sp.vel[key]                  # blocks on the table's event
        if seg_vel is not None and fmax_result.seg_sparse:
            for vs in fmax_result.vel_segments:
                for key in vs:
                    vs[key]
        timings["stream_wait"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    rc = lib.sweep(ctypes.byref(si), ctypes.byref(cb), ctypes.byref(so),
                   pi_ref, po_ref)
    timings["sweep"] = time.perf_counter() - t0
    if stream is not None:
        stream.check()     # a failed transfer unblocks the sweep: raise
    if rc == -2 and F_grid is None and n > 0:
        # sparse-path capacity estimate was too small: regrow and redo
        # (the reference aborts at PredNpeaks instead, build_groups.c:357)
        if verbose:
            print(f"  group capacity {maxg} overflowed, retrying x2")
        return run_fragmentation(params, cosmo, fmax_result,
                                 plc_geom=plc_geom,
                                 scaledep_gm=scaledep_gm, geom=geom,
                                 cell_mask=cell_mask, quick=quick,
                                 verbose=verbose,
                                 _maxg_override=2 * maxg + 8192)
    if rc != 0:
        raise RuntimeError(f"group sweep failed with code {rc} "
                           f"(-2 = peak-capacity overflow)")

    catalogs = []
    stabl_f = np.asarray(geom.stabl, np.float32)
    Gf = np.asarray(geom.G, np.float32)
    for iout, z in enumerate([] if quick else params.output_z):
        c = int(cap_count[iout])
        base = iout * maxg
        q = cap_q[3 * base:3 * (base + c)].reshape(-1, 3) + stabl_f
        x = cap_x[3 * base:3 * (base + c)].reshape(-1, 3) + stabl_f
        catalogs.append(CatalogSnapshot(
            z=z,
            name=cap_name[base:base + c].copy(),
            mass=cap_mass[base:base + c].copy(),
            q=np.mod(q, Gf), x=np.mod(x, Gf),
            v=cap_v[3 * base:3 * (base + c)].reshape(-1, 3).copy()))

    ng = int(g_ngroups[0])
    if npeaks < 0:
        # group ids only ever grow, so the final count IS the peak count
        npeaks = max(ng - 1, 0)
        pred_npeaks = int(ncells / 6.0 * params.PredPeakFactor)
        if npeaks + 2 > pred_npeaks and verbose:
            print(f"WARNING: {npeaks} peaks exceed the PredPeakFactor "
                  f"prediction ({pred_npeaks}); the reference would "
                  f"abort — set PredPeakFactor >= "
                  f"{npeaks * 6.0 / ncells:4.2f}")
    groups = GroupState(
        ngroups=ng, mass=g_mass[:ng + 1], name=g_name[:ng + 1],
        halo_app=g_halo_app[:ng + 1], ll=g_ll[:ng + 1],
        merged_with=g_mw[:ng + 1], mass_at_merger=g_mam[:ng + 1],
        t_appear=g_tap[:ng + 1], t_peak=g_tpk[:ng + 1],
        t_merge=g_tmg[:ng + 1], good=g_good[:ng + 1], alive=g_alive[:ng + 1])

    plc_result = None
    if plc_on:
        nplc = int(plc_count[0])
        plc_result = PlcResult(
            name=plc_name[:nplc].copy(), z=plc_z[:nplc].copy(),
            mass=plc_mass[:nplc].copy(),
            x=plc_x[:3 * nplc].reshape(-1, 3).copy(),
            v=plc_v[:3 * nplc].reshape(-1, 3).copy(),
            nz=plc_nz.copy(), overflow=bool(plc_over[0]))
        if verbose:
            print(f"  PLC: stored {nplc} halo crossings"
                  + (" (OVERFLOW)" if plc_result.overflow else ""))

    # SNAPSHOT GRUP semantics: map the local group index to the group's
    # global NAME (peak particle ID), with groups[0].name = 0 and
    # groups[FILAMENT].name = FILAMENT (build_groups.c:968-973)
    particle_grup = None
    if params.WriteTimelessSnapshot and not quick:
        names = g_name[:ng + 1].copy()
        names[0] = 0
        if ng >= FILAMENT:
            names[FILAMENT] = FILAMENT
        particle_grup = names[gop]

    timings["total"] = time.perf_counter() - t_all
    if verbose:
        print(f"  sweep: {timings['sweep']:.2f}s; peaks {counters[0]}, "
              f"good halos {counters[14]}, accretions {counters[7]}, "
              f"mergers {counters[10]}, filament particles {counters[12]}")
    return FragmentResult(catalogs=catalogs, groups=groups,
                          counters=counters, npeaks=npeaks, nstored=n,
                          plc=plc_result, particle_pos=pos,
                          particle_group=gop, particle_zacc=zacc,
                          particle_grup=particle_grup,
                          timings=timings,
                          best_pred_peak_factor=npeaks * 6.0 / ncells,
                          groups_q=g_q[:3 * (ng + 1)].reshape(-1, 3))
