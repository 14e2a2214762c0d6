"""TABULATED_CT: collapse times from a precomputed 3-D table.

Re-implements the reference's tabulated collapse mode
(collapse_times.c:780-1232): per smoothing radius, F(delta, x, y) is
tabulated on a (CT_NBINS_D x CT_NBINS_XY x CT_NBINS_XY) grid of normalized
eigenvalue combinations delta = (l1+l2+l3)/sigma, x = (l1-l2)/sigma,
y = (l2-l3)/sigma, with a non-uniform delta sampling concentrated around
CT_DELTA0; particle lookups implement all three reference variants
(TRILINEAR / BILINEAR_SPLINE / ALL_SPLINE bicubic, the ct_interp config
switch) as pure arithmetic + tiny-table gathers on the VPU — the delta
splines are precomputed as a second-derivative table on the host
(spline_d2), so no per-particle spline objects exist.

The table entries come from either the classic ellipsoid solution or the
ELL_SNG ODE (ops/sng.py), solved for all nodes at once on the host.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

CT_NBINS_XY = 50
CT_NBINS_D = 100
CT_SQUEEZE = 1.2
CT_EXPO = 1.75
CT_RANGE_D = 7.0
CT_RANGE_X = 3.5
CT_DELTA0 = -1.0
BIN_X = CT_RANGE_X / CT_NBINS_XY
AUX_N = 8192                 # uniform aux grid for the delta bin lookup


def delta_sampling() -> np.ndarray:
    """Non-uniform delta grid (initialize_collapse_times,
    collapse_times.c:845-882)."""
    if CT_EXPO == 1:
        interval = 2.0 * CT_RANGE_D / CT_NBINS_D
        return np.arange(CT_NBINS_D) * interval - CT_RANGE_D
    deltaf = (CT_SQUEEZE / CT_EXPO) ** (1.0 / (CT_EXPO - 1.0))
    if CT_EXPO == 2:
        ref = ((math.log((CT_RANGE_D - CT_DELTA0) / deltaf)
                + math.log((CT_RANGE_D + CT_DELTA0) / deltaf)) / CT_EXPO
               + 2.0 * deltaf / CT_SQUEEZE) / (CT_NBINS_D - 2.0)
    else:
        ref = (((CT_RANGE_D - CT_DELTA0) ** (2.0 - CT_EXPO)
                + (CT_RANGE_D + CT_DELTA0) ** (2.0 - CT_EXPO)
                - 2.0 * deltaf ** (2.0 - CT_EXPO))
               / CT_EXPO / (2.0 - CT_EXPO)
               + 2.0 * deltaf / CT_SQUEEZE) / (CT_NBINS_D - 2.0)
    dv = np.empty(CT_NBINS_D)
    d = -CT_RANGE_D
    for i in range(CT_NBINS_D):
        dv[i] = d
        interval = CT_EXPO * ref * abs(d - CT_DELTA0) ** (CT_EXPO - 1.0)
        if interval / ref < CT_SQUEEZE:
            interval = ref * CT_SQUEEZE
        d += interval
    return dv


def node_eigenvalues(ampl: float):
    """(l1, l2, l3) at every table node, flattened in the reference's
    index order i = id + ix*ND + iy*ND*NXY (collapse_times.c:975-985)."""
    dv = delta_sampling()
    idx = np.arange(CT_NBINS_D * CT_NBINS_XY * CT_NBINS_XY)
    id_ = idx % CT_NBINS_D
    ix = (idx // CT_NBINS_D) % CT_NBINS_XY
    iy = idx // (CT_NBINS_D * CT_NBINS_XY)
    x = ix * BIN_X
    y = iy * BIN_X
    d = dv[id_]
    l1 = (d + 2.0 * x + y) / 3.0 * ampl
    l2 = (d - x + y) / 3.0 * ampl
    l3 = (d - x - 2.0 * y) / 3.0 * ampl
    return l1, l2, l3


def build_ct_table(cosmo, ampl: float, model: str = "classic",
                   sng_D_in: float = None) -> np.ndarray:
    """F(delta,x,y) table for one smoothing radius, flat in reference
    order; model 'classic' uses the closed-form ellipsoid, 'sng' the
    triaxial ODE."""
    l1, l2, l3 = node_eigenvalues(ampl)
    if model == "sng":
        from .sng import ell_sng_F
        if sng_D_in is None:
            sng_D_in = float(cosmo.GrowingMode(1.0 / 1.e-5 - 1.0))
        return ell_sng_F(l1, l2, l3, sng_D_in, cosmo)
    from .collapse import ell_classic
    bc = np.asarray(ell_classic(jnp.asarray(l1), jnp.asarray(l2),
                                jnp.asarray(l3)))
    F = np.where(bc > 0.0,
                 1.0 + cosmo.InverseGrowingMode(np.maximum(bc, 1e-30)),
                 0.0)
    return F


def build_ct_tables_all(cosmo, smoothing, model: str = "classic"):
    """One table per smoothing radius + the device lookup helpers.

    Returns dict with:
      tables   [nsmooth, NXY, NXY, ND] float32 (indexed [iy, ix, id])
      tables2  same shape: delta-spline second derivatives (spline_d2)
      dv       [ND] delta grid
      idx_map  [AUX_N] uniform->nonuniform delta bin index
      ampl     [nsmooth] sqrt variance
    """
    dv = delta_sampling()
    tabs = []
    for ism in range(smoothing.n):
        ampl = math.sqrt(smoothing.variance[ism])
        flat = build_ct_table(cosmo, ampl, model=model)
        tabs.append(flat.reshape(CT_NBINS_XY, CT_NBINS_XY, CT_NBINS_D)
                    .astype(np.float32))
    # uniform aux grid over delta for arithmetic bin lookup
    aux = np.linspace(-CT_RANGE_D, CT_RANGE_D, AUX_N)
    idx_map = np.clip(np.searchsorted(dv, aux, side="right") - 1, 0,
                      CT_NBINS_D - 2).astype(np.int32)
    tables = np.stack(tabs)
    return dict(tables=tables,
                tables2=spline_d2(tables, dv),
                dv=dv.astype(np.float32),
                idx_map=idx_map,
                ampl=np.sqrt(smoothing.variance).astype(np.float32))


def _locate(dv, idx_map, ampl, l1, l2, l3):
    """Shared bin location: normalized (d, x, y), their cell indices and
    in-cell offsets (interpolate_collapse_time prologue,
    collapse_times.c:1139-1160; the non-uniform delta bin comes from the
    uniform aux grid instead of a bsearch — arithmetic, no search)."""
    d = (l1 + l2 + l3) / ampl
    x = (l1 - l2) / ampl
    y = (l2 - l3) / ampl
    fx = x / BIN_X
    fy = y / BIN_X
    ix = jnp.clip(fx.astype(jnp.int32), 0, CT_NBINS_XY - 2)
    iy = jnp.clip(fy.astype(jnp.int32), 0, CT_NBINS_XY - 2)
    u = (d + CT_RANGE_D) / (2.0 * CT_RANGE_D) * (AUX_N - 1)
    u = jnp.clip(u, 0.0, AUX_N - 1.0)
    id_ = idx_map[u.astype(jnp.int32)]
    return d, fx, fy, ix, iy, id_


def interpolate_F(tab, dv, idx_map, ampl, l1, l2, l3):
    """Trilinear interpolation (interpolate_collapse_time TRILINEAR,
    collapse_times.c:1139-1221) as jnp ops; tab is [NXY, NXY, ND] for one
    radius (indexed [iy, ix, id])."""
    d, fx, fy, ix, iy, id_ = _locate(dv, idx_map, ampl, l1, l2, l3)
    d0 = dv[id_]
    d1 = dv[id_ + 1]
    dd = jnp.clip((d - d0) / (d1 - d0), 0.0, 1.0)
    # reference clamps out-of-range d to the edge bins with extrapolated dd
    dd = jnp.where(d <= dv[0], (d - d0) / (d1 - d0), dd)
    dd = jnp.where(d >= dv[-1], (d - d0) / (d1 - d0), dd)
    dx = fx - ix.astype(jnp.float32)
    dy = fy - iy.astype(jnp.float32)

    def g(jy, jx, jd):
        return tab[iy + jy, ix + jx, id_ + jd]

    return ((1 - dd) * (1 - dx) * (1 - dy) * g(0, 0, 0)
            + dd * (1 - dx) * (1 - dy) * g(0, 0, 1)
            + (1 - dd) * dx * (1 - dy) * g(0, 1, 0)
            + dd * dx * (1 - dy) * g(0, 1, 1)
            + (1 - dd) * (1 - dx) * dy * g(1, 0, 0)
            + dd * (1 - dx) * dy * g(1, 0, 1)
            + (1 - dd) * dx * dy * g(1, 1, 0)
            + dd * dx * dy * g(1, 1, 1))


def spline_d2(tables, dv):
    """Natural-cubic-spline second derivatives along the delta axis for
    every control curve — the host-precomputed analog of the reference's
    CT_Spline set (initialize_collapse_times, collapse_times.c:1018-1042):
    the device then evaluates each delta spline segment arithmetically
    instead of calling a spline object.  tables [..., ND] -> same shape."""
    from scipy.interpolate import CubicSpline
    cs = CubicSpline(np.asarray(dv, np.float64),
                     np.asarray(tables, np.float64), axis=-1,
                     bc_type="natural")
    return cs(np.asarray(dv, np.float64), 2).astype(np.float32)


def _spline_seg(y0, y1, m0, m1, d, d0, d1):
    """One natural-cubic segment: values y, second derivatives m at the
    segment ends (d0, d1), evaluated at d (my_spline_eval's in-range
    branch, cosmo.c:2016-2027)."""
    h = d1 - d0
    A = (d1 - d) / h
    B = 1.0 - A
    return (A * y0 + B * y1
            + ((A * A * A - A) * m0 + (B * B * B - B) * m1)
            * (h * h) * (1.0 / 6.0))


def _nat4(y0, y1, y2, y3, t):
    """Natural cubic spline through 4 uniformly spaced points (h = 1),
    evaluated at t in [0, 3]: the closed-form solve of the 2x2 tridiagonal
    system for the interior second derivatives."""
    c1 = y0 - 2.0 * y1 + y2
    c2 = y1 - 2.0 * y2 + y3
    m1 = (6.0 / 15.0) * (4.0 * c1 - c2)
    m2 = (6.0 / 15.0) * (4.0 * c2 - c1)
    zero = jnp.zeros_like(m1)
    ms = (zero, m1, m2, zero)
    ys = (y0, y1, y2, y3)
    s = jnp.clip(t.astype(jnp.int32), 0, 2)
    out = _spline_seg(ys[0], ys[1], ms[0], ms[1], t, 0.0, 1.0)
    for k in (1, 2):
        out = jnp.where(s == k,
                        _spline_seg(ys[k], ys[k + 1], ms[k], ms[k + 1],
                                    t, float(k), float(k + 1)),
                        out)
    return out


def _d_spline_at(tab, tab2, dv, iy, ix, jy, jx, id_, d):
    """The per-control-point delta spline evaluated at d (clamped to the
    table range: collapse beyond |d| = CT_RANGE_D sigma is deep in the
    tails and the reference's spline is undefined there too)."""
    d_cl = jnp.clip(d, dv[0], dv[-1])
    return _spline_seg(tab[iy + jy, ix + jx, id_],
                       tab[iy + jy, ix + jx, id_ + 1],
                       tab2[iy + jy, ix + jx, id_],
                       tab2[iy + jy, ix + jx, id_ + 1],
                       d_cl, dv[id_], dv[id_ + 1])


def interpolate_F_bilinear(tab, tab2, dv, idx_map, ampl, l1, l2, l3):
    """BILINEAR_SPLINE variant (collapse_times.c:1222-1231): cubic spline
    along delta at the 4 surrounding (x, y) control points, bilinear
    across them.  tab2 = spline_d2(tab, dv)."""
    d, fx, fy, ix, iy, id_ = _locate(dv, idx_map, ampl, l1, l2, l3)
    dx = fx - ix.astype(jnp.float32)
    dy = fy - iy.astype(jnp.float32)
    g = [[_d_spline_at(tab, tab2, dv, iy, ix, jy, jx, id_, d)
          for jx in (0, 1)] for jy in (0, 1)]
    return ((1 - dx) * (1 - dy) * g[0][0] + dx * (1 - dy) * g[0][1]
            + (1 - dx) * dy * g[1][0] + dx * dy * g[1][1])


def interpolate_F_bicubic(tab, tab2, dv, idx_map, ampl, l1, l2, l3):
    """ALL_SPLINE variant (collapse_times.c:1152-1186): cubic spline
    along delta at the 16 control points of a 4x4 (x, y) patch, then a
    natural-bicubic tensor evaluation across the patch (the gsl_spline2d
    bicubic analog, closed-form instead of a per-particle GSL object).
    The patch start clamps at the table edges exactly like the
    reference's ixstart/iystart."""
    d, fx, fy, ix, iy, id_ = _locate(dv, idx_map, ampl, l1, l2, l3)
    nxy = CT_NBINS_XY
    ixs = jnp.where(ix == 0, 0, jnp.where(ix >= nxy - 2, nxy - 4, ix - 1))
    iys = jnp.where(iy == 0, 0, jnp.where(iy >= nxy - 2, nxy - 4, iy - 1))
    tx = fx - ixs.astype(jnp.float32)
    ty = fy - iys.astype(jnp.float32)
    rows = []
    for jy in range(4):
        vals = [_d_spline_at(tab, tab2, dv, iys, ixs, jy, jx, id_, d)
                for jx in range(4)]
        rows.append(_nat4(*vals, tx))
    return _nat4(*rows, ty)


def interp_F(interp: str, tab, tab2, dv, idx_map, ampl, l1, l2, l3):
    """Static dispatch over the reference's three interpolation variants
    (the TRILINEAR / BILINEAR_SPLINE / ALL_SPLINE compile switch,
    collapse_times.c:1139-1231, as a runtime option)."""
    if interp == "bicubic":
        return interpolate_F_bicubic(tab, tab2, dv, idx_map, ampl,
                                     l1, l2, l3)
    if interp == "bilinear":
        return interpolate_F_bilinear(tab, tab2, dv, idx_map, ampl,
                                      l1, l2, l3)
    return interpolate_F(tab, dv, idx_map, ampl, l1, l2, l3)


def write_ct_table_file(path, params, smoothing, tables):
    """Binary CT table cache (write_CTtable_header + per-radius records,
    collapse_times.c:995-1034, 1235-1345-style header)."""
    import struct
    with open(path, "wb") as fd:
        fd.write(struct.pack("<6i2d", CT_NBINS_D, CT_NBINS_XY,
                             smoothing.n, params.GridSize,
                             params.RandomSeed, 0,
                             CT_EXPO, CT_SQUEEZE))
        for ism in range(smoothing.n):
            fd.write(struct.pack("<i", ism))
            # flat order [iy, ix, id] -> i, like the reference table file
            tables[ism].astype("<f8").ravel().tofile(fd)


def read_ct_table_file(path, params, smoothing):
    import struct
    with open(path, "rb") as fd:
        hdr = struct.unpack("<6i2d", fd.read(6 * 4 + 2 * 8))
        if hdr[0] != CT_NBINS_D or hdr[1] != CT_NBINS_XY \
                or hdr[2] != smoothing.n or hdr[3] != params.GridSize:
            raise ValueError(f"CT table header mismatch: {hdr}")
        tabs = []
        for ism in range(smoothing.n):
            struct.unpack("<i", fd.read(4))
            flat = np.fromfile(fd, "<f8",
                               CT_NBINS_D * CT_NBINS_XY * CT_NBINS_XY)
            tabs.append(flat.reshape(CT_NBINS_XY, CT_NBINS_XY,
                                     CT_NBINS_D).astype(np.float32))
    return np.stack(tabs)
