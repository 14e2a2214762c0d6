"""The fmax pipeline: collapse times + LPT displacements on TPU.

Drives the outer smoothing-radius loop of the reference (compute_fmax,
fmax.c:36-190): for each radius in the variance ladder, compute the 6
second derivatives of the smoothed potential (6 c2r FFTs) and update each
particle's earliest collapse time Fmax; then at R=0 compute the Zel'dovich +
2LPT + 3LPT displacement fields.

Everything stays on device; the host loop over ~5-30 radii calls one jitted
step whose only retrace-relevant argument is the grid size.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from .config import Params
from .cosmology import Cosmology
from .grids import Grid
from .ic import generate_kdensity
from .ops import collapse, derivatives, lpt

NSIGMA = 6.0
STEP_VAR = 0.3          # spacing of the variance ladder (pinocchio.h:69)


@dataclass
class Smoothing:
    """The smoothing-radius ladder (set_smoothing, initialization.c:386-435).

    Radii in true Mpc; variances from the Gaussian-window linear variance.
    """
    radii: np.ndarray
    variance: np.ndarray
    true_variance: np.ndarray = None

    @property
    def n(self) -> int:
        return len(self.radii)

    @classmethod
    def build(cls, params: Params, cosmo: Cosmology) -> "Smoothing":
        D = float(cosmo.GrowingMode(params.zlast, params.k_for_GM))
        var_min = (1.686 / NSIGMA / D) ** 2
        rmin = params.InterPartDist / 6.0
        var_max = float(cosmo.var_gauss.MassVariance(rmin))
        nsmooth = int((math.log10(var_max) - math.log10(var_min))
                      / STEP_VAR + 2)
        if nsmooth <= 0:
            nsmooth = 1
        radii = np.zeros(nsmooth)
        variance = np.zeros(nsmooth)
        for i in range(nsmooth - 1):
            variance[i] = 10.0 ** (math.log10(var_min) + STEP_VAR * i)
            radii[i] = cosmo.var_gauss.Radius(variance[i])
        radii[-1] = 0.0
        variance[-1] = var_max
        return cls(radii=radii, variance=variance,
                   true_variance=np.zeros(nsmooth))


@dataclass
class Products:
    """Per-particle outputs of fmax (product_data, pinocchio.h:233-259),
    kept as [N, N, N]-shaped device arrays; C-order flattening reproduces
    the reference's particle index (z fastest)."""
    Fmax: jax.Array
    Rmax: jax.Array
    vel: Dict[str, jax.Array]          # 'v1','v2','v31','v32' -> [3,N,N,N]
    zacc: jax.Array = None             # SNAPSHOT-mode accretion redshift


@dataclass
class FmaxResult:
    products: Products
    smoothing: Smoothing
    grid: Grid
    kdensity: jax.Array
    timings: Dict[str, float] = field(default_factory=dict)


@partial(jax.jit, static_argnames=("N", "nsmooth"))
def fmax_loop(kdensity, radii_grid, invgrow_tab, invgrow_lo, invgrow_dx,
              N: int, nsmooth: int):
    """The full smoothing-radius cycle (fmax.c:66-150) as ONE device
    program: nsmooth x (6 derivative FFTs + collapse update), unrolled.

    A single dispatch + sync per run matters doubly here: XLA can overlap
    and fuse across radii, and the host<->device round trip (expensive on a
    tunneled TPU) is paid once instead of per radius.

    Returns (Fmax, Rmax, d_avg[nsmooth], d_var[nsmooth]) and the R=0
    Hessian stack for the LPT stage.
    """
    Fmax = jnp.full((N, N, N), -10.0, jnp.float32)
    Rmax = jnp.full((N, N, N), -1, jnp.int32)
    avgs = []
    variances = []
    sd = None
    for ism in range(nsmooth):
        sd = derivatives.second_derivatives.__wrapped__(
            kdensity, radii_grid[ism], N)
        Fmax, Rmax, d_avg, d_var = collapse.collapse_update.__wrapped__(
            sd, Fmax, Rmax, jnp.int32(ism), invgrow_tab, invgrow_lo,
            invgrow_dx)
        avgs.append(d_avg)
        variances.append(d_var)
    return Fmax, Rmax, jnp.stack(avgs), jnp.stack(variances), sd


@partial(jax.jit, static_argnames=("N", "order"))
def displacement_stage(kdensity, sd, growths, N: int, order: int):
    """All LPT sources + displacement stacks as one device program
    (compute_displacements, fmax.c:292-367)."""
    D1, D2, D31, D32 = growths
    out = {}
    if order >= 2:
        kvec2, kvec31, kvec32 = lpt.lpt_sources.__wrapped__(sd, N)
        out["v2"] = derivatives.first_derivatives.__wrapped__(
            kvec2, D2, N)
        if order >= 3:
            out["v31"] = derivatives.first_derivatives.__wrapped__(
                kvec31, D31, N)
            out["v32"] = derivatives.first_derivatives.__wrapped__(
                kvec32, D32, N)
    out["v1"] = derivatives.first_derivatives.__wrapped__(kdensity, D1, N)
    return out


def run_fmax(params: Params, cosmo: Cosmology, kdensity=None,
             verbose: bool = True) -> FmaxResult:
    grid = Grid(N=params.GridSize, BoxSize=params.BoxSize_htrue)
    N = grid.N
    sm = Smoothing.build(params, cosmo)
    timings = {}

    t0 = time.perf_counter()
    if kdensity is None:
        kdensity = generate_kdensity(grid, cosmo, params.RandomSeed,
                                     fixed=params.FixedIC,
                                     paired=params.PairedIC)
        kdensity.block_until_ready()
    timings["dens"] = time.perf_counter() - t0

    ig_tab, (ig_lo, ig_dx) = collapse.make_inverse_growth_table(cosmo)

    # ---- cycle on smoothing radii (fmax.c:66-150), one device program ----
    t0 = time.perf_counter()
    radii_grid = jnp.asarray(sm.radii / grid.CellSize, jnp.float32)
    Fmax, Rmax, d_avgs, d_vars, sd = fmax_loop(
        kdensity, radii_grid, ig_tab, ig_lo, ig_dx, N, sm.n)
    sm.true_variance[:] = np.asarray(d_vars)   # d2h sync
    timings["fmax_loop"] = time.perf_counter() - t0
    if verbose:
        for ism in range(sm.n):
            print(f"  smoothing {ism + 1}/{sm.n}: R={sm.radii[ism]:9.5f} "
                  f"expected sigma {math.sqrt(sm.variance[ism]):7.4f} "
                  f"computed "
                  f"{math.sqrt(max(sm.true_variance[ism], 0.0)):7.4f}")

    # ---- displacements at R=0 (fmax.c:152-169, LPT.c) ----
    # the last iteration left the unsmoothed Hessian in sd
    t0 = time.perf_counter()
    z0 = params.zlast if not params.recompute_displacements \
        else params.output_z[0]
    growths = (jnp.float32(cosmo.GrowingMode(z0)),
               jnp.float32(cosmo.GrowingMode_2LPT(z0)),
               jnp.float32(cosmo.GrowingMode_3LPT_1(z0)),
               jnp.float32(cosmo.GrowingMode_3LPT_2(z0)))
    vel: Dict[str, jax.Array] = displacement_stage(kdensity, sd, growths,
                                                   N, params.lpt_order)
    for v in vel.values():
        v.block_until_ready()
    timings["lpt"] = time.perf_counter() - t0

    products = Products(Fmax=Fmax, Rmax=Rmax, vel=vel)
    return FmaxResult(products=products, smoothing=sm, grid=grid,
                      kdensity=kdensity, timings=timings)


def fmax_pdf(Fmax: np.ndarray, fname: str = None):
    """Histogram of Fmax (Fmax_PDF, fmax.c:509-550): 100 bins in
    F in [0.9, 10.9]."""
    bins = np.linspace(0.9, 10.9, 101)
    hist, _ = np.histogram(np.asarray(Fmax).ravel(), bins=bins)
    if fname:
        with open(fname, "w") as fd:
            fd.write("# PDF of Fmax\n# 1) F\n# 2) PDF\n#\n")
            norm = hist.sum() * 0.1
            for i in range(100):
                fd.write(f" {0.5 * (bins[i] + bins[i + 1]):8.4f} "
                         f"{hist[i] / norm:12.6g}\n")
    return hist
