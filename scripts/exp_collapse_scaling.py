#!/usr/bin/env python
"""Why does collapse throughput halve at 512^3? (round-2 verdict, weak #3)

Times the fmax_loop's two halves separately at 256^3 and 512^3:
  - hessian-only scan: 6 derivative c2r's per radius (zmm matmul path)
  - collapse-only scan: eigenvalues + ell_classic + inverse growth on a
    resident Hessian stack (no FFTs)
  - full fmax_loop (the bench metric)
  - hessian with the plain-FFT z-axis (zmm off) for comparison

Run: timeout 3600 python scripts/exp_collapse_scaling.py [--sizes 256,512]
"""
import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pinocchio_tpu import backend
from pinocchio_tpu.backend import setup

setup()

import jax
import jax.numpy as jnp

from pinocchio_tpu.config import read_parameter_file
from pinocchio_tpu.cosmology import Cosmology
from pinocchio_tpu.fmax import Smoothing, fmax_loop
from pinocchio_tpu.grids import Grid
from pinocchio_tpu.ic import generate_kdensity
from pinocchio_tpu.ops import collapse, derivatives

ap = argparse.ArgumentParser()
ap.add_argument("--sizes", default="256,512")
ap.add_argument("--repeat", type=int, default=3)
args = ap.parse_args()

params = read_parameter_file(
    "/root/reference/HMF_Validation/parameter_file", norad=True,
    plc_enabled=False)


@partial(jax.jit, static_argnames=("N", "nsmooth"))
def hessian_loop(kdensity, radii_grid, N, nsmooth):
    def body(carry, R):
        sd = derivatives.second_derivatives.__wrapped__(kdensity, R, N)
        # full-array reduction so no derivative can be dead-code
        # eliminated or algebraically simplified through the slice
        return carry + (sd * sd).sum(), None
    acc, _ = jax.lax.scan(body, jnp.float32(0.0), radii_grid,
                          length=nsmooth)
    return acc


@partial(jax.jit, static_argnames=("N", "nsmooth"))
def collapse_loop(sd, N, nsmooth, invgrow_packs):
    Fmax0 = jnp.full((N, N, N), -10.0, jnp.float32)
    Rmax0 = jnp.full((N, N, N), -1, jnp.int32)

    def body(carry, xs):
        Fmax, Rmax = carry
        ism, pack = xs
        Fmax, Rmax, d_avg, d_var = collapse.collapse_update.__wrapped__(
            sd, Fmax, Rmax, ism, pack)
        return (Fmax, Rmax), d_var
    (Fmax, Rmax), dv = jax.lax.scan(
        body, (Fmax0, Rmax0),
        (jnp.arange(nsmooth, dtype=jnp.int32), invgrow_packs),
        length=nsmooth)
    return Fmax, dv


def sync(x):
    np.asarray(jax.jit(lambda v: jnp.float32(v))(x))


def timeit(fn, repeat):
    fn()                     # compile + warm
    best = 1e30
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


out = {}
for N in (int(s) for s in args.sizes.split(",")):
    params.GridSize = N
    params.BoxSize = float(N)
    cosmo = Cosmology(params)
    grid = Grid(N=N, BoxSize=params.BoxSize_htrue)
    sm = Smoothing.build(params, cosmo)
    ns = sm.n
    kden = generate_kdensity(grid, cosmo, params.RandomSeed)
    kden.block_until_ready()
    radii = jnp.asarray(sm.radii / grid.CellSize, jnp.float32)
    pack = collapse.make_inverse_growth_fit(cosmo)
    packs = jnp.asarray(np.tile(pack[None, :], (ns, 1)))
    solves = N ** 3 * ns

    t_full = timeit(lambda: sync(fmax_loop(kden, radii, packs, N, ns)[2]),
                    args.repeat)
    out[f"full_{N}"] = round(t_full, 3)
    out[f"full_{N}_Msolves"] = round(solves / t_full / 1e6, 1)
    print(f"N={N} full fmax_loop: {t_full:.3f}s "
          f"({solves / t_full / 1e6:.0f} Msolves/s)", flush=True)

    t_h = timeit(lambda: sync(hessian_loop(kden, radii, N, ns)),
                 args.repeat)
    out[f"hessian_{N}"] = round(t_h, 3)
    print(f"N={N} hessian-only: {t_h:.3f}s", flush=True)

    # collapse-only on a resident Hessian stack
    sd = jax.jit(lambda k: derivatives.second_derivatives.__wrapped__(
        k, jnp.float32(2.0), N))(kden)
    sd.block_until_ready()
    t_c = timeit(lambda: sync(collapse_loop(sd, N, ns, packs)[1]),
                 args.repeat)
    out[f"collapse_{N}"] = round(t_c, 3)
    out[f"collapse_{N}_Msolves"] = round(solves / t_c / 1e6, 1)
    print(f"N={N} collapse-only: {t_c:.3f}s "
          f"({solves / t_c / 1e6:.0f} Msolves/s)", flush=True)
    del sd

    # plain-FFT z-axis (zmm off): fresh jit wrapper traced with the
    # switch off, created ONCE so repeats hit its cache
    old = backend._ZMM_N_MAX
    backend._ZMM_N_MAX = 0
    try:
        hess_fft = jax.jit(hessian_loop.__wrapped__,
                           static_argnames=("N", "nsmooth"))
        t_hf = timeit(lambda: sync(hess_fft(kden, radii, N, ns)),
                      args.repeat)
        out[f"hessian_fft_{N}"] = round(t_hf, 3)
        print(f"N={N} hessian (fft z-axis): {t_hf:.3f}s", flush=True)
    finally:
        backend._ZMM_N_MAX = old
    del kden

print("RESULT " + json.dumps(out), flush=True)
