#!/usr/bin/env python
"""Prototype: all-matmul 3-D c2r Hessian vs the fft2+zmm path.

The 512^3 collapse cycle is ~88% Hessian transforms (exp_collapse_scaling);
XLA's fft2 butterflies are VPU-bound.  Try the x/y inverse DFTs as MXU
matmuls (precision HIGH = bf16x3) with the k_i k_j Green's-function factors
folded into per-axis diagonal-scaled DFT matrices, sharing partial
transforms across the 6 components (15 complex matmuls instead of 18).

Run: timeout 3600 python scripts/exp_matmul_fft.py [--N 512]
"""
import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pinocchio_tpu.backend import setup

setup()

import jax
import jax.numpy as jnp

from pinocchio_tpu.ops import derivatives

ap = argparse.ArgumentParser()
ap.add_argument("--N", type=int, default=512)
ap.add_argument("--repeat", type=int, default=3)
ap.add_argument("--check", action="store_true",
                help="also compare values vs the reference path")
args = ap.parse_args()
N = args.N
Nh = N // 2 + 1

PREC = {"default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
        "highest": jax.lax.Precision.HIGHEST}[
            os.environ.get("MM_PREC", "high")]


def _modes(n):
    m = np.arange(n)
    return np.where(m <= n // 2, m, m - n)


def inv_dft_mat(N, power: int):
    """W[p, x] = exp(+2pi i p x / N)/N * k(p)^power, k in grid units.
    Returned as (re, im) float32 — complex h2d transfers are
    UNIMPLEMENTED on the tunneled backend."""
    p = np.arange(N)
    x = np.arange(N)
    ang = 2.0 * np.pi * ((np.outer(p, x) % N)) / N
    k = 2.0 * np.pi * _modes(N) / N
    kp = (k[:, None] ** power if power else np.ones((N, 1))) / N
    return (jnp.asarray(kp * np.cos(ang), jnp.float32),
            jnp.asarray(kp * np.sin(ang), jnp.float32))


def c2r_bases(N, power: int):
    """zmm C/S [Nh, N] with k^power folded (backend._zdft_bases + diag)."""
    m = np.arange(Nh)
    z = np.arange(N)
    ang = 2.0 * np.pi * ((np.outer(m, z)) % N) / N
    w = np.where((m == 0) | (m == N // 2), 1.0, 2.0) / N
    k = 2.0 * np.pi * m / N          # kz >= 0 on the rfft axis
    kp = k ** power if power else np.ones(Nh)
    C = (w * kp)[:, None] * np.cos(ang)
    S = -(w * kp)[:, None] * np.sin(ang)
    return jnp.asarray(C, jnp.float32), jnp.asarray(S, jnp.float32)


WX = {p: inv_dft_mat(N, p) for p in (0, 1, 2)}
CZ = {p: c2r_bases(N, p) for p in (0, 1, 2)}


@partial(jax.jit, static_argnames=("N",))
def hessian_mm(kdensity, R_grid, N):
    """All 6 second derivatives via per-axis matmul DFTs."""
    kx, ky, kz = derivatives._kvectors(N)
    k2 = kx * kx + ky * ky + kz * kz
    inv_k2 = jnp.where(k2 > 0.0, 1.0 / jnp.where(k2 > 0.0, k2, 1.0), 0.0)
    smooth = jnp.exp(-0.5 * k2 * R_grid * R_grid)
    B = kdensity * (smooth * inv_k2).astype(jnp.float32)   # [N, N, Nh]

    def tz(p, a):     # z-axis c2r with k^p folded
        C, S = CZ[p]
        return (jnp.matmul(jnp.real(a), C, precision=PREC)
                + jnp.matmul(jnp.imag(a), S, precision=PREC))

    # x stage: 3 partials, powers 0/1/2 (W already includes /N and k^p);
    # NB W[p][p_idx, x] maps mode->x, so contract the MODE axis.
    # Complex matrices rebuilt on device from their real parts (complex
    # h2d is unimplemented on this backend).
    WXC = {p: WX[p][0] + 1j * WX[p][1] for p in (0, 1, 2)}
    X = {p: jnp.einsum("px,pyz->xyz", WXC[p], B, precision=PREC)
         for p in (0, 1, 2)}
    # y stage
    Y = {}
    Y[(2, 0)] = jnp.einsum("py,xpz->xyz", WXC[0], X[2], precision=PREC)
    Y[(1, 1)] = jnp.einsum("py,xpz->xyz", WXC[1], X[1], precision=PREC)
    Y[(1, 0)] = jnp.einsum("py,xpz->xyz", WXC[0], X[1], precision=PREC)
    Y[(0, 2)] = jnp.einsum("py,xpz->xyz", WXC[2], X[0], precision=PREC)
    Y[(0, 1)] = jnp.einsum("py,xpz->xyz", WXC[1], X[0], precision=PREC)
    Y[(0, 0)] = jnp.einsum("py,xpz->xyz", WXC[0], X[0], precision=PREC)
    # z stage, ider order xx yy zz xy xz yz; signs: (ik_a)(ik_b) = -k_ak_b,
    # and the reference convention is +k_a k_b / k^2 (no i factor), so
    # multiply by -1: (i k_a)(i k_b) -> -(k_a k_b).  The matrices above
    # apply k^p directly (not (ik)^p), so parity: each k factor applied
    # through W/C carries no i; the +k_ak_b/k^2 convention matches with
    # sign +1.
    sd = jnp.stack([
        tz(0, Y[(2, 0)]),
        tz(0, Y[(0, 2)]),
        tz(2, Y[(0, 0)]),
        tz(0, Y[(1, 1)]),
        tz(1, Y[(1, 0)]),
        tz(1, Y[(0, 1)]),
    ])
    return sd


def timeit(fn, repeat):
    fn()
    best = 1e30
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


key = jax.random.PRNGKey(0)


@jax.jit
def make_kden(key):
    a = jax.random.normal(key, (N, N, Nh))
    b = jax.random.normal(jax.random.fold_in(key, 1), (N, N, Nh))
    return (a + 1j * b).astype(jnp.complex64)


kden = make_kden(key)
kden.block_until_ready()
R = jnp.float32(2.0)

out = {"N": N}

sync_probe = jax.jit(lambda s: s[0, 0, 0, :8])


def run_ref():
    np.asarray(sync_probe(derivatives.second_derivatives(kden, R, N)))


def run_mm():
    np.asarray(sync_probe(hessian_mm(kden, R, N)))


t_ref = timeit(run_ref, args.repeat)
print(f"reference (fft2+zmm) hessian: {t_ref:.3f}s", flush=True)
out["ref_s"] = round(t_ref, 4)

t_mm = timeit(run_mm, args.repeat)
print(f"all-matmul hessian:          {t_mm:.3f}s", flush=True)
out["mm_s"] = round(t_mm, 4)

if args.check:
    s_ref = derivatives.second_derivatives(kden, R, N)
    s_mm = hessian_mm(kden, R, N)

    @jax.jit
    def err(a, b):
        d = jnp.abs(a - b)
        scale = jnp.maximum(jnp.max(jnp.abs(a)), 1e-30)
        return jnp.max(d) / scale
    e = float(np.asarray(err(s_ref, s_mm)))
    out["max_rel_err"] = e
    print(f"max rel err vs reference: {e:.2e}", flush=True)

print("RESULT " + json.dumps(out), flush=True)
