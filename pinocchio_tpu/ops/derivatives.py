"""k-space derivative kernels: the heart of the fmax pipeline.

Replaces compute_derivative (fmax-pfft.c:255-441): multiply delta(k) by the
Green's function of the inverse Laplacian, a Gaussian smoothing window and
(optionally) a growth factor, then inverse-FFT.  On TPU the per-mode multiply
is a single fused elementwise op over the rfftn cube; the 6 Hessian
components share one smoothed field.

Conventions (greens_function, fmax-pfft.c:444-456):
  second derivative (ia, ib >= 1):  +k_ia k_ib / k^2      (no i factor)
  first derivative  (ia >= 1):      +i k_ia / k^2         (the real/imag
                                    swap at fmax-pfft.c:389-394 is a
                                    multiplication by i)
k is in grid units 2*pi*m/N and the smoothing radius in cell units, so the
products are dimensionless displacements in units of the inter-particle
distance, exactly as the reference stores them.

Derivative component order (fmax.c:235-239 'ider'):
  0:(1,1) 1:(2,2) 2:(3,3) 3:(1,2) 4:(1,3) 5:(2,3)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..backend import irfft3_auto as irfft3
from ..grids import k_grid_units

SECOND_DERIV_PAIRS = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))

# all-matmul Hessian transform switch: on TPU the 512^3 collapse cycle
# is ~88% fft2 butterflies (VPU-bound, scripts/exp_collapse_scaling.py);
# expressing the x/y inverse DFTs as MXU matmuls with the k_i k_j
# Green's-function factors folded into per-axis diagonal-scaled DFT
# matrices runs 3.1x faster (0.086 s vs 0.264 s per radius at 512^3,
# max rel err 3.4e-5 at precision HIGH; scripts/exp_matmul_fft.py).
# Above 512 the [N, N, Nh] complex partials no longer fit HBM three
# abreast — the ooc engine owns those sizes anyway.
_MM_N_MAX = 512
_MM_FORCE = None     # tests: True/False overrides the platform gate


def use_mm(N: int) -> bool:
    if _MM_FORCE is not None:
        return bool(_MM_FORCE) and N % 2 == 0
    return (jax.default_backend() not in ("cpu",)
            and N % 2 == 0 and N <= _MM_N_MAX)


def _kvectors(N):
    return k_grid_units(N)


def _mm_inv_mat(N: int, power: int):
    """Inverse-DFT matrix for one axis with k^power folded (k in grid
    units): W[p, x] = k(p)^power exp(+2 pi i p x / N) / N, built on
    device from iotas (complex h2d transfers are unimplemented on the
    tunneled backend) as (re, im) float32."""
    p = jnp.arange(N, dtype=jnp.int32).reshape(N, 1)
    x = jnp.arange(N, dtype=jnp.int32).reshape(1, N)
    ang = (2.0 * jnp.pi / N) * jnp.asarray((p * x) % N, jnp.float32)
    half = N // 2
    m = jnp.where(p <= half, p, p - N).astype(jnp.float32)
    k = (2.0 * jnp.pi / N) * m
    kp = (k ** power if power else jnp.ones_like(k)) / N
    return kp * jnp.cos(ang), kp * jnp.sin(ang)


def _mm_c2r_mat(N: int, power: int):
    """rfft-axis c2r bases C, S [Nh, N] with k^power folded
    (backend._zdft_bases + diagonal scaling)."""
    Nh = N // 2 + 1
    m = jnp.arange(Nh, dtype=jnp.int32).reshape(Nh, 1)
    z = jnp.arange(N, dtype=jnp.int32).reshape(1, N)
    ang = (2.0 * jnp.pi / N) * jnp.asarray((m * z) % N, jnp.float32)
    w = jnp.where((m == 0) | (m == N // 2), 1.0, 2.0).astype(jnp.float32) / N
    k = (2.0 * jnp.pi / N) * m.astype(jnp.float32)
    kp = (k ** power if power else jnp.ones_like(k))
    return (w * kp) * jnp.cos(ang), -(w * kp) * jnp.sin(ang)


def _second_derivatives_mm(kdensity, R_grid, N: int):
    """All 6 second derivatives via per-axis matmul DFTs, sharing the
    partial transforms (15 complex matmuls instead of 18): x stage keeps
    3 k-power variants, y stage expands to the 6 (px, py) patterns, z
    stage applies the c2r bases with kz^power folded."""
    # HIGH (bf16x3 passes) measured 0.086 s / 3.4e-5 max err at 512^3;
    # DEFAULT is only 14% faster but 150x less accurate (5e-3)
    PREC = jax.lax.Precision.HIGH
    base = smoothed_potential(kdensity, R_grid, N)
    W = {}
    for p in (0, 1, 2):
        re, im = _mm_inv_mat(N, p)
        W[p] = re + 1j * im
    X = {p: jnp.einsum("px,pyz->xyz", W[p], base, precision=PREC)
         for p in (0, 1, 2)}
    Y = {
        (2, 0): jnp.einsum("py,xpz->xyz", W[0], X[2], precision=PREC),
        (1, 1): jnp.einsum("py,xpz->xyz", W[1], X[1], precision=PREC),
        (1, 0): jnp.einsum("py,xpz->xyz", W[0], X[1], precision=PREC),
        (0, 2): jnp.einsum("py,xpz->xyz", W[2], X[0], precision=PREC),
        (0, 1): jnp.einsum("py,xpz->xyz", W[1], X[0], precision=PREC),
        (0, 0): jnp.einsum("py,xpz->xyz", W[0], X[0], precision=PREC),
    }

    def tz(p, a):
        C, S = _mm_c2r_mat(N, p)       # [Nh, N]: kz modes -> z planes
        return (jnp.matmul(jnp.real(a), C, precision=PREC)
                + jnp.matmul(jnp.imag(a), S, precision=PREC))

    # ider order xx yy zz xy xz yz (powers on x/y in Y, rest on z)
    return jnp.stack([
        tz(0, Y[(2, 0)]), tz(0, Y[(0, 2)]), tz(2, Y[(0, 0)]),
        tz(0, Y[(1, 1)]), tz(1, Y[(1, 0)]), tz(1, Y[(0, 1)])])


def smoothed_potential(kdensity, R_grid: jnp.ndarray, N: int):
    """delta(k) * exp(-k^2 R^2 / 2) / k^2 with the k=0 mode zeroed.

    This is the shared factor of all 6 second derivatives for one radius.
    """
    kx, ky, kz = _kvectors(N)
    k2 = kx * kx + ky * ky + kz * kz
    inv_k2 = jnp.where(k2 > 0.0, 1.0 / jnp.where(k2 > 0.0, k2, 1.0), 0.0)
    smooth = jnp.exp(-0.5 * k2 * R_grid * R_grid)
    return kdensity * (smooth * inv_k2).astype(jnp.float32)


@partial(jax.jit, static_argnames=("N",))
def second_derivatives(kdensity, R_grid, N: int):
    """All 6 second derivatives of the smoothed inverse-Laplacian potential.

    Returns a [6, N, N, N] float32 stack in 'ider' order.  Equivalent to
    compute_second_derivatives (fmax.c:225-258) = 6 c2r FFTs — executed
    as per-axis MXU matmul DFTs where that is faster (use_mm)."""
    if use_mm(N):
        return _second_derivatives_mm(kdensity, R_grid, N)
    kx, ky, kz = _kvectors(N)
    base = smoothed_potential(kdensity, R_grid, N)
    kvec = (kx, ky, kz)
    outs = []
    for ia, ib in SECOND_DERIV_PAIRS:
        outs.append(irfft3(base * (kvec[ia] * kvec[ib]), N))
    return jnp.stack(outs)


@partial(jax.jit, static_argnames=("N",))
def first_derivatives(kvector, growth, N: int):
    """The 3 first derivatives i k_a/k^2 of a k-space source, scaled by a
    growth factor: one LPT displacement field [3, N, N, N].

    Equivalent to compute_first_derivatives (fmax.c:193-222) at R=0 with
    the ScaleDep growth switch of fmax-pfft.c:344-364 reduced to a scalar
    (scale-independent growth).
    """
    kx, ky, kz = _kvectors(N)
    k2 = kx * kx + ky * ky + kz * kz
    inv_k2 = jnp.where(k2 > 0.0, 1.0 / jnp.where(k2 > 0.0, k2, 1.0), 0.0)
    base = kvector * (1j * growth) * inv_k2.astype(jnp.float32)
    return jnp.stack([irfft3(base * kx, N),
                      irfft3(base * ky, N),
                      irfft3(base * kz, N)])


@partial(jax.jit, static_argnames=("N",))
def first_derivatives_tab(kvector, gtab, glo, gdx, N: int):
    """Like first_derivatives but with a per-mode growth factor from a
    uniform table over log10 |k| (grid units): the scale-dependent growth
    switch of compute_derivative (fmax-pfft.c:344-364).  NB the reference
    evaluates GrowingMode at |k| in grid units (fmax-pfft.c:340,350) —
    reproduced as-is."""
    kx, ky, kz = _kvectors(N)
    k2 = kx * kx + ky * ky + kz * kz
    inv_k2 = jnp.where(k2 > 0.0, 1.0 / jnp.where(k2 > 0.0, k2, 1.0), 0.0)
    logk = 0.5 * jnp.log10(jnp.maximum(k2, 1e-12))
    t = jnp.clip((logk - glo) / gdx, 0.0, gtab.shape[0] - 1.001)
    i = t.astype(jnp.int32)
    w = t - i.astype(jnp.float32)
    growth = gtab[i] * (1.0 - w) + gtab[i + 1] * w
    base = kvector * (1j * growth) * inv_k2.astype(jnp.float32)
    return jnp.stack([irfft3(base * kx, N), irfft3(base * ky, N),
                      irfft3(base * kz, N)])


@partial(jax.jit, static_argnames=("N",))
def density_field(kdensity, N: int):
    """Real-space linear density contrast (c2r of delta(k))."""
    return irfft3(kdensity, N)
