"""Initial conditions: Gaussian linear density field in k-space.

TPU-native replacement for the reference's N-GenIC-derived generator
(GenIC.c:73-460).  The reference achieves task-count invariance through a
distributed seed plane with a serial GSL RNG fast-forwarded per (kx,ky)
column (GenIC.c:482-1143); here the same *property* comes for free from
JAX's counter-based threefry PRNG: every mode's (phase, amplitude) pair is a
pure function of (seed, mode index), independent of device layout.

Math contract matched to the reference (GenIC.c:188-446):
  delta(k) = Box^{-3/2} * sqrt(P(|k|) * E) * exp(i phase),     E ~ Exp(1)
  FixedIC drops E (|delta| fixed to the mean, GenIC.c:375-376),
  PairedIC adds pi to the phase (GenIC.c:371-372),
  modes with any component at the Nyquist frequency are left empty,
  |m| > N/2 spherical cutoff (NYQUIST, GenIC.c:280-281),
  Hermitian symmetry is imposed on the kz=0 plane (GenIC.c:289-368).

Like the reference, delta(k) carries an N^3 factor (GenIC.c:428-445) that
cancels the 1/N^3 of the c2r transform (fmax-pfft.c:85 'norm'), which is
also jnp.fft.irfftn's default convention: the realized field variance is
sum_k P(k)/V as it must be.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .cosmology import Cosmology
from .grids import Grid, mode_radius_sq, signed_modes


def pk_table(cosmo: Cosmology, grid: Grid, npts: int = 4096):
    """Dense log-log P(k) table covering the grid's k-range (host, fp64)."""
    kf = 2.0 * math.pi / grid.BoxSize
    logk = np.linspace(math.log10(kf) - 3.0,
                       math.log10(kf * grid.N * 2.0), npts)
    pk = cosmo.PowerSpectrum(10.0 ** logk)
    logpk = np.log10(np.maximum(pk, 1e-300))
    return (jnp.asarray(logk, jnp.float32), jnp.asarray(logpk, jnp.float32))


def _hermitian_maps(N: int):
    """Index maps imposing delta(-k) = delta*(k) on the kz=0 plane.

    A mode (ix, iy, 0) is 'dependent' when ix > N/2, or ix == 0 and
    iy > N/2: it takes the mirrored mode's draws with conjugation
    (GenIC.c:293-368).  Returns (dependent mask, mirror ix, mirror iy).
    """
    ix = np.arange(N)[:, None]
    iy = np.arange(N)[None, :]
    dep = (ix > N // 2) | ((ix == 0) & (iy > N // 2))
    mix = (N - ix) % N
    miy = (N - iy) % N
    return dep, np.broadcast_to(mix, (N, N)), np.broadcast_to(miy, (N, N))


from functools import partial


@partial(jax.jit, static_argnames=("N", "fixed", "paired"))
def _kdensity_jit(key, logk_tab, logpk_tab, logkm, alive, dep, mix, miy,
                  fac, N: int, fixed: bool, paired: bool):
    Nh = N // 2 + 1
    kp, ka = jax.random.split(key)
    # phases and amplitude draws for every mode; counter-based => identical
    # for any device mesh (this is the reference's seed-plane invariance)
    phase = jax.random.uniform(kp, (N, N, Nh), jnp.float32,
                               0.0, 2.0 * np.pi)
    ampl = jax.random.uniform(ka, (N, N, Nh), jnp.float32,
                              minval=1.1754944e-38, maxval=1.0)

    # Hermitian symmetry on the kz=0 plane: dependent modes reuse the
    # mirrored mode's draws and conjugate
    ph0 = jnp.where(dep, phase[mix, miy, 0], phase[:, :, 0])
    am0 = jnp.where(dep, ampl[mix, miy, 0], ampl[:, :, 0])
    sign0 = jnp.where(dep, -1.0, 1.0).astype(jnp.float32)
    phase = phase.at[:, :, 0].set(ph0)
    ampl = ampl.at[:, :, 0].set(am0)
    sign = jnp.ones((N, N, Nh), jnp.float32).at[:, :, 0].set(sign0)

    pofk = 10.0 ** jnp.interp(logkm, logk_tab, logpk_tab)
    if not fixed:
        pofk = pofk * (-jnp.log(ampl))
    if paired:
        phase = phase + np.pi

    amp = jnp.where(alive, fac * jnp.sqrt(pofk), 0.0)
    return (amp * jnp.cos(phase)
            + 1j * (sign * amp * jnp.sin(phase))).astype(jnp.complex64)


def generate_kdensity(grid: Grid, cosmo: Cosmology, seed: int,
                      fixed: bool = False, paired: bool = False):
    """delta(k) on the rfftn grid [N, N, N//2+1], complex64."""
    N = grid.N
    Nh = N // 2 + 1
    logk_tab, logpk_tab = pk_table(cosmo, grid)
    key = jax.random.PRNGKey(seed)

    dep, mix, miy = _hermitian_maps(N)

    # physical |k| per mode (host, fp64) and empty-mode mask:
    # k=0, any Nyquist component, spherical cutoff beyond N/2
    m2 = mode_radius_sq(N)
    kf = 2.0 * math.pi / grid.BoxSize
    kmag = kf * np.sqrt(m2)
    with np.errstate(divide="ignore"):
        logkm = np.log10(np.where(kmag > 0, kmag, 1.0)).astype(np.float32)
    mi = signed_modes(N)
    nyq_x = (np.abs(mi) == N // 2)[:, None, None]
    nyq_y = (np.abs(mi) == N // 2)[None, :, None]
    nyq_z = (np.arange(Nh) == N // 2)[None, None, :]
    alive = ~(nyq_x | nyq_y | nyq_z) & (m2 > 0) & (m2 <= (N // 2) ** 2)

    fac = grid.BoxSize ** -1.5 * float(N) ** 3
    return _kdensity_jit(key, logk_tab, logpk_tab, jnp.asarray(logkm),
                         jnp.asarray(alive), jnp.asarray(dep),
                         jnp.asarray(mix), jnp.asarray(miy),
                         jnp.float32(fac), N, bool(fixed), bool(paired))
