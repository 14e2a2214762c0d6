"""Grid descriptors and k-space utilities.

Replaces the reference's grid_data + PFFT bookkeeping (fmax-pfft.c:80-134)
with a JAX-native description: real fields are [N, N, N] float arrays in
(x, y, z) order, k-space fields are rfftn outputs [N, N, N//2+1] complex.
The reverse transform convention matches the reference (1/N^3 on c2r,
fmax-pfft.c:85 'norm'), which is jnp.fft.irfftn's default.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class Grid:
    N: int                      # grid points per side
    BoxSize: float              # true Mpc
    dtype: str = "float32"

    @property
    def CellSize(self) -> float:
        return self.BoxSize / self.N

    @property
    def Ntotal(self) -> int:
        return self.N ** 3

    @property
    def cshape(self):
        return (self.N, self.N, self.N // 2 + 1)

    @property
    def rshape(self):
        return (self.N, self.N, self.N)


def signed_modes(N: int) -> np.ndarray:
    """Signed integer mode numbers m for an FFT axis: 0..N/2, -(N/2-1)..-1."""
    m = np.arange(N)
    return np.where(m <= N // 2, m, m - N)


def k_grid_units(N: int):
    """k vectors in grid units (2*pi*m/N) for the rfftn layout, as float32
    device-friendly arrays broadcastable to [N, N, N//2+1].

    Mirrors the k-loop of compute_derivative (fmax-pfft.c:306-341) where
    knorm = 2*pi/N and indices above N/2 wrap negative.
    """
    kx = (2.0 * np.pi / N) * signed_modes(N)
    kz = kx[: N // 2 + 1]
    return (jnp.asarray(kx, jnp.float32).reshape(N, 1, 1),
            jnp.asarray(kx, jnp.float32).reshape(1, N, 1),
            jnp.asarray(np.abs(kz), jnp.float32).reshape(1, 1, N // 2 + 1))


def mode_radius_sq(N: int) -> np.ndarray:
    """|m|^2 on the rfftn grid (numpy, host)."""
    m = signed_modes(N).astype(np.int64)
    mz = np.arange(N // 2 + 1, dtype=np.int64)
    return (m[:, None, None] ** 2 + m[None, :, None] ** 2
            + mz[None, None, :] ** 2)
