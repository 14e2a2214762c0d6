"""Distributed 3-D FFT + k-space kernels over a device mesh.

TPU-native replacement for the reference's PFFT slab/pencil decomposition
(fmax-pfft.c, initialization.c:1205-1379): real fields are slab-sharded
along x over a 1-D mesh axis; the r2c transform runs the two local axes
on-chip and moves the x axis on-chip with a single ICI all_to_all
(the collective PFFT performs internally with MPI_Alltoall).

Layouts (global shapes, p = mesh size):
  real space   [N, N, N]        sharded P('x', None, None)
  k space      [N, N, N//2+1]   sharded P(None, 'x', None)   (ky sharded)

The Green's-function x smoothing multiply is computed per shard with the
global ky offset from the mesh coordinate, exactly mirroring the per-task
k-loop of compute_derivative (fmax-pfft.c:306-397).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..grids import signed_modes

AX = "x"    # mesh axis name for the slab decomposition


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (AX,))


def real_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(AX, None, None))


def kspace_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(None, AX, None))


# ---------------- per-shard transforms ----------------

def _fwd_local(r, N: int):
    """local [N/p, N, N] real -> local [N, N/p, Nh] complex."""
    k = jnp.fft.rfft(r, axis=2)
    k = jnp.fft.fft(k, axis=1)
    k = jax.lax.all_to_all(k, AX, split_axis=1, concat_axis=0, tiled=True)
    return jnp.fft.fft(k, axis=0)


def _inv_local(k, N: int):
    """local [N, N/p, Nh] complex -> local [N/p, N, N] real."""
    k = jnp.fft.ifft(k, axis=0)
    k = jax.lax.all_to_all(k, AX, split_axis=0, concat_axis=1, tiled=True)
    k = jnp.fft.ifft(k, axis=1)
    return jnp.fft.irfft(k, n=N, axis=2)


def _local_kvectors(N: int, p: int):
    """k in grid units for the transposed k layout, with the ky block
    offset by this shard's mesh coordinate."""
    me = jax.lax.axis_index(AX)
    mloc = N // p
    two_pi = 2.0 * np.pi / N
    mx = jnp.asarray(signed_modes(N), jnp.float32).reshape(N, 1, 1)
    my_idx = me * mloc + jnp.arange(mloc)
    my = jnp.where(my_idx <= N // 2, my_idx, my_idx - N
                   ).astype(jnp.float32).reshape(1, mloc, 1)
    mz = jnp.arange(N // 2 + 1, dtype=jnp.float32).reshape(1, 1, N // 2 + 1)
    return two_pi * mx, two_pi * my, two_pi * mz


def shard_map_fn(mesh, fn, in_specs, out_specs):
    return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def distributed_rfft3(mesh: Mesh, N: int):
    """Forward transform: real P(x) -> k-space P(None, x)."""
    return shard_map_fn(mesh, partial(_fwd_local, N=N),
                        P(AX, None, None), P(None, AX, None))


def distributed_irfft3(mesh: Mesh, N: int):
    return shard_map_fn(mesh, partial(_inv_local, N=N),
                        P(None, AX, None), P(AX, None, None))


def distributed_second_derivatives(mesh: Mesh, N: int):
    """All 6 Hessian components of the smoothed potential, distributed.

    Input: kdensity in the transposed k layout; output [6, N, N, N]
    real-space stack, slab-sharded.  6 inverse FFTs with one fused
    elementwise multiply each, like fmax.c:225-258.
    """
    p = mesh.devices.size

    def local(kden, R_grid):
        kx, ky, kz = _local_kvectors(N, p)
        k2 = kx * kx + ky * ky + kz * kz
        inv_k2 = jnp.where(k2 > 0.0, 1.0 / jnp.where(k2 > 0.0, k2, 1.0),
                           0.0)
        base = kden * (jnp.exp(-0.5 * k2 * R_grid * R_grid) * inv_k2
                       ).astype(jnp.float32)
        kvec = (kx, ky, kz)
        outs = []
        for ia, ib in ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2)):
            outs.append(_inv_local(base * (kvec[ia] * kvec[ib]), N))
        return jnp.stack(outs)

    return shard_map_fn(mesh, local,
                        (P(None, AX, None), P()),
                        P(None, AX, None, None))


def distributed_first_derivatives(mesh: Mesh, N: int):
    """The 3 first derivatives i k_a / k^2 (one displacement stack)."""
    p = mesh.devices.size

    def local(kvector, growth):
        kx, ky, kz = _local_kvectors(N, p)
        k2 = kx * kx + ky * ky + kz * kz
        inv_k2 = jnp.where(k2 > 0.0, 1.0 / jnp.where(k2 > 0.0, k2, 1.0),
                           0.0)
        base = kvector * (1j * growth) * inv_k2.astype(jnp.float32)
        return jnp.stack([_inv_local(base * kx, N),
                          _inv_local(base * ky, N),
                          _inv_local(base * kz, N)])

    return shard_map_fn(mesh, local, (P(None, AX, None), P()),
                        P(None, AX, None, None))
