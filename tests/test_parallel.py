"""Distributed FFT decompositions vs np.fft on the virtual 8-device mesh.

The reference validates its PFFT layer implicitly via the sigma(R)
self-consistency check (fmax.c:143-146); here the slab and pencil paths are
checked field-level against the single-chip rfftn/irfftn round trip and the
single-chip derivative kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinocchio_tpu.parallel import pfft
from pinocchio_tpu.parallel.driver import demo_step

N = 32


def _meshes():
    out = [("slab", pfft.make_mesh(8))]
    out.append(("pencil42", pfft.make_pencil_mesh(8)))          # 4x2
    out.append(("pencil24", pfft.make_pencil_mesh(8, (2, 4))))  # 2x4
    return out


@pytest.mark.parametrize("name,mesh", _meshes(), ids=lambda v: v
                         if isinstance(v, str) else "")
def test_roundtrip_and_forward(name, mesh):
    decomp = pfft.make_decomp(mesh, N)
    rng = np.random.default_rng(7)
    r = rng.standard_normal((N, N, N)).astype(np.float32)

    fwd = jax.jit(pfft.distributed_rfft3(decomp))
    inv = jax.jit(pfft.distributed_irfft3(decomp))

    rdev = jax.device_put(r, decomp.real_sharding())
    k = fwd(rdev)
    assert k.shape == decomp.k_global_shape

    # forward matches np.fft.rfftn on the unpadded region
    Nh = N // 2 + 1
    k_np = np.fft.rfftn(r)
    got = np.asarray(k)[:, :, :Nh]
    assert np.allclose(got, k_np, rtol=2e-4, atol=2e-2)
    # padded kz planes (pencil only) are exactly zero
    if decomp.k_global_shape[2] > Nh:
        assert np.all(np.asarray(k)[:, :, Nh:] == 0)

    back = np.asarray(inv(k))            # ifft chain is fully normalized
    assert np.allclose(back, r, atol=1e-4)


@pytest.mark.parametrize("name,mesh", _meshes(), ids=lambda v: v
                         if isinstance(v, str) else "")
def test_second_derivatives_match_single_chip(name, mesh):
    from pinocchio_tpu.ops import derivatives
    decomp = pfft.make_decomp(mesh, N)
    rng = np.random.default_rng(3)
    Nh = N // 2 + 1
    kden_np = (rng.standard_normal((N, N, Nh))
               + 1j * rng.standard_normal((N, N, Nh))).astype(np.complex64)
    R_grid = jnp.float32(1.5)

    ref = np.asarray(jax.jit(
        lambda kd: derivatives.second_derivatives(kd, R_grid, N)
    )(kden_np))

    kpad = np.zeros(decomp.k_global_shape, np.complex64)
    kpad[:, :, :Nh] = kden_np
    kdev = jax.device_put(kpad, decomp.kspace_sharding())
    got = np.asarray(jax.jit(
        pfft.distributed_second_derivatives(decomp))(kdev, R_grid))
    assert got.shape == (6, N, N, N)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 2e-4 * scale


def test_demo_step_pencil():
    Fmax, Rmax, disp = demo_step(pfft.make_pencil_mesh(8), N=N)
    assert Fmax.shape == (N, N, N)
    assert disp.shape == (3, N, N, N)
    assert np.isfinite(np.asarray(Fmax)).all()
    # the same step on a slab mesh gives identical physics
    Fs, _, ds = demo_step(pfft.make_mesh(8), N=N)
    assert np.allclose(np.asarray(Fmax), np.asarray(Fs), atol=1e-3)
    assert np.allclose(np.asarray(disp), np.asarray(ds), atol=1e-3)
