"""Experiment: second_derivatives FFT strategy shootout on the TPU.

Variants:
  cur      - loop of 6x (ifft2 + irfft-z)              [current]
  batch    - one batched ifft2 + irfft-z over a [6,...] stack
  mmz      - ifft2 per component + z-inverse as 2 real matmuls (MXU)
  mmz_b    - batched ifft2 + batched z-matmul
Prints ms per full 6-component Hessian evaluation (best of 5).
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from pinocchio_tpu.backend import setup
    setup(platform=args.platform)
    import jax
    import jax.numpy as jnp
    from functools import partial
    from pinocchio_tpu.grids import k_grid_units
    from pinocchio_tpu.ops.derivatives import (SECOND_DERIV_PAIRS,
                                               second_derivatives,
                                               smoothed_potential)

    N = args.grid
    Nh = N // 2 + 1

    @jax.jit
    def mkfield(key):
        return (jax.random.normal(key, (N, N, Nh))
                + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                         (N, N, Nh))).astype(jnp.complex64)

    kden = mkfield(jax.random.PRNGKey(0))
    # complex d2h transfers are UNIMPLEMENTED on axon: warm with a jitted
    # real-valued probe
    np.asarray(jax.jit(lambda k: jnp.real(k[0, 0, :4]))(kden))

    # z-inverse DFT bases: x_z = sum_m w_m (Re k_m cos - Im k_m sin)/N
    m = np.arange(Nh)[:, None]
    z = np.arange(N)[None, :]
    w = np.where((m == 0) | (m == N // 2), 1.0, 2.0) / N
    C = jnp.asarray((w * np.cos(2 * np.pi * m * z / N)), jnp.float32)
    S = jnp.asarray((-w * np.sin(2 * np.pi * m * z / N)), jnp.float32)

    R = jnp.float32(2.0)

    @partial(jax.jit, static_argnames=())
    def batch(kden):
        kx, ky, kz = k_grid_units(N)
        base = smoothed_potential(kden, R, N)
        kvec = (kx, ky, kz)
        st = jnp.stack([base * (kvec[a] * kvec[b])
                        for a, b in SECOND_DERIV_PAIRS])
        return jnp.fft.irfft(jnp.fft.ifft2(st, axes=(1, 2)), n=N, axis=3)

    def zmat(u, prec=None):
        return (jnp.matmul(jnp.real(u), C, precision=prec)
                + jnp.matmul(jnp.imag(u), S, precision=prec))

    @partial(jax.jit, static_argnames=())
    def mmz(kden):
        kx, ky, kz = k_grid_units(N)
        base = smoothed_potential(kden, R, N)
        kvec = (kx, ky, kz)
        outs = []
        for a, b in SECOND_DERIV_PAIRS:
            u = jnp.fft.ifft2(base * (kvec[a] * kvec[b]), axes=(0, 1))
            outs.append(zmat(u))
        return jnp.stack(outs)

    @partial(jax.jit, static_argnames=())
    def mmz_b(kden):
        kx, ky, kz = k_grid_units(N)
        base = smoothed_potential(kden, R, N)
        kvec = (kx, ky, kz)
        st = jnp.stack([base * (kvec[a] * kvec[b])
                        for a, b in SECOND_DERIV_PAIRS])
        u = jnp.fft.ifft2(st, axes=(1, 2))
        return zmat(u)

    @partial(jax.jit, static_argnames=("prec",))
    def mmz_p(kden, prec="highest"):
        kx, ky, kz = k_grid_units(N)
        base = smoothed_potential(kden, R, N)
        kvec = (kx, ky, kz)
        outs = []
        for a, b in SECOND_DERIV_PAIRS:
            u = jnp.fft.ifft2(base * (kvec[a] * kvec[b]), axes=(0, 1))
            outs.append(zmat(u, prec))
        return jnp.stack(outs)

    # full inverse DFT bases for the complex axes (x: [N,N], y via same)
    mm_idx = np.arange(N)
    ang = 2 * np.pi * ((np.outer(mm_idx, mm_idx)) % N) / N
    Ec = jnp.asarray(np.cos(ang) / N, jnp.float32)
    Es = jnp.asarray(np.sin(ang) / N, jnp.float32)   # +sin for INVERSE dft

    def cinv_axis0(u, prec):
        """inverse DFT along axis 0 of [N, ..., ...] via real matmuls:
        (Er + i Ei) @ (Ar + i Ai)."""
        ur, ui = jnp.real(u), jnp.imag(u)
        rr = jnp.tensordot(Ec, ur, axes=([1], [0]), precision=prec)
        ri = jnp.tensordot(Ec, ui, axes=([1], [0]), precision=prec)
        ir = jnp.tensordot(Es, ur, axes=([1], [0]), precision=prec)
        ii = jnp.tensordot(Es, ui, axes=([1], [0]), precision=prec)
        return (rr - ii) + 1j * (ri + ir)

    @partial(jax.jit, static_argnames=("prec",))
    def mm3(kden, prec="highest"):
        kx, ky, kz = k_grid_units(N)
        base = smoothed_potential(kden, R, N)
        kvec = (kx, ky, kz)
        outs = []
        for a, b in SECOND_DERIV_PAIRS:
            f = base * (kvec[a] * kvec[b])
            u = cinv_axis0(f, prec)
            u = jnp.swapaxes(cinv_axis0(jnp.swapaxes(u, 0, 1), prec), 0, 1)
            outs.append(zmat(u, prec))
        return jnp.stack(outs)

    variants = {
        "cur": lambda k: second_derivatives(k, R, N),
        "batch": batch,
        "mmz": mmz,
        "mmz_b": mmz_b,
        "mmz_hi": lambda k: mmz_p(k, "highest"),
        "mmz_h3": lambda k: mmz_p(k, "high"),
        "mm3_hi": lambda k: mm3(k, "highest"),
        "mm3_h3": lambda k: mm3(k, "high"),
    }
    # eager slicing is UNIMPLEMENTED on the tunneled backend: probe with a
    # jitted slice program (also the only reliable sync = d2h transfer);
    # a 32^3 block so the error scale is the field rms, not a corner value
    probe = jax.jit(lambda x: (x[0, :32, :32, :32] + 0.0))
    ref = None
    for name, fn in variants.items():
        got = np.asarray(probe(fn(kden)))
        if ref is None:
            ref = got
        else:
            err = np.abs(got - ref).max() / max(float(
                np.sqrt(np.mean(ref ** 2))), 1e-12)
            print(f"{name}: err/rms vs cur {err:.2e}", flush=True)
        best = 1e30
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(probe(fn(kden)))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
