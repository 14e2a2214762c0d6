"""JAX backend configuration and FFT helpers for the axon TPU platform.

Two quirks of the tunneled TPU backend are handled here:
  - the monolithic 3-D c2r lowering compiles pathologically slowly
    (minutes); the same transform as 2-D c2c + 1-D c2r compiles in seconds
    with equivalent runtime, so rfft3/irfft3 below are used everywhere
  - eager (op-by-op) dispatch of some complex-typed primitives is
    unimplemented; compute paths must be jitted (they are)

setup() also turns on the persistent compilation cache so a bench run never
pays a cold compile twice.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_DONE = False


def setup(platform: str | None = None,
          cache_dir: str = os.path.expanduser("~/.jax_cache")) -> None:
    global _DONE
    if platform:
        jax.config.update("jax_platforms", platform)
    if not _DONE:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist even trivial programs: on the tunneled backend a fresh
        # compile costs a remote roundtrip (tens of seconds) regardless
        # of program size
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _DONE = True


def rfft3(x):
    """3-D r2c transform, layout [N, N, N] -> [N, N, N//2+1]."""
    return jnp.fft.fft2(jnp.fft.rfft(x, axis=2), axes=(0, 1))


def irfft3(k, n: int):
    """3-D c2r transform, layout [N, N, N//2+1] -> [N, N, N]."""
    return jnp.fft.irfft(jnp.fft.ifft2(k, axes=(0, 1)), n=n, axis=2)


# --- z-axis inverse DFT as an MXU matmul -------------------------------
# On TPU the length-N c2r axis is faster as two real matmuls against a
# [N//2+1, N] cosine/sine basis than as an FFT: the contraction rides the
# systolic array while the FFT butterflies are VPU/memory bound.  Measured
# (scripts/exp_fft_variants.py, v5e): full Hessian 57->37 ms at 256^3,
# 402->250 ms at 512^3, max rel error 2e-7 at precision=HIGHEST.
# Flops scale N^4 vs N^3 log N, so the default gates at N<=512.

_ZMM_N_MAX = 512


def use_zmm(N: int) -> bool:
    """Whether irfft3_zmm should replace irfft3 (decided at trace time)."""
    return (jax.default_backend() not in ("cpu",)) and N <= _ZMM_N_MAX


def _zdft_bases(N: int):
    """Inverse-rfft bases C, S [N//2+1, N] with exact mod-N angle
    reduction (m*z mod N stays in int32, so float32 cos/sin see arguments
    <= 2*pi and keep full precision)."""
    Nh = N // 2 + 1
    m = jnp.arange(Nh, dtype=jnp.int32).reshape(Nh, 1)
    z = jnp.arange(N, dtype=jnp.int32).reshape(1, N)
    ang = (2.0 * jnp.pi / N) * jnp.asarray((m * z) % N, jnp.float32)
    w = jnp.where((m == 0) | (m == N // 2), 1.0, 2.0).astype(jnp.float32) / N
    return w * jnp.cos(ang), -w * jnp.sin(ang)


def irfft_z(k, n: int):
    """c2r along the LAST axis via the fastest path (any leading dims)."""
    if use_zmm(n):
        C, S = _zdft_bases(n)
        return (jnp.matmul(jnp.real(k), C, precision="highest")
                + jnp.matmul(jnp.imag(k), S, precision="highest"))
    return jnp.fft.irfft(k, n=n, axis=-1)


def irfft3_zmm(k, n: int):
    """irfft3 with the z-axis c2r as two HIGHEST-precision real matmuls."""
    C, S = _zdft_bases(n)
    u = jnp.fft.ifft2(k, axes=(0, 1))
    return (jnp.matmul(jnp.real(u), C, precision="highest")
            + jnp.matmul(jnp.imag(u), S, precision="highest"))


def irfft3_auto(k, n: int):
    """irfft3 via the fastest available path for this platform/size."""
    return irfft3_zmm(k, n) if use_zmm(n) else irfft3(k, n)
