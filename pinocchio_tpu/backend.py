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
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _DONE = True


def rfft3(x):
    """3-D r2c transform, layout [N, N, N] -> [N, N, N//2+1]."""
    return jnp.fft.fft2(jnp.fft.rfft(x, axis=2), axes=(0, 1))


def irfft3(k, n: int):
    """3-D c2r transform, layout [N, N, N//2+1] -> [N, N, N]."""
    return jnp.fft.irfft(jnp.fft.ifft2(k, axes=(0, 1)), n=n, axis=2)
