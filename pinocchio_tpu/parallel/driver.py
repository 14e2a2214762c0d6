"""Multi-chip fmax pipeline step.

Builds the jitted, mesh-sharded computation that the single-chip fmax loop
performs per smoothing radius, plus the displacement stage: this is the
framework's 'training step' for multi-device validation and scaling runs.
Works over either decomposition (slab 1-D mesh / pencil 2-D mesh).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..ops import collapse
from . import pfft


def build_fmax_step(decomp):
    """Returns a jitted function of
        (kdensity_kspace, Fmax, Rmax, R_grid, ismooth, pack)
    performing one smoothing radius: 6 distributed derivative FFTs + the
    collapse-time update, all sharded over the mesh."""
    second = pfft.distributed_second_derivatives(decomp)

    def step(kden, Fmax, Rmax, R_grid, ismooth, pack):
        sd = second(kden, R_grid)
        return collapse.collapse_update(sd, Fmax, Rmax, ismooth, pack)

    return jax.jit(step)


def build_displacement_step(decomp):
    """Zel'dovich displacement stack from the sharded kdensity."""
    first = pfft.distributed_first_derivatives(decomp)
    return jax.jit(lambda kden, growth: first(kden, growth))


def demo_step(mesh: Mesh, N: int = 32, seed: int = 1):
    """One full multi-chip fmax step on a random field: used by
    __graft_entry__.dryrun_multichip and the scaling tests."""
    decomp = pfft.make_decomp(mesh, N)
    kshard = decomp.kspace_sharding()
    rshard = decomp.real_sharding()
    kshape = decomp.k_global_shape
    Nh = N // 2 + 1

    key = jax.random.PRNGKey(seed)

    @jax.jit
    def make_field(key):
        # draw on the unpadded rfft shape then zero-pad: the field (and
        # the step's physics) is identical for every decomposition
        k = (jax.random.normal(key, (N, N, Nh))
             + 1j * jax.random.normal(jax.random.fold_in(key, 1),
                                      (N, N, Nh))).astype(jnp.complex64)
        return jnp.pad(k, ((0, 0), (0, 0), (0, kshape[2] - Nh)))

    kden = jax.device_put(make_field(key), kshard)
    Fmax = jax.device_put(jnp.full((N, N, N), -10.0, jnp.float32), rshard)
    Rmax = jax.device_put(jnp.full((N, N, N), -1, jnp.int32), rshard)

    # linear-growth inverse fit for a D ~ a background
    from ..ops.collapse import fit_inverse_growth
    la = np.linspace(-8.0, 1.0, 256)
    pack = jnp.asarray(fit_inverse_growth(la, la))

    step = build_fmax_step(decomp)
    Fmax, Rmax, d_avg, d_var = step(kden, Fmax, Rmax, jnp.float32(2.0),
                                    jnp.int32(0), pack)
    disp = build_displacement_step(decomp)(kden, jnp.float32(1.0))
    return Fmax, Rmax, disp
