#!/usr/bin/env python
"""Benchmark: fmax collapse throughput + end-to-end pipeline wall-clock.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline (BASELINE.md): the reference's implied collapse-kernel throughput,
~4.1e6 particle-radius solves/s on one CPU task (128^3 x 9 radii / 3.62 s,
HMF_Validation/log_RUN.txt).  vs_baseline is the speedup of this engine's
collapse phase (second derivatives + eigenvalue/ellipsoid solve, the same
work accounted in the reference's 'collapse times' + 'deriv' timers) on one
TPU chip.

Usage: python bench.py [--grid N] [--platform cpu|axon] [--full]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REF_SOLVES_PER_S = 4.1e6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=256)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--full", action="store_true",
                    help="also run fragmentation and report end-to-end")
    ap.add_argument("--repeat", type=int, default=3)
    args = ap.parse_args()

    from pinocchio_tpu.backend import setup
    setup(platform=args.platform)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from pinocchio_tpu.config import read_parameter_file
    from pinocchio_tpu.cosmology import Cosmology
    from pinocchio_tpu.fmax import Smoothing, fmax_loop, run_fmax
    from pinocchio_tpu.grids import Grid
    from pinocchio_tpu.ic import generate_kdensity
    from pinocchio_tpu.ops import collapse

    params = read_parameter_file(
        "/root/reference/HMF_Validation/parameter_file",
        norad=True, plc_enabled=False)
    params.GridSize = args.grid
    # scale the box with the grid to keep the same resolution as the
    # reference config (128 Mpc/h at 128^3)
    params.BoxSize = float(args.grid)

    cosmo = Cosmology(params)
    grid = Grid(N=args.grid, BoxSize=params.BoxSize_htrue)
    sm = Smoothing.build(params, cosmo)
    kden = generate_kdensity(grid, cosmo, params.RandomSeed)
    kden.block_until_ready()
    pack = collapse.make_inverse_growth_fit(cosmo)

    N = args.grid
    radii_grid = jnp.asarray(sm.radii / grid.CellSize, jnp.float32)
    import numpy as _np
    ig_packs = jnp.asarray(_np.tile(pack[None, :], (sm.n, 1)))

    def collapse_phase(kden):
        out = fmax_loop(kden, radii_grid, ig_packs, N, sm.n)
        # a device->host transfer is the only reliable sync on the
        # tunneled TPU backend (block_until_ready returns early there)
        np.asarray(out[3])
        return out

    # warm-up: compile + the backend's one-time first-execution cost
    collapse_phase(kden)

    best = 1e30
    for _ in range(args.repeat):
        t0 = time.perf_counter()
        collapse_phase(kden)
        best = min(best, time.perf_counter() - t0)

    solves = N ** 3 * sm.n
    rate = solves / best

    result = {
        "metric": f"Fmax particle-radius solves/s/chip ({N}^3 x {sm.n} "
                  f"radii, collapse phase wall-clock {best:.3f}s)",
        "value": round(rate / 1e6, 2),
        "unit": "Msolves/s",
        "vs_baseline": round(rate / REF_SOLVES_PER_S, 2),
    }

    if args.full:
        from pinocchio_tpu.run import run_pipeline
        params.subbox_tasks = min(os.cpu_count() or 1, 8)
        t0 = time.perf_counter()
        run_pipeline(params, verbose=False, write_outputs=False)
        result["end_to_end_s"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(result))


if __name__ == "__main__":
    main()
