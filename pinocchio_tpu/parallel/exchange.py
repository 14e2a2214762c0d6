"""Cross-chip / cross-host product redistribution: a packed sparse
all_to_all over the device mesh.

TPU-native analog of the reference's hypercube point-to-point exchange
(distribute.c:58-175): after the fmax stage the per-particle products live
in the FFT domain decomposition (x- or xy-sharded over the mesh), but
fragmentation sub-boxes are assigned to hosts (parallel/multihost.py), and
a sub-box's padded volume (boundary layers included) generally spans
shards owned by OTHER hosts.  Instead of point-to-point MPI sends, one
jitted shard_map program per exchange:

  1. each shard selects its needed particles (Fmax >= Flast — the V5
     needed-particle cut, distribute.c:670-698) that fall inside any
     destination host's sub-box regions;
  2. packs them (global coordinates + Fmax + displacement rows, optionally
     float16 on the wire) into fixed-capacity per-destination-device
     buffers, load-balanced round-robin over the destination host's
     devices;
  3. routes everything with `jax.lax.all_to_all` — one tiled collective on
     a slab mesh, two subgroup collectives (rows then columns) on a pencil
     mesh — riding ICI within a slice and DCN across hosts;
  4. each host then materializes ONLY its own devices' post-exchange
     shards (addressable on that host by construction) into the same
     SparseProducts structure the rest of the fragmentation stack
     consumes.

The buffer capacity is measured by a tiny replicated counting program
first (one scalar crosses the link), then bucketed so the packing program
recompiles at most a handful of times per grid.

A cell needed by two hosts is sent to both (the reference's belongs_to_Q
multi-destination case, distribute.c:280-307); within one host it is sent
exactly once, because membership is OR-reduced over that host's sub-boxes
before packing.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from . import pfft


def build_host_regions(geoms, nhosts: int, N: int) -> Tuple:
    """Per-host union-of-boxes selection regions from the sub-box
    geometries: host h owns geoms[h::nhosts] (multihost.host_subboxes) and
    needs each one's FULL padded volume [stabl, stabl+Lgwbl) per dim,
    wrapped mod N (initialization.c:1011-1057 geometry)."""
    regions = []
    for h in range(nhosts):
        boxes = []
        for g in geoms[h::nhosts]:
            boxes.append(tuple((int(g.stabl[d]) % N, int(g.L[d]))
                               for d in range(3)))
        regions.append(tuple(boxes))
    return tuple(regions)


def host_of_device_default(mesh: Mesh, nhosts: int):
    """Flat-mesh-index -> host map.  On a real cluster this is the
    process index of each device; single-process tests mock an H-host
    cluster as contiguous blocks of the flat device order (the layout
    jax.distributed produces: each host's chips are consecutive)."""
    devs = list(mesh.devices.flat)
    p = len(devs)
    if any(d.process_index for d in devs):
        return tuple(d.process_index for d in devs)
    dph = p // nhosts
    assert dph * nhosts == p, "nhosts must divide the mesh size"
    return tuple(i // dph for i in range(p))


def _member(boxes, gx, gy, gz, N):
    """[nx,ny,nz] bool: cell inside any of the host's wrapped boxes."""
    m = None
    for (x0, lx), (y0, ly), (z0, lz) in boxes:
        bm = (((gx - x0) % N < lx)[:, None, None]
              & ((gy - y0) % N < ly)[None, :, None]
              & ((gz - z0) % N < lz)[None, None, :])
        m = bm if m is None else (m | bm)
    if m is None:
        m = jnp.zeros((gx.shape[0], gy.shape[0], gz.shape[0]), bool)
    return m


def _shard_coords(decomp, N):
    """Global coordinate vectors for this shard's block."""
    if isinstance(decomp, pfft.PencilDecomp):
        a = jax.lax.axis_index(pfft.AXA)
        b = jax.lax.axis_index(pfft.AXB)
        nx, ny = N // decomp.pa, N // decomp.pb
        gx = a * nx + jnp.arange(nx, dtype=jnp.int32)
        gy = b * ny + jnp.arange(ny, dtype=jnp.int32)
    else:
        me = jax.lax.axis_index(pfft.AX)
        nx = N // decomp.p
        gx = me * nx + jnp.arange(nx, dtype=jnp.int32)
        gy = jnp.arange(N, dtype=jnp.int32)
    gz = jnp.arange(N, dtype=jnp.int32)
    return gx, gy, gz


def _route(decomp, buf):
    """Tiled all_to_all(s): buf leading dim indexes the destination's
    flat mesh position; afterwards it indexes the SOURCE's."""
    if isinstance(decomp, pfft.PencilDecomp):
        pa, pb = decomp.pa, decomp.pb
        buf = buf.reshape((pa, pb) + buf.shape[1:])
        buf = jax.lax.all_to_all(buf, pfft.AXA, split_axis=0,
                                 concat_axis=0, tiled=True)
        buf = jax.lax.all_to_all(buf, pfft.AXB, split_axis=1,
                                 concat_axis=1, tiled=True)
        return buf.reshape((pa * pb,) + buf.shape[2:])
    return jax.lax.all_to_all(buf, pfft.AX, split_axis=0,
                              concat_axis=0, tiled=True)


_CAP_BUCKETS = 16


def exchange_products(params, fmax_result, mesh: Mesh, geoms,
                      nhosts: int, host_of_device=None, f16: bool = None,
                      verbose: bool = False) -> Dict[int, "SparseProducts"]:
    """Run the exchange; return {host_id: SparseProducts} for every host
    whose post-exchange shards are addressable from this process (on a
    real cluster: exactly this host; in single-process tests: all).

    When fmax_result.vel_segments_dev is set (RECOMPUTE_DISPLACEMENTS on
    a deferred-segment distributed run), the per-segment displacement
    stacks are routed as additional row channels and come back in each
    host's SparseProducts.segments, aligned row-for-row with .vel."""
    import time

    from ..fmax import SparseProducts

    t0 = time.perf_counter()
    prods = fmax_result.products
    N = fmax_result.grid.N
    decomp = pfft.make_decomp(mesh, N)
    p = mesh.devices.size
    Flast = float(params.Flast)
    if f16 is None:
        f16 = bool(params.transfer_f16) if params.transfer_f16 is not None \
            else jax.default_backend() not in ("cpu",)
    regions = build_host_regions(geoms, nhosts, N)
    if host_of_device is None:
        host_of_device = host_of_device_default(mesh, nhosts)
    host_devs = tuple(
        tuple(i for i in range(p) if host_of_device[i] == h)
        for h in range(nhosts))
    assert all(host_devs), "every host needs at least one mesh device"
    keys = sorted(prods.vel)
    # row-table channels: the displacement stacks, plus one channel per
    # (segment, stack) when segments are still on device
    seg_dev = getattr(fmax_result, "vel_segments_dev", None)
    channels = [("v", k) for k in keys]
    tables = [prods.vel[k] for k in keys]
    if seg_dev:
        for s, vs in enumerate(seg_dev):
            if vs is None:
                continue               # segment 0 aliases the 'v' channels
            for k in sorted(vs):
                channels.append(("s", s, k))
                tables.append(vs[k])
    real_spec = decomp.real_spec
    vel_spec = P(None, *real_spec)

    # ---- 1. capacity: replicated max over (shard, host) of the count
    def count_local(F):
        gx, gy, gz = _shard_coords(decomp, N)
        needed = F >= Flast
        cs = [jnp.sum(needed & _member(bx, gx, gy, gz, N))
              for bx in regions]
        c = jnp.max(jnp.stack(cs))
        for ax in mesh.axis_names:
            c = jax.lax.pmax(c, ax)
        return c

    cmax = int(np.asarray(pfft.shard_map_fn(
        mesh, count_local, (real_spec,), P())(prods.Fmax)))
    # per-destination-device slot count, bucketed for program reuse
    dph_min = min(len(d) for d in host_devs)
    shard_cells = (N // decomp.pa) * (N // decomp.pb) * N \
        if isinstance(decomp, pfft.PencilDecomp) \
        else (N // decomp.p) * N * N
    step = max(1, shard_cells // (_CAP_BUCKETS * dph_min))
    c2 = max(1, -(-cmax // dph_min))
    c2 = min(shard_cells, -(-c2 // step) * step)

    # ---- 2. pack + route (one device program)
    wire = jnp.float16 if f16 else jnp.float32

    def pack_local(F, *vels):
        gx, gy, gz = _shard_coords(decomp, N)
        nx, ny, nz = gx.shape[0], gy.shape[0], gz.shape[0]
        needed = (F >= Flast).ravel()
        cap = p * c2
        bx = jnp.full((cap,), -1, jnp.int32)
        byz = jnp.zeros((cap,), jnp.int32)
        bF = jnp.zeros((cap,), wire)
        bV = [jnp.zeros((cap, 3), wire) for _ in channels]
        gxf = jnp.broadcast_to(gx[:, None, None], (nx, ny, nz)).ravel()
        gyzf = jnp.broadcast_to((gy[:, None] * N + gz[None, :])[None],
                                (nx, ny, nz)).ravel()
        Ff = F.ravel().astype(wire)
        vrows = [v.reshape(3, -1).T.astype(wire) for v in vels]
        for h, boxes in enumerate(regions):
            m = (_member(boxes, gx, gy, gz, N).ravel() & needed)
            i = jnp.cumsum(m.astype(jnp.int32)) - 1
            devs = jnp.asarray(host_devs[h], jnp.int32)
            pos = jnp.where(
                m, devs[i % len(host_devs[h])] * c2
                + i // len(host_devs[h]), cap)
            bx = bx.at[pos].set(gxf, mode="drop")
            byz = byz.at[pos].set(gyzf, mode="drop")
            bF = bF.at[pos].set(Ff, mode="drop")
            for j in range(len(channels)):
                bV[j] = bV[j].at[pos].set(vrows[j], mode="drop")
        out = [b.reshape(p, c2) for b in (bx, byz, bF)]
        out += [b.reshape(p, c2, 3) for b in bV]
        return tuple(_route(decomp, b) for b in out)

    lead = (mesh.axis_names[0] if len(mesh.axis_names) == 1
            else tuple(mesh.axis_names))
    out_specs = tuple([P(lead, None)] * 3
                      + [P(lead, None, None)] * len(channels))
    packed = pfft.shard_map_fn(
        mesh, pack_local, (real_spec,) + (vel_spec,) * len(channels),
        out_specs)(prods.Fmax, *tables)

    # ---- 3. per-host extraction from addressable shards
    dev_pos = {id(d): i for i, d in enumerate(mesh.devices.flat)}
    per_dev: Dict[int, list] = {}
    for qi, q in enumerate(packed):
        for sh in q.addressable_shards:
            per_dev.setdefault(dev_pos[id(sh.device)],
                               [None] * len(packed))[qi] = np.asarray(
                                   sh.data)

    out: Dict[int, SparseProducts] = {}
    for h in range(nhosts):
        ci_parts, F_parts = [], []
        v_parts = {c: [] for c in channels}
        got = False
        for d in host_devs[h]:
            if d not in per_dev:
                continue
            got = True
            bx, byz, bF = per_dev[d][0], per_dev[d][1], per_dev[d][2]
            valid = bx.ravel() >= 0
            if not valid.any():
                continue
            x = bx.ravel()[valid].astype(np.int64)
            yz = byz.ravel()[valid].astype(np.int64)
            ci_parts.append(x * N * N + yz)
            F_parts.append(bF.reshape(-1)[valid].astype(np.float32))
            for j, c in enumerate(channels):
                v_parts[c].append(
                    per_dev[d][3 + j].reshape(-1, 3)[valid]
                    .astype(np.float32))
        if not got:
            continue
        if ci_parts:
            ci = np.concatenate(ci_parts)
            order = np.argsort(ci, kind="stable")
            rows = {c: np.concatenate(v_parts[c])[order]
                    for c in channels}
        else:
            ci = np.zeros(0, np.int64)
            order = np.zeros(0, np.int64)
            rows = {c: np.zeros((0, 3), np.float32) for c in channels}
        segs = None
        if seg_dev:
            segs = [({k: rows[("v", k)] for k in keys} if vs is None
                     else {k: rows[("s", s2, k)] for k in sorted(vs)})
                    for s2, vs in enumerate(seg_dev)]
        out[h] = SparseProducts(
            N=N, ci=ci[order] if len(ci) else ci,
            F=(np.concatenate(F_parts)[order] if len(ci)
               else np.zeros(0, np.float32)),
            vel={k: rows[("v", k)] for k in keys},
            segments=segs)
    if verbose:
        tot = sum(len(s.ci) for s in out.values())
        print(f"  exchange: cap {c2}/dev-slot x {p} devices, "
              f"{tot} particle-copies delivered in "
              f"{time.perf_counter() - t0:.1f}s")
    return out
