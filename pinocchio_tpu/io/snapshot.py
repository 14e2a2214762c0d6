"""Gadget-2 format-2 snapshot writers.

Byte-compatible with the reference's write_snapshot.c: format-2 blocks
(8-byte name record [4-char label + next-record size+8] followed by the
payload record), a 256-byte HEAD, and a trailing INFO block describing each
payload (write_snapshot.c:55-128, 400-506, 999-1024).

Three products, as in the reference:
  - LPT snapshot (mode 3): ID, POS, VEL — LPT initial conditions at the
    first output redshift (write_LPT_snapshot, write_snapshot.c:138-204)
  - timeless snapshot: ID, FMAX, VEL/VEL2/VL31/VL32, ZACC, GRUP
    (write_timeless_snapshot, write_snapshot.c:207-342)
  - density (mode 2): ID, DENS (write_density, write_snapshot.c:344-397)
"""

from __future__ import annotations

import os
from typing import List, Tuple

import numpy as np

from ..config import Params
from ..cosmology import Cosmology

HEADER_DTYPE = np.dtype([
    ("NPart", "<u4", 6), ("Mass", "<f8", 6), ("Time", "<f8"),
    ("RedShift", "<f8"), ("flag_sfr", "<i4"), ("flag_feedback", "<i4"),
    ("NPartTotal", "<u4", 6), ("flag_cooling", "<i4"),
    ("num_files", "<i4"), ("BoxSize", "<f8"), ("Omega0", "<f8"),
    ("OmegaLambda", "<f8"), ("HubbleParam", "<f8"),
    ("flag_stellarage", "<i4"), ("flag_metals", "<i4"),
    ("npartTotalHighWord", "<u4", 6), ("flag_entropy_instead_u", "<i4"),
    ("flag_metalcooling", "<i4"), ("flag_stellarevolution", "<i4"),
    ("fill", "S52")])
assert HEADER_DTYPE.itemsize == 256

INFO_ENTRY = np.dtype([("name", "S4"), ("type", "S8"), ("ndim", "<i4"),
                       ("active", "<i4", 6)])


def _write_block_name(fd, label: str, payload_bytes: int):
    # format-2 block marker (WriteBlockName, write_snapshot.c:999-1024)
    np.array([8], "<u4").tofile(fd)
    fd.write(label.encode("ascii")[:4].ljust(4))
    np.array([payload_bytes + 8], "<u4").tofile(fd)
    np.array([8], "<u4").tofile(fd)


def _write_block(fd, label: str, arr: np.ndarray):
    _write_block_name(fd, label, arr.nbytes)
    np.array([arr.nbytes], "<u4").tofile(fd)
    arr.tofile(fd)
    np.array([arr.nbytes], "<u4").tofile(fd)


def _header(params: Params, n: int, z: float) -> np.ndarray:
    h = np.zeros(1, HEADER_DTYPE)
    h["NPart"][0, 1] = n
    h["Mass"][0, 1] = params.ParticleMass * params.Hubble100 * 1e-10
    h["NPartTotal"][0, 1] = n & 0xFFFFFFFF
    h["npartTotalHighWord"][0, 1] = n >> 32
    h["Time"] = 1.0 / (1.0 + z)
    h["RedShift"] = z
    h["num_files"] = 1
    h["BoxSize"] = params.BoxSize_h100
    h["Omega0"] = params.Omega0
    h["OmegaLambda"] = params.OmegaLambda
    h["HubbleParam"] = params.Hubble100
    return h


def _write_snapshot(path, params: Params, z: float,
                    blocks: List[Tuple[str, str, int, np.ndarray]]):
    """blocks: (label, info type string, ndim, data array)."""
    n = len(blocks[0][3])
    with open(path, "wb") as fd:
        _write_block(fd, "HEAD", _header(params, n, z))
        info = np.zeros(len(blocks) + 1, INFO_ENTRY)
        info[0] = (b"HEAD", b"HEADER  ", 0, [0, 1, 0, 0, 0, 0])
        for i, (label, typ, ndim, data) in enumerate(blocks):
            _write_block(fd, label, data)
            info[i + 1] = (label.encode().ljust(4), typ.encode().ljust(8),
                           ndim, [0, 1, 0, 0, 0, 0])
        _write_block(fd, "INFO", info)
    return path


def _particle_ids(N: int) -> np.ndarray:
    # LONGIDS is always on (README): 64-bit IDs, INFO type LLONG
    # (initialize_ID, write_snapshot.c:547-560)
    return np.arange(1, N ** 3 + 1, dtype=np.uint64)


def write_lpt_snapshot(params: Params, cosmo: Cosmology, fmax_result,
                       directory=".") -> str:
    """LPT initial conditions at the first output redshift
    (special mode 3, pinocchio.c:171-212)."""
    N = params.GridSize
    z = params.output_z[0]
    vel = {k: np.asarray(v).reshape(3, -1)
           for k, v in fmax_result.products.vel.items()}
    disp = vel["v1"].copy()
    for k in ("v2", "v31", "v32"):
        if k in vel:
            disp += vel[k]

    q = np.indices((N, N, N), dtype=np.float32).reshape(3, -1) + 0.5
    pos = np.mod(q + disp, N) * np.float32(params.InterPartDist
                                           * params.Hubble100)

    # Gadget velocity: peculiar velocity / sqrt(a)
    # (initialize_VEL, write_snapshot.c:977-997)
    vfact = (cosmo.Hubble(z) / (1.0 + z) * params.InterPartDist
             * (1.0 + z) * cosmo.fomega(z, params.k_for_GM)
             / np.sqrt(1.0 + z))
    v = disp * np.float32(vfact)

    path = os.path.join(
        directory, f"pinocchio.{z:6.4f}.{params.RunFlag}.LPT_snapshot.out")
    return _write_snapshot(path, params, z, [
        ("ID  ", "LLONG   ", 1, _particle_ids(N)),
        ("POS ", "FLOATN  ", 3,
         np.ascontiguousarray(pos.T, np.float32)),
        ("VEL ", "FLOATN  ", 3, np.ascontiguousarray(v.T, np.float32))])


def write_density_snapshot(params: Params, density: np.ndarray,
                           directory=".") -> str:
    """Linear density field (special mode 2, write_density)."""
    N = params.GridSize
    path = os.path.join(directory, f"pinocchio.{params.RunFlag}.density0.out")
    return _write_snapshot(path, params, params.output_z[-1], [
        ("ID  ", "LLONG   ", 1, _particle_ids(N)),
        ("DENS", "FLOAT   ", 1,
         np.ascontiguousarray(density.ravel(), np.float32))])


def write_timeless_snapshot(params: Params, fmax_result, frag_result,
                            directory=".") -> str:
    """Timeless snapshot: per-particle fmax products + accretion redshift +
    group membership (write_timeless_snapshot, write_snapshot.c:207-342).

    GRUP carries the GLOBAL group name (peak particle ID) per particle
    with 0 = uncollapsed / not in a group and 1 = filament, following the
    reference (build_groups.c:968-973) — but as 64-bit LLONG because
    LONGIDS is always on here (the reference truncates names to int).
    An RMAX block (the smoothing-radius index where Fmax was attained) is
    added when params.add_rmax_to_snapshot (-DADD_RMAX_TO_SNAPSHOT).

    Refuses to write when the fragmentation result carries no per-particle
    products (e.g. a multibox merge run without WriteTimelessSnapshot):
    silently writing ZACC=-1/GRUP=0 would corrupt downstream analysis.
    """
    N = params.GridSize
    if frag_result is None or frag_result.particle_pos is None:
        raise ValueError(
            "timeless snapshot requested but the fragmentation result "
            "carries no per-particle products; run with "
            "WriteTimelessSnapshot=True so the sweep keeps zacc/group "
            "per particle")
    if frag_result.particle_grup is None:
        raise ValueError(
            "timeless snapshot: particle group names absent (the run was "
            "fragmented without WriteTimelessSnapshot=True)")
    F = np.asarray(fmax_result.products.Fmax).ravel()
    vel = {k: np.ascontiguousarray(np.asarray(v).reshape(3, -1).T,
                                   np.float32)
           for k, v in fmax_result.products.vel.items()}
    rmax = (np.asarray(fmax_result.products.Rmax).ravel()
            .astype(np.int32) if params.add_rmax_to_snapshot else None)

    # scatter the sweep's zacc / group name back to grid order
    # (single-box particle_pos is already the global cell index; the
    # multibox merge re-expressed positions globally, _merge_back)
    zacc = np.full(N ** 3, -1.0, np.float32)
    grup = np.zeros(N ** 3, np.uint64)
    pos = frag_result.particle_pos
    zacc[pos] = frag_result.particle_zacc
    grup[pos] = frag_result.particle_grup
    return _timeless_write(params, F, vel, rmax, zacc, grup, directory)


def _timeless_write(params: Params, F, vel, rmax, zacc, grup,
                    directory) -> str:
    """Assemble + write the timeless snapshot blocks from full-grid
    arrays (shared by the single-host writer and the chunk merger so
    the merged multi-host file is byte-identical)."""
    N = params.GridSize
    blocks = [("ID  ", "LLONG   ", 1, _particle_ids(N))]
    if params.add_rmax_to_snapshot:
        # initialize_RMAX (write_snapshot.c:830-852)
        blocks.append(("RMAX", "LONG    ", 1, rmax))
    blocks += [("FMAX", "FLOAT   ", 1, F.astype(np.float32)),
               ("VEL ", "FLOATN  ", 3, vel["v1"])]
    if "v2" in vel:
        blocks.append(("VEL2", "FLOATN  ", 3, vel["v2"]))
    if "v31" in vel:
        blocks.append(("VL31", "FLOATN  ", 3, vel["v31"]))
        blocks.append(("VL32", "FLOATN  ", 3, vel["v32"]))
    blocks.append(("ZACC", "FLOAT   ", 1, zacc))
    blocks.append(("GRUP", "LLONG   ", 1, grup))

    path = os.path.join(directory,
                        f"pinocchio.{params.RunFlag}.t_snapshot.out")
    return _write_snapshot(path, params, params.zlast, blocks)


def write_timeless_chunk(params: Params, fmax_result, frag_result,
                         directory=".", host_id: int = 0,
                         device_filter=None) -> str:
    """One host's share of the timeless snapshot as an npz chunk
    (the collector scheme of write_snapshot.c:400-506 without MPI:
    hosts share the output filesystem and scripts/merge_chunks.py
    assembles the canonical Gadget file).

    Dense products: this host's addressable SHARDS of the mesh-sharded
    Fmax/Rmax/vel arrays (each stored with its global start indices).
    Per-particle products: this host's sub-boxes' zacc/grup in global
    cell order (fragment.subbox._merge_back).  device_filter overrides
    the process-ownership test (mocked single-process clusters)."""
    import jax
    if frag_result is None or frag_result.particle_pos is None:
        raise ValueError(
            "timeless snapshot requested but the fragmentation result "
            "carries no per-particle products; run with "
            "WriteTimelessSnapshot=True")
    if device_filter is None:
        pi = jax.process_index()

        def device_filter(d):
            return d.process_index == pi

    arrays = dict(pos=np.asarray(frag_result.particle_pos),
                  zacc=np.asarray(frag_result.particle_zacc),
                  grup=np.asarray(frag_result.particle_grup))
    prods = {"F": fmax_result.products.Fmax}
    for k, v in fmax_result.products.vel.items():
        prods[f"vel_{k}"] = v
    if params.add_rmax_to_snapshot:
        prods["rmax"] = fmax_result.products.Rmax
    for name, arr in prods.items():
        if arr is None:
            continue
        if isinstance(arr, np.ndarray):
            # host-resident dense array: whole-grid share on host 0
            if host_id == 0:
                arrays[f"{name}_0_data"] = arr
                arrays[f"{name}_0_start"] = np.zeros(arr.ndim, np.int64)
            continue
        i = 0
        for sh in arr.addressable_shards:
            if not device_filter(sh.device):
                continue
            starts = [0 if sl.start is None else int(sl.start)
                      for sl in sh.index]
            arrays[f"{name}_{i}_data"] = np.asarray(sh.data)
            arrays[f"{name}_{i}_start"] = np.asarray(starts, np.int64)
            i += 1
    path = os.path.join(
        directory, f"pinocchio.{params.RunFlag}.t_snapshot.out"
                   f".{host_id}.npz")
    tmp = path + ".tmp"
    with open(tmp, "wb") as fd:
        np.savez(fd, **arrays)
    os.replace(tmp, path)
    return path


def merge_timeless_chunks(params: Params, directory=".",
                          keep: bool = False):
    """Assemble per-host t_snapshot chunks into the canonical Gadget
    file — byte-identical to a single-host write_timeless_snapshot
    (the collector gather of write_snapshot.c:400-506).  Returns the
    path, or None when no chunks are present."""
    import glob
    import re
    chunks = sorted(
        glob.glob(os.path.join(
            directory,
            f"pinocchio.{params.RunFlag}.t_snapshot.out.*.npz")),
        key=lambda p: int(re.search(r"\.out\.(\d+)\.npz$", p).group(1)))
    if not chunks:
        return None
    N = params.GridSize
    F = np.zeros((N, N, N), np.float32)
    vel: dict = {}
    rmax = (np.zeros((N, N, N), np.int32)
            if params.add_rmax_to_snapshot else None)
    zacc = np.full(N ** 3, -1.0, np.float32)
    grup = np.zeros(N ** 3, np.uint64)
    shard_pat = re.compile(r"^(F|rmax|vel_(\w+))_(\d+)_data$")
    for path in chunks:
        with np.load(path) as d:
            pos = d["pos"]
            zacc[pos] = d["zacc"]
            grup[pos] = d["grup"]
            for key in d.files:
                m = shard_pat.match(key)
                if not m:
                    continue
                data = d[key]
                start = d[key[:-4] + "start"]
                sl = tuple(slice(int(s), int(s) + n)
                           for s, n in zip(start, data.shape))
                if m.group(1) == "F":
                    F[sl[-3:]] = data.reshape(data.shape[-3:])
                elif m.group(1) == "rmax":
                    rmax[sl[-3:]] = data.reshape(data.shape[-3:])
                else:
                    k = m.group(2)
                    if k not in vel:
                        vel[k] = np.zeros((3, N, N, N), np.float32)
                    vel[k][sl] = data
    vel_rows = {k: np.ascontiguousarray(v.reshape(3, -1).T, np.float32)
                for k, v in vel.items()}
    out = _timeless_write(params, F.ravel(), vel_rows,
                          rmax.ravel() if rmax is not None else None,
                          zacc, grup, directory)
    if not keep:
        for c in chunks:
            os.remove(c)
    return out


def read_snapshot(path: str):
    """Reader for the format-2 snapshots written above (and by the
    reference): returns {label: raw bytes array}, plus the parsed header."""
    blocks = {}
    with open(path, "rb") as fd:
        while True:
            m = np.fromfile(fd, "<u4", 1)
            if len(m) == 0:
                break
            label = fd.read(4).decode("ascii")
            np.fromfile(fd, "<u4", 2)      # next-size, closing marker
            size = int(np.fromfile(fd, "<u4", 1)[0])
            payload = fd.read(size)
            np.fromfile(fd, "<u4", 1)
            blocks[label] = payload
    header = np.frombuffer(blocks["HEAD"], HEADER_DTYPE)[0] \
        if "HEAD" in blocks else None
    return header, blocks
