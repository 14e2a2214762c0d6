"""Readers for pinocchio output files.

Python-side equivalent of scripts/ReadPinocchio5.py: parses the
fortran-unformatted binary catalogs / PLC / histories written both by this
framework and by the reference (the record layouts are identical by
construction), and the ascii variants.
"""

from __future__ import annotations

import numpy as np

from .catalogs import CATALOG_DTYPE, HISTORIES_DTYPE

PLC_DTYPE = np.dtype([("name", "<u8"), ("red", "<f4"), ("x", "<f4"),
                      ("y", "<f4"), ("z", "<f4"), ("vx", "<f4"),
                      ("vy", "<f4"), ("vz", "<f4"), ("Mass", "<f4"),
                      ("theta", "<f4"), ("phi", "<f4"), ("v_los", "<f4"),
                      ("obsz", "<f4")])


def _read_record(fd, dtype=np.uint8):
    m = np.fromfile(fd, "<i4", 1)
    if len(m) == 0:
        return None
    n = int(m[0])
    data = np.fromfile(fd, dtype, n // np.dtype(dtype).itemsize)
    np.fromfile(fd, "<i4", 1)
    return data


def read_catalog(path: str) -> np.ndarray:
    """Halo catalog -> structured array (catalog or ascii layout)."""
    if _is_ascii(path):
        raw = np.loadtxt(path)
        rec = np.zeros(len(raw), CATALOG_DTYPE)
        rec["name"] = raw[:, 0].astype(np.uint64)
        rec["M"] = raw[:, 1]
        rec["q"] = raw[:, 2:5]
        rec["x"] = raw[:, 5:8]
        rec["v"] = raw[:, 8:11]
        if raw.shape[1] > 11:
            rec["n"] = raw[:, 11].astype(np.int32)
        return rec
    out = []
    with open(path, "rb") as fd:
        hdr = _read_record(fd, "<i4")           # [NTasksPerFile, itemsize]
        assert hdr is not None and hdr[1] == CATALOG_DTYPE.itemsize, \
            f"unexpected catalog record size {hdr}"
        while True:
            ngood = _read_record(fd, "<i4")
            if ngood is None:
                break
            if ngood[0]:
                out.append(_read_record(fd, CATALOG_DTYPE))
    return np.concatenate(out) if out else np.zeros(0, CATALOG_DTYPE)


def read_histories(path: str):
    """Merger histories -> (ntrees, list of per-tree structured arrays)."""
    if _is_ascii(path):
        trees = []
        with open(path) as fd:
            lines = [ln for ln in fd]
        i = 0
        while i < len(lines) and not lines[i].startswith("#Tree"):
            i += 1
        cur = []
        for ln in lines[i:]:
            if ln.startswith("#Tree"):
                if cur:
                    trees.append(np.array(cur, HISTORIES_DTYPE))
                cur = []
            else:
                t = ln.split()
                if len(t) == 9:
                    cur.append((int(t[0]), int(t[1]), int(t[2]), int(t[3]),
                                int(t[4]), int(t[5]), float(t[6]),
                                float(t[7]), float(t[8])))
        if cur:
            trees.append(np.array(cur, HISTORIES_DTYPE))
        return len(trees), trees
    with open(path, "rb") as fd:
        _read_record(fd, "<i4")                 # itemsize
        hdr = _read_record(fd, "<i4")           # [ntrees, nbranch]
        ntrees = int(hdr[0])
        per_tree = _read_record(fd, "<i4")
        branches = _read_record(fd, HISTORIES_DTYPE)
    trees = []
    off = 0
    for nb in per_tree:
        trees.append(branches[off:off + nb])
        off += nb
    return ntrees, trees


def read_plc(path: str) -> np.ndarray:
    if _is_ascii(path):
        raw = np.loadtxt(path)
        rec = np.zeros(len(raw), PLC_DTYPE)
        cols = ["name", "red", "x", "y", "z", "vx", "vy", "vz", "Mass",
                "theta", "phi", "v_los", "obsz"]
        for i, c in enumerate(cols):
            rec[c] = raw[:, i]
        return rec
    with open(path, "rb") as fd:
        _read_record(fd, "<i4")
        out = []
        while True:
            n = _read_record(fd, "<i4")
            if n is None:
                break
            out.append(_read_record(fd, PLC_DTYPE))
    return np.concatenate(out) if out else np.zeros(0, PLC_DTYPE)


def read_mf(path: str) -> np.ndarray:
    return np.loadtxt(path)


def _is_ascii(path: str) -> bool:
    with open(path, "rb") as fd:
        head = fd.read(64)
    try:
        head.decode("ascii")
        return head.lstrip().startswith(b"#")
    except UnicodeDecodeError:
        return False
