"""Native (C) runtime components, compiled on demand.

The hot sequential piece of the pipeline — the fragmentation sweep — is C
(like the reference's build_groups.c); everything batch-parallel lives in
JAX/XLA.  The shared library is built with the system compiler on first use
and cached next to the source.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}

_CFLAGS = ["-O3", "-march=native", "-fPIC", "-shared", "-std=c11",
           "-fno-math-errno"]


def _build(name: str) -> str:
    src = os.path.join(_HERE, name + ".c")
    lib = os.path.join(_HERE, "lib" + name + ".so")
    if (not os.path.exists(lib)
            or os.path.getmtime(lib) < os.path.getmtime(src)):
        cmd = ["cc"] + _CFLAGS + ["-o", lib, src, "-lm"]
        res = subprocess.run(cmd, capture_output=True, text=True)
        if res.returncode != 0:
            raise RuntimeError(
                f"failed to build {name}: {res.stderr}\n{' '.join(cmd)}")
    return lib


def load(name: str) -> ctypes.CDLL:
    with _LOCK:
        if name not in _LIBS:
            _LIBS[name] = ctypes.CDLL(_build(name))
        return _LIBS[name]
