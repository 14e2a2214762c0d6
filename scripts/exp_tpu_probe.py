#!/usr/bin/env python
"""Probe the tunneled TPU backend: d2h/h2d link bandwidth, dispatch
latency, and usable HBM headroom.  Informs the 1024^3 staged-fmax design
(VERDICT r2 item 1): whether Fmax can live on host (streamed combine) or
must stay resident, and how much of the 16 GB is really allocatable.

Run: timeout 1800 python scripts/exp_tpu_probe.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pinocchio_tpu.backend import setup

setup()

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
dev = jax.devices()[0]
print("device:", dev, flush=True)

# ---- warmup: first real sync pays the one-time ~300s backend cost ----
t0 = time.perf_counter()
x = jax.jit(lambda k: jax.random.normal(k, (1024, 1024)))(
    jax.random.PRNGKey(0))
np.asarray(x)
print(f"warmup sync: {time.perf_counter() - t0:.1f}s", flush=True)

res = {}

# ---- dispatch latency: tiny jitted op, synced by transfer ----
f = jax.jit(lambda a: a + 1.0)
small = jnp.zeros((8, 128), jnp.float32)
np.asarray(f(small))
ts = []
for _ in range(10):
    t0 = time.perf_counter()
    np.asarray(f(small))
    ts.append(time.perf_counter() - t0)
res["dispatch_plus_tiny_d2h_ms"] = round(1e3 * float(np.median(ts)), 1)
print("dispatch+tiny d2h ms:", res["dispatch_plus_tiny_d2h_ms"], flush=True)

# ---- d2h bandwidth at several sizes / dtypes ----
def d2h_bw(nbytes, dtype):
    n = nbytes // np.dtype(dtype).itemsize
    a = jax.jit(lambda: jnp.ones((n,), dtype))()
    np.asarray(a[:8])            # ensure materialized
    t0 = time.perf_counter()
    h = np.asarray(a)
    dt = time.perf_counter() - t0
    del a, h
    return nbytes / dt / 1e6

for mb in (64, 256, 1024):
    for dt_ in ("float32", "float16"):
        bw = d2h_bw(mb * 2**20, dt_)
        res[f"d2h_MBps_{mb}MB_{dt_}"] = round(bw, 1)
        print(f"d2h {mb}MB {dt_}: {bw:.0f} MB/s", flush=True)

# ---- parallel d2h: do 3 concurrent transfers go faster? ----
from concurrent.futures import ThreadPoolExecutor
n = 256 * 2**20 // 4
arrs = [jax.jit(lambda i=i: jnp.full((n,), float(i), jnp.float32))()
        for i in range(3)]
for a in arrs:
    np.asarray(a[:8])
ex = ThreadPoolExecutor(max_workers=3)
t0 = time.perf_counter()
futs = [ex.submit(np.asarray, a) for a in arrs]
[f_.result() for f_ in futs]
dt = time.perf_counter() - t0
res["d2h_MBps_3par_768MB"] = round(3 * 256 * 2**20 / dt / 1e6, 1)
print("d2h 3-parallel 768MB:", res["d2h_MBps_3par_768MB"], "MB/s", flush=True)
del arrs

# ---- h2d bandwidth ----
def h2d_bw(nbytes, dtype):
    n = nbytes // np.dtype(dtype).itemsize
    h = np.ones((n,), dtype)
    t0 = time.perf_counter()
    a = jax.device_put(h)
    np.asarray(a[:8])           # sync: ensure it landed
    dt = time.perf_counter() - t0
    del a
    return nbytes / dt / 1e6

for mb in (64, 256, 1024):
    bw = h2d_bw(mb * 2**20, "float32")
    res[f"h2d_MBps_{mb}MB_f32"] = round(bw, 1)
    print(f"h2d {mb}MB f32: {bw:.0f} MB/s", flush=True)

# ---- usable HBM: allocate 1 GB blocks until ResourceExhausted ----
blocks = []
gb = 0
try:
    for i in range(18):
        b = jax.jit(lambda i=i: jnp.full((2**28,), float(i), jnp.float32))()
        np.asarray(b[:8])
        blocks.append(b)
        gb += 1
        print(f"allocated {gb} GB", flush=True)
except Exception as e:  # noqa: BLE001
    print("alloc stopped:", type(e).__name__, str(e)[:200], flush=True)
res["usable_hbm_GB_1GB_blocks"] = gb
del blocks

print("RESULT " + json.dumps(res), flush=True)
