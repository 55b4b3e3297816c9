"""Probe the device link: bandwidth vs concurrent-stream count.

Measures h2d and d2h for an ~8 MB incompressible payload split into
1..32 concurrent chunks, to pick the chunking policy in
parallel/pipeline.py (_spans/_fetch).
"""
from __future__ import annotations

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax
import jax.numpy as jnp

MB = 1 << 20
SIZE = 8 * MB
rng = np.random.default_rng(0)
host = rng.integers(0, 2**31, size=SIZE // 4, dtype=np.int32)

pool = ThreadPoolExecutor(max_workers=32)
dev = jnp.asarray(host)  # resident copy for d2h tests
dev.block_until_ready()


def h2d(parts: int) -> float:
    bounds = [len(host) * i // parts for i in range(parts + 1)]
    t0 = time.perf_counter()
    chunks = list(pool.map(
        lambda i: jax.device_put(host[bounds[i]:bounds[i + 1]]), range(parts)))
    for c in chunks:
        c.block_until_ready()
    return time.perf_counter() - t0


split_cache = {}


def d2h(parts: int) -> float:
    if parts not in split_cache:
        bounds = [len(host) * i // parts for i in range(parts + 1)]
        split_cache[parts] = jax.jit(lambda a: tuple(
            a[bounds[i]:bounds[i + 1]] for i in range(parts)))
    chunks = split_cache[parts](dev)
    for c in chunks:
        c.block_until_ready()
    t0 = time.perf_counter()
    for c in chunks:
        c.copy_to_host_async()
    outs = list(pool.map(np.asarray, chunks))
    dt = time.perf_counter() - t0
    assert sum(o.nbytes for o in outs) == SIZE
    return dt


for parts in (1, 2, 4, 8, 16, 32):
    # warm the split program AND one untimed h2d (first-transfer setup
    # cost would otherwise bias the small-parts h2d minima)
    d2h(parts)
    h2d(parts)
    h = min(h2d(parts) for _ in range(3))
    d = min(d2h(parts) for _ in range(3))
    print(f"parts={parts:3d}  h2d {SIZE/MB/h:7.1f} MB/s   d2h {SIZE/MB/d:7.1f} MB/s",
          file=sys.stderr)

# full-duplex: one h2d stream + one d2h stream simultaneously
def duplex() -> tuple[float, float]:
    t0 = time.perf_counter()
    fu = pool.submit(lambda: jax.device_put(host).block_until_ready())
    fd = pool.submit(lambda: np.asarray(dev))
    fu.result(); fd.result()
    return time.perf_counter() - t0

for _ in range(3):
    dt = duplex()
    print(f"duplex 8MB each way: {dt:.2f}s -> {2*SIZE/MB/dt:.1f} MB/s aggregate",
          file=sys.stderr)

# sequential reference
t0 = time.perf_counter()
jax.device_put(host).block_until_ready()
np.asarray(dev)
print(f"sequential: {time.perf_counter()-t0:.2f}s", file=sys.stderr)
