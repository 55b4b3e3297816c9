"""Probe d2h effective bandwidth vs concurrency (parts) and chunk size.

Usage: python tools/d2h_parts_probe.py [MB]
Times `pipeline._fetch`-style concurrent slice fetches of one device
buffer for several `parts` values, min of 3 after one warm fetch each.
"""
from __future__ import annotations

import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

from frad_python_tpu.parallel import pipeline  # noqa: E402

mb = float(sys.argv[1]) if len(sys.argv) > 1 else 16.0
rows = int(mb * (1 << 20) // 4096)
host = np.random.default_rng(0).integers(
    0, 2**32, size=(rows, 1024), dtype=np.uint32)
dev = jax.device_put(host)
dev.block_until_ready()
print(f"buffer {dev.nbytes / 1e6:.1f} MB", file=sys.stderr)

for parts in (1, 4, 8, 12, 16, 24, 32):
    pipeline._fetch(dev, parts=parts)  # warm split program + transfer
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = pipeline._fetch(dev, parts=parts)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    assert out.shape == host.shape
    print(f"parts={parts:3d}: best {best:.3f}s -> "
          f"{dev.nbytes / best / 1e6:6.1f} MB/s  (all: "
          + ", ".join(f"{t:.3f}" for t in ts) + ")", file=sys.stderr)
