"""Measure h2d upload cost for candidate P1/P0 transfer encodings.

The tunnel compresses host->device payloads (BASELINE.md: all-constant
arrays reach >1 GB/s while incompressible ones see ~17-40 MB/s), so the
EFFECTIVE h2d cost of a tensor depends on how compressible its bytes
are.  Candidates:

  pcm-i16        raw int16 audio (current encode upload)
  pcm-i16-delta  np.diff int16 (wraparound), device undoes with cumsum
  pcm-i16-planes delta + byte-plane split (hi plane ~all 0x00/0xFF)
  sym-f32        P1 quantised symbols as f32 (current decode upload)
  sym-i16        same symbols as int16 (mostly tiny ints / zeros)

Each timed min-of-3 with the pipeline's 8-way concurrent device_put.
"""
from __future__ import annotations

import pathlib
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))

import frad_python_tpu  # noqa: E402,F401
from frad_python_tpu import native  # noqa: E402

if not native.available():
    from frad_python_tpu.native import build as native_build
    native_build.build()
    native.reload()

from frad_python_tpu.models import batch  # noqa: E402
import bench  # noqa: E402

pool = ThreadPoolExecutor(max_workers=8)


def put_timed(arr: np.ndarray, parts: int = 8) -> float:
    bounds = [arr.shape[0] * i // parts for i in range(parts + 1)]

    def one() -> float:
        t0 = time.perf_counter()
        for c in pool.map(lambda i: jax.device_put(
                arr[bounds[i]:bounds[i + 1]]), range(parts)):
            c.block_until_ready()
        return time.perf_counter() - t0

    one()
    return min(one() for _ in range(3))


def report(name: str, arr: np.ndarray, raw_mb: float) -> None:
    dt = put_timed(arr)
    mb = arr.nbytes / (1 << 20)
    print(f"{name:16s} {mb:7.2f} MB  {dt:6.3f}s  {mb/dt:7.1f} MB/s wire "
          f"({raw_mb/dt:7.1f} MB/s effective)", file=sys.stderr)


def main() -> None:
    pcm = bench.make_audio(30.0, 44100, 2)
    i16 = np.clip(np.rint(pcm * 32768.0), -32768, 32767).astype(np.int16)
    raw_mb = i16.nbytes / (1 << 20)
    print(f"audio: {raw_mb:.2f} MB as i16", file=sys.stderr)

    report("pcm-i16", i16, raw_mb)
    delta = np.diff(i16, axis=0, prepend=i16[:1]).astype(np.int16)
    report("pcm-i16-delta", delta, raw_mb)
    u8 = delta.view(np.uint8).reshape(-1, 2)
    planes = np.concatenate([np.ascontiguousarray(u8[:, 0]),
                             np.ascontiguousarray(u8[:, 1])])
    report("pcm-i16-planes", planes, raw_mb)

    # P1 quantised symbols for the same audio (the decode upload)
    arr = pcm[: (len(pcm) // 2048) * 2048].reshape(-1, 2048, 2)
    fq, _tq = batch.p1_encode_core(arr.astype(np.float32), 44100, 0.5,
                                   float(1 << 15))
    sym = np.asarray(fq)
    raw_mb = sym.nbytes / (1 << 20)
    print(f"symbols: {raw_mb:.2f} MB as f32, max |q| = "
          f"{float(np.abs(sym).max()):.0f}, "
          f"{float((sym == 0).mean()) * 100:.0f}% zero", file=sys.stderr)
    report("sym-f32", sym, raw_mb)
    report("sym-i16", sym.astype(np.int16), raw_mb)
    s16 = sym.astype(np.int16)
    u8 = s16.reshape(-1).view(np.uint8).reshape(-1, 2)
    planes = np.concatenate([np.ascontiguousarray(u8[:, 0]),
                             np.ascontiguousarray(u8[:, 1])])
    report("sym-i16-planes", planes, raw_mb)


if __name__ == "__main__":
    main()
