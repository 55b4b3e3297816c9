"""One-off stage profiler for the hires_96k_8ch config on the real TPU.

Replays bench.py's hires config through batch_encode/batch_decode with
coarse wall timers, then re-runs the decode stages by hand to attribute
time to parse / de-ecc / upload / core+fetch / host-convert.
"""
from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax

jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import frad_python_tpu  # noqa: F401
from frad_python_tpu import native

if not native.available():
    from frad_python_tpu.native import build as native_build
    native_build.build()
    native.reload()

from frad_python_tpu.parallel import batch_decode, batch_encode
from frad_python_tpu.parallel import pipeline
from frad_python_tpu.models import batch
from frad_python_tpu.ops import bitpack, packing

cfg = dict(profile=0, srate=96000, channels=8, bits=24, frame_size=8192)
seconds = 30.0

rng = np.random.default_rng(0)
t = np.arange(int(seconds * cfg["srate"])) / cfg["srate"]
sig = sum(0.3 / (i + 1) * np.sin(2 * np.pi * (220 * (i + 1)) * t[:, None] + i)
          for i in range(4)) * np.ones((1, cfg["channels"]))
pcm = sig + 0.01 * rng.standard_normal((len(t), cfg["channels"]))

print(f"backend={jax.default_backend()}", file=sys.stderr)

def stamp(label, t0):
    t1 = time.perf_counter()
    print(f"  {label}: {t1 - t0:.2f}s", file=sys.stderr)
    return t1

# ---- warm-up (compile) ----
t0 = time.perf_counter()
stream = batch_encode(pcm, cfg["profile"], cfg["srate"], cfg["bits"],
                      cfg["frame_size"], compute_dtype="float32", workers=4)
t0 = stamp("warm encode (compile)", t0)
out, _ = batch_decode(stream, compute_dtype="float32", i24_transfer=True)
t0 = stamp("warm decode (compile)", t0)

# ---- timed pass ----
t0 = time.perf_counter()
stream = batch_encode(pcm, cfg["profile"], cfg["srate"], cfg["bits"],
                      cfg["frame_size"], compute_dtype="float32", workers=4)
t0 = stamp("encode pass", t0)
out, _ = batch_decode(stream, compute_dtype="float32", i24_transfer=True)
t0 = stamp("decode pass", t0)

# ---- manual decode stage attribution ----
t0 = time.perf_counter()
headers, payloads, tailb = pipeline._parse_frames(stream)
t0 = stamp("parse", t0)
h0 = headers[0]
run = len(headers)
n, ch = h0.fsize, h0.channels
bits = packing.DEPTHS[h0.bit_depth_index]
print(f"  run={run} n={n} ch={ch} bits={bits} payload={len(payloads[0])}B",
      file=sys.stderr)

sizes = {len(p) for p in payloads}
print(f"  uniform sizes: {sizes == {n * ch * bits // 8} }", file=sys.stderr)

wdt = "<u4"
joined = b"".join(payloads)
t0 = stamp("join payloads", t0)
words = np.frombuffer(joined, dtype=wdt).reshape(run, -1)
t0 = stamp("frombuffer", t0)

w24_d = batch.p0_unpack_decode_i24_core(words, bits, h0.endian, n, ch)
w24_d.block_until_ready()
t0 = stamp("h2d + core (block)", t0)

w24 = pipeline._fetch(w24_d)
t0 = stamp("d2h fetch", t0)

frames = bitpack.i24_words_to_pcm(w24).reshape(run, n, ch)
t0 = stamp("host i24->f64", t0)

# second repetition to check steady-state
t0 = time.perf_counter()
w24_d = batch.p0_unpack_decode_i24_core(words, bits, h0.endian, n, ch)
w24_d.block_until_ready()
t0 = stamp("h2d + core (2nd)", t0)
w24 = pipeline._fetch(w24_d)
t0 = stamp("d2h fetch (2nd)", t0)

m = min(len(out), len(pcm))
err = out[:m] - pcm[:m]
snr = float(10 * np.log10(np.sum(pcm[:m] ** 2) / max(np.sum(err ** 2), 1e-300)))
print(f"  snr={snr:.1f} dB  stream={len(stream)/1e6:.1f} MB", file=sys.stderr)
