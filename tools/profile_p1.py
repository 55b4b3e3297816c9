"""Stage profiler for the p1_stereo_44k1 headline config on the real TPU."""
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
from frad_python_tpu.models import batch, profile1
from frad_python_tpu.container import ecc as ecc_mod

cfg = dict(profile=1, srate=44100, channels=2, bits=16, frame_size=2048)
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

kw = dict(loss_level=0.5, compute_dtype="float32", workers=4)
t0 = time.perf_counter()
stream = batch_encode(pcm, cfg["profile"], cfg["srate"], cfg["bits"],
                      cfg["frame_size"], **kw)
t0 = stamp("warm encode", t0)
out, _ = batch_decode(stream, compute_dtype="float32", i16_transfer=True)
t0 = stamp("warm decode", t0)

for p in range(3):
    t0 = time.perf_counter()
    stream = batch_encode(pcm, cfg["profile"], cfg["srate"], cfg["bits"],
                          cfg["frame_size"], **kw)
    t0 = stamp(f"encode pass {p}", t0)
    out, _ = batch_decode(stream, compute_dtype="float32", i16_transfer=True)
    t0 = stamp(f"decode pass {p}", t0)

# ---- manual decode attribution ----
headers, payloads, tailb = pipeline._parse_frames(stream)
h0 = headers[0]
run = 0
key0 = (h0.profile, h0.bit_depth_index, h0.channels, h0.srate, h0.fsize,
        h0.ecc, h0.overlap_ratio)
for h in headers:
    if (h.profile, h.bit_depth_index, h.channels, h.srate, h.fsize,
            h.ecc, h.overlap_ratio) != key0:
        break
    run += 1
n, ch = h0.fsize, h0.channels
print(f"  run={run}/{len(headers)} n={n} ch={ch} stream={len(stream)/1e6:.1f}MB",
      file=sys.stderr)

for rep in range(2):
    t0 = time.perf_counter()
    ps = payloads[:run]
    fqf, tqf, _, _ok = native.p1_unpack_batch(ps, n * ch, 27 * ch)
    fq = fqf.reshape(run, n, ch)
    tq = tqf.reshape(run, 27, ch)
    t0 = stamp(f"[{rep}] native unpack", t0)
    cut = n * (h0.overlap_ratio - 1) // h0.overlap_ratio
    olap = n - cut
    factor = profile1._scale_factor(profile1.DEPTHS[h0.bit_depth_index])
    out_d, frag_d = batch.p1_decode_oa_core(fq, tq, h0.srate, factor,
                                            olap, cut, True)
    out_d.block_until_ready()
    t0 = stamp(f"[{rep}] h2d+core", t0)
    out_h = pipeline._fetch(out_d)
    t0 = stamp(f"[{rep}] d2h fetch ({out_d.nbytes/1e6:.1f}MB)", t0)
    frag = np.asarray(frag_d, dtype=np.float64)
    t0 = stamp(f"[{rep}] frag fetch", t0)
    out_f = native.i16_to_f64(out_h).reshape(out_h.shape)
    t0 = stamp(f"[{rep}] i16->f64", t0)

# encode attribution
for rep in range(2):
    t0 = time.perf_counter()
    stream2 = batch_encode(pcm, cfg["profile"], cfg["srate"], cfg["bits"],
                           cfg["frame_size"], **kw)
    t0 = stamp(f"[{rep}] full encode", t0)
