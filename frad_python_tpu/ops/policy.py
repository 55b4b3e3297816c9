"""Backend-aware compute-dtype policy.

The FrAD container stores up to 64-bit floats, so the CPU path computes
in float64 for maximum archival fidelity (and byte-exact batch-vs-stream
tests). TPUs have no native f64 (matmul is slowly emulated and f64
FFT/complex128 does not compile at all), so on a TPU backend every
transform defaults to float32 — which exceeds the precision of the
commonly used stream depths (<= 24-bit) and is the hardware-native
speed-of-light path.

Override with FRAD_TPU_COMPUTE_DTYPE=float64|float32.
"""

from __future__ import annotations

import functools
import os


@functools.lru_cache(maxsize=1)
def compute_dtype() -> str:
    env = os.environ.get("FRAD_TPU_COMPUTE_DTYPE")
    if env:
        return env
    import jax

    return "float32" if jax.default_backend() == "tpu" else "float64"


#: container depths >= this exceed f32 transform precision (f32 carries a
#: 24-bit mantissa; the 48/64-bit containers store 36/52 mantissa bits —
#: a truncated f64 keeps sign(1) + exponent(11) + 36 mantissa bits)
DEEP_BITS = 48


@functools.lru_cache(maxsize=1)
def lossy_matmul_precision():
    """MXU precision for the LOSSY (P1/P2) transform matmuls.

    The lossless profiles keep Precision.HIGHEST (the 24-bit container
    needs full-f32 transform accuracy). The lossy profiles' quality is
    set by psychoacoustic masking (~17 dB SNR at loss 0.5), orders of
    magnitude above any matmul rounding, so their DCT/IDCT can trade
    precision for MXU passes. Measured on the v5e (r5, chained-scan
    method, B=646 N=2048 stereo): encode core 1.50M f/s at HIGHEST ->
    2.04M at HIGH (-0.0002 dB SNR) -> 3.02M at DEFAULT (-0.008 dB
    SNR); decode core 1.06M -> 1.91M -> 2.54M f/s (-0.0003 dB at
    DEFAULT). bench additionally flags any config whose SNR lands
    >0.1 dB below the reference. DEFAULT (one bf16 MXU pass) is
    therefore the TPU default; f32 matmuls on CPU have no
    reduced-precision mode, so the setting is inert there and CPU
    streams are unchanged.

    Override with FRAD_TPU_LOSSY_PRECISION=default|high|highest
    (resolved once per process at first compile).
    """
    from jax import lax

    name = os.environ.get("FRAD_TPU_LOSSY_PRECISION", "").lower()
    table = {"default": lax.Precision.DEFAULT,
             "high": lax.Precision.HIGH,
             "highest": lax.Precision.HIGHEST}
    if name in table:
        return table[name]
    import jax

    return (lax.Precision.DEFAULT if jax.default_backend() == "tpu"
            else lax.Precision.HIGHEST)


def transform_dtype(bits: int) -> str:
    """Dtype for a LOSSLESS transform targeting a `bits`-deep container.

    Deep containers (48/64-bit) always get the f64 transform — archival
    exactness is the product contract at those depths (north star:
    bit-exact lossless; SURVEY §7 hard part (b)), so on a TPU backend the
    call site routes the program to the host CPU via `deep_device()`
    rather than accept f32 transform noise (~1e-7 relative, PARITY.md
    divergence 7). Depths <= 32 fit inside f32's mantissa and keep the
    backend-native dtype.
    """
    return "float64" if bits >= DEEP_BITS else compute_dtype()


#: Magnitude ceiling for the on-device archival route. XLA:TPU's
#: emulated f64 is built on f32 arithmetic and OVERFLOWS above f32's
#: ~3.4e38 range (verified on hardware: 1e39 inputs produce NaN
#: coefficients), so content whose magnitude approaches it must take
#: the host's real-f64 path. 1e30 sits astronomically above any real
#: audio (normalised PCM, coefficients < 1e6) and far below the
#: emulation's overflow with any frame size <= 2^20.
DEVICE_F64_SAFE_MAX = 1e30

#: Symmetric magnitude FLOOR for the on-device route. Measured on
#: hardware (v5e, r5, two independent draws at n=256): the emulation's
#: worst-element relative error is flat (~0.5-2e-12, cancellation-
#: dominated) for input magnitudes 1.0 down to 1e-18, degrades from
#: ~1e-20 (7e-12 .. 2.3e-10 depending on content — the f32 cross terms
#: fall into subnormal territory), is garbage by 1e-35 (rel err ~1e3),
#: and flushes every output to exactly zero at <=1e-40. Ultra-quiet
#: 48-bit archival frames therefore take the host's real-f64 path.
#: 1e-12 sits ~8 orders above the catastrophic zone, comfortably above
#: the onset, and astronomically below any real audio (24-bit dither
#: floor ~1e-8).
DEVICE_F64_SAFE_MIN = 1e-12


def _roundtrip_frame_bytes(n: int, ch: int = 2) -> int:
    """Bytes a 48-bit archival frame moves over the device link, both
    directions summed: full f64 coefficients out, f64 samples in (the
    container's 6-byte truncation runs on the host — the TPU X64
    rewrite has no f64<->u64 bitcast)."""
    return 2 * n * ch * 8


@functools.lru_cache(maxsize=1)
def _deep_device_route_wins() -> bool:
    """Measured once per process: does the on-device 48-bit archival
    route beat the host-CPU f64 FFT on THIS rig?

    The decision is link-shaped, not compute-shaped: the device route
    moves full f64 frames both ways, so its floor is the link
    bandwidth; the host route's floor is the host FFT. A PCIe-local
    chip (GB/s) makes the device route ~50x cheaper than the host FFT;
    a slow tunneled link inverts that (VERDICT r4 #2 measured 0.84x vs
    7.06x the reference for device vs host on the tunneled rig). The
    product probes instead of guessing:

    * host side: wall time of the f64 FFT DCT on a representative
      [16, 2048, 2] batch (the pack stage is common to both routes);
    * device side: wall time of a ~2 MB f64 round-trip (device_put +
      host fetch), run on a daemon thread with a timeout — a stalled
      link must not hang the pipeline, and a probe that cannot finish
      in time IS the answer (host wins).
    """
    import threading
    import time

    import numpy as np

    import jax

    n, ch, rows = 2048, 2, 16
    rng = np.random.default_rng(0)
    arr = rng.standard_normal((rows, n, ch))

    # host route probe: f64 FFT DCT wall on the CPU backend
    from .dct import dct2_forward
    with deep_device():
        jax.block_until_ready(dct2_forward(arr, axis=1))        # compile
        t0 = time.perf_counter()
        jax.block_until_ready(dct2_forward(arr, axis=1))
        host_s_per_frame = (time.perf_counter() - t0) / rows

    # device route probe: f64 round-trip bytes over the link
    box: list[float] = []

    def probe() -> None:
        dev = jax.device_put(arr)                               # h2d
        jax.block_until_ready(dev)
        np.asarray(dev)                                         # d2h (warm path)
        t0 = time.perf_counter()
        dev = jax.device_put(arr)
        jax.block_until_ready(dev)
        np.asarray(dev)
        box.append(time.perf_counter() - t0)

    timeout_s = max(10.0, 50.0 * rows * host_s_per_frame)
    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    if not box:
        return False          # link stalled past any useful rate: host wins
    dev_s_per_frame = box[0] / rows
    return dev_s_per_frame < host_s_per_frame


def deep_on_device(bits: int, n: int = 0, max_abs: float | None = None) -> bool:
    """True when a `bits`-deep archival transform of frame size `n`
    (content magnitude `max_abs` when known) should run ON the
    accelerator instead of the host CPU.

    The 48-bit container keeps 36 mantissa bits; XLA:TPU's emulated f64
    matmul measures ~6e-15 relative error (2^-47) — two orders below
    one ulp of the container (2^-37) — so the 48-bit DCT CAN run
    on-chip as an f64 matmul (the FFT formulation needs complex128,
    which TPU lacks — which is also why frames beyond the matmul matrix
    cap must stay on the host: the device would have to fall into the
    uncompilable FFT form). The 64-bit container stores the full f64
    mantissa, where matmul accumulation noise would land above the
    container's precision: it always stays on the host CPU FFT path.

    WHICH of the two valid 48-bit routes wins is measured, not assumed
    (`_deep_device_route_wins`, once per process): the device route's
    cost is the f64 link round-trip, the host route's is the CPU FFT —
    a PCIe-local chip picks the device, a slow tunneled link picks the
    host. Overrides: FRAD_TPU_DEEP_ON_HOST=1 forces the host route,
    FRAD_TPU_DEEP_ON_DEVICE=1 forces the device route (no probe).

    Content-magnitude guard: the emulation is built on f32 arithmetic,
    so frames whose max |x| exceeds DEVICE_F64_SAFE_MAX (overflow ->
    NaN, verified on hardware) or sits below DEVICE_F64_SAFE_MIN
    (subnormal flush) always take the host's real-f64 path — decided
    PER FRAME by every call site, batched or streaming.

    Note on bit-identity: the on-device stream may differ from the
    host-FFT stream in the rare coefficients that sit within transform
    noise (<= 2^-47 relative) of a 36-bit truncation boundary — an
    unavoidable property of ANY algorithm change at a truncating
    container, bounded by one ulp of the container.
    """
    if bits != 48:
        return False
    if os.environ.get("FRAD_TPU_DEEP_ON_HOST"):
        return False
    if n:
        from .dct import MATMUL_MAX_N

        if n > MATMUL_MAX_N:
            return False
    if max_abs is not None:
        if not (max_abs <= DEVICE_F64_SAFE_MAX):
            # beyond the f32-based emulation's range (NaN max_abs also
            # lands here): host real-f64 only
            return False
        if 0.0 < max_abs < DEVICE_F64_SAFE_MIN:
            return False
    import jax

    if jax.default_backend() != "tpu":
        return False
    if os.environ.get("FRAD_TPU_DEEP_ON_DEVICE"):
        return True
    return _deep_device_route_wins()


def deep_device():
    """Context manager placing jit execution on the CPU backend.

    Used around f64 transform calls when the default backend has no
    native f64 (TPU: f64 matmul is slowly emulated, f64 FFT does not
    compile). A no-op on a CPU backend. Streams produced under this
    context are byte-identical to the CPU-backend encoder's by
    construction — same program, same device kind.
    """
    import jax

    if jax.default_backend() == "cpu":
        import contextlib

        return contextlib.nullcontext()
    return jax.default_device(jax.devices("cpu")[0])
