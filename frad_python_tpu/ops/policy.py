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


def deep_on_device(bits: int, n: int = 0, max_abs: float | None = None) -> bool:
    """True when a `bits`-deep archival transform of frame size `n`
    (content magnitude `max_abs` when known) should run ON the
    accelerator instead of the host CPU.

    The 48-bit container keeps 36 mantissa bits; XLA:TPU's emulated f64
    matmul measures ~6e-15 relative error (2^-47) — two orders below
    one ulp of the container (2^-37) — so the 48-bit DCT runs on-chip
    as an f64 matmul (the FFT formulation needs complex128, which TPU
    lacks — which is also why frames beyond the matmul matrix cap must
    stay on the host: the device would have to fall into the
    uncompilable FFT form). The 64-bit container stores the full f64
    mantissa, where matmul accumulation noise would land above the
    container's precision: it stays on the host CPU FFT path.

    Opt out with FRAD_TPU_DEEP_ON_HOST=1 (restores the r3 behavior:
    all deep depths on host). On rigs where the accelerator link is
    slow relative to the host CPU, the host route wins end-to-end —
    measured on the tunneled bench rig at 3509 vs 217 frames/s
    (BENCH_DETAIL p0_stereo_48b_host vs p0_stereo_48b; the device
    route's floor is ~50x lower on a PCIe-local chip, which is why
    the chip remains the default on a TPU backend).

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
    if max_abs is not None and not (max_abs <= DEVICE_F64_SAFE_MAX):
        # beyond the f32-based emulation's range (NaN max_abs also
        # lands here): host real-f64 only
        return False
    import jax

    return jax.default_backend() == "tpu"


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
