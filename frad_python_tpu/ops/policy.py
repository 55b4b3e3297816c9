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
#: 24-bit mantissa; the 48/64-bit containers store 40/52 mantissa bits)
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
