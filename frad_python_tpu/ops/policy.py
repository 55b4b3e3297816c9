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
