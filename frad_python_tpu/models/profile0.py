"""Profile 0 — lossless DCT archival codec.

Pipeline parity with reference src/libfrad/fourier/profile0.py:
forward DCT-II (norm='forward') per channel -> automatic bit-depth
escalation on container-float overflow (profile0.py:24-26) -> truncated
IEEE-float packing at 12..64 bits (profile0.py:29-42). Decode: re-pad
bytes, NaN/Inf scrub, inverse DCT (profile0.py:52-69).

TPU-first departures: the DCT runs batched over all channels at once as a
single [ch, N] @ [N, N] matmul (ops/dct.py) instead of a per-channel
scipy loop, and the bit-packings are vectorised numpy (ops/packing.py).
"""

from __future__ import annotations

import numpy as np

from ..ops import packing, policy
from ..ops.dct import dct2_forward, idct2_forward

DEPTHS = packing.DEPTHS


def _forward(pcm: np.ndarray, dt: str, bits: int = 0) -> np.ndarray:
    """Forward DCT at dtype `dt`. f64 transforms run on-device as an
    emulated-f64 matmul for the 48-bit container (policy.deep_on_device:
    ~2^-47 relative error, within one ulp of the container's 36-bit
    mantissa), and on the host CPU FFT otherwise (policy.deep_device).
    Content beyond the f32-based emulation's magnitude range — incl.
    the f32-overflow escalation redo — always takes the host path."""
    if dt == "float64":
        max_abs = float(np.max(np.abs(pcm))) if pcm.size else 0.0
        if policy.deep_on_device(bits, len(pcm), max_abs):
            return np.asarray(dct2_forward(pcm, axis=0, force_matmul=True),
                              dtype=np.float64)
        with policy.deep_device():
            return np.asarray(dct2_forward(pcm, axis=0), dtype=np.float64)
    return np.asarray(dct2_forward(pcm.astype(dt), axis=0), dtype=np.float64)


def _escalates_deep(max_abs: float, bits: int) -> bool:
    """True when depth escalation from `bits` would land in a container
    deeper than f32 precision (incl. f32 overflow showing up as inf)."""
    if not np.isfinite(max_abs):
        return True
    try:
        return packing.needed_depth(max_abs, bits) >= policy.DEEP_BITS
    except OverflowError:
        return True


def analogue(pcm: np.ndarray, bits: int, srate: int, little_endian: bool) -> tuple[bytes, int, int, int]:
    """Encode one frame: [fsize, channels] f64 PCM -> (payload, depth index,
    channels, srate)."""
    if bits not in DEPTHS:
        bits = 16
    channels = pcm.shape[1] if pcm.ndim > 1 else 1
    pcm = np.asarray(pcm, dtype=np.float64).reshape(-1, channels)

    dt = policy.transform_dtype(bits)
    freqs = _forward(pcm, dt, bits)

    max_abs = float(np.max(np.abs(freqs))) if freqs.size else 0.0
    if dt != "float64" and _escalates_deep(max_abs, bits):
        # escalation crossed into a deeper-than-f32 container (possibly
        # via f32 overflow -> inf): redo at archival precision. The
        # 48-bit container shares f64's exponent range, so escalation
        # can never continue past it — the 64-bit depth is reached only
        # by explicit request, and always takes the host-f64 path.
        freqs = _forward(pcm, "float64", policy.DEEP_BITS)
        max_abs = float(np.max(np.abs(freqs))) if freqs.size else 0.0
    bits = packing.needed_depth(max_abs, bits)

    frad = packing.pack_floats(freqs.ravel(), bits, little_endian)
    return frad, DEPTHS.index(bits), channels, srate


def digital(frad: bytes, bit_depth_index: int, channels: int, little_endian: bool) -> np.ndarray:
    """Decode one frame payload -> [fsize, channels] f64 PCM."""
    bits = DEPTHS[bit_depth_index]
    flat = packing.unpack_floats(frad, bits, little_endian)
    n = (len(flat) // channels) * channels
    dt = policy.transform_dtype(bits)
    freqs = flat[:n].reshape(-1, channels).astype(dt)
    if dt == "float64":
        max_abs = float(np.max(np.abs(freqs))) if freqs.size else 0.0
        if policy.deep_on_device(bits, len(freqs), max_abs):
            return np.asarray(idct2_forward(freqs, axis=0, force_matmul=True),
                              dtype=np.float64)
        with policy.deep_device():
            return np.asarray(idct2_forward(freqs, axis=0), dtype=np.float64)
    return np.asarray(idct2_forward(freqs, axis=0), dtype=np.float64)
