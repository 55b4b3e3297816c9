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


def analogue(pcm: np.ndarray, bits: int, srate: int, little_endian: bool) -> tuple[bytes, int, int, int]:
    """Encode one frame: [fsize, channels] f64 PCM -> (payload, depth index,
    channels, srate)."""
    if bits not in DEPTHS:
        bits = 16
    channels = pcm.shape[1] if pcm.ndim > 1 else 1
    pcm = np.asarray(pcm, dtype=np.float64).reshape(-1, channels)

    freqs = np.asarray(
        dct2_forward(pcm.astype(policy.compute_dtype()), axis=0), dtype=np.float64)

    max_abs = float(np.max(np.abs(freqs))) if freqs.size else 0.0
    bits = packing.needed_depth(max_abs, bits)

    frad = packing.pack_floats(freqs.ravel(), bits, little_endian)
    return frad, DEPTHS.index(bits), channels, srate


def digital(frad: bytes, bit_depth_index: int, channels: int, little_endian: bool) -> np.ndarray:
    """Decode one frame payload -> [fsize, channels] f64 PCM."""
    bits = DEPTHS[bit_depth_index]
    flat = packing.unpack_floats(frad, bits, little_endian)
    n = (len(flat) // channels) * channels
    freqs = flat[:n].reshape(-1, channels).astype(policy.compute_dtype())
    return np.asarray(idct2_forward(freqs, axis=0), dtype=np.float64)
