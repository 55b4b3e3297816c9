"""Profile 4 — lossless raw-PCM storage.

Identical to profile 0 minus the transform: raw f64 PCM cast to the
stream depth's container float with the same truncated packings
(reference src/libfrad/fourier/profile4.py:14-63).
"""

from __future__ import annotations

import numpy as np

from ..ops import packing

DEPTHS = packing.DEPTHS


def analogue(pcm: np.ndarray, bits: int, srate: int, little_endian: bool) -> tuple[bytes, int, int, int]:
    if bits not in DEPTHS:
        bits = 16
    channels = pcm.shape[1] if pcm.ndim > 1 else 1
    pcm = np.asarray(pcm, dtype=np.float64).reshape(-1, channels)

    max_abs = float(np.max(np.abs(pcm))) if pcm.size else 0.0
    bits = packing.needed_depth(max_abs, bits)

    frad = packing.pack_floats(pcm.ravel(), bits, little_endian)
    return frad, DEPTHS.index(bits), channels, srate


def digital(frad: bytes, bit_depth_index: int, channels: int, little_endian: bool) -> np.ndarray:
    bits = DEPTHS[bit_depth_index]
    flat = packing.unpack_floats(frad, bits, little_endian)
    n = (len(flat) // channels) * channels
    return flat[:n].reshape(-1, channels)
