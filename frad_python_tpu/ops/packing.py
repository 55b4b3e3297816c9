"""Truncated float bit-packings for lossless profiles (12/24/48-bit).

FrAD lossless profiles store each coefficient/sample as an IEEE float
truncated to the stream bit depth:

  depth 64/32/16 -> raw f64/f32/f16 bytes
  depth 48/24    -> top 6/3 bytes of each f64/f32 (big-endian) or the low
                    6/3 bytes (little-endian)
  depth 12       -> top 3 nibbles (12 bits) of each f16; always big-endian

Behavioural parity with reference profile0.py:29-42 (encode trim) and
profile0.py:52-59 (decode pad); the reference builds these with per-element
Python byte-join/hex-string loops — here every packing is a constant number
of numpy reshape/slice ops over the whole frame (the 12-bit path is pure
uint16 nibble arithmetic), so cost is O(bytes) at memcpy speed.

DEPTHS table follows profile0.py:4 (shared with profile4.py:3).
"""

from __future__ import annotations

import numpy as np

DEPTHS = (12, 16, 24, 32, 48, 64)

# stream depth -> IEEE container dtype (without byte order)
CONTAINER = {12: "f2", 16: "f2", 24: "f4", 32: "f4", 48: "f8", 64: "f8"}

# Max magnitude representable by the container float at each DEPTHS index;
# drives automatic bit-depth escalation (reference profile0.py:6-12,24-26).
FLOAT_MAX = tuple(float(np.finfo(np.dtype(CONTAINER[d])).max) for d in DEPTHS)

_ESCALATE = {12: 16, 16: 24, 24: 32, 32: 48, 48: 64}


def needed_depth(max_abs: float, bits: int) -> int:
    """Escalate `bits` until the container float can hold `max_abs`
    (reference profile0.py:24-26). Raises past 64-bit (the reference's
    128-bit escape is unreachable: DEPTHS has no index for it)."""
    while max_abs > FLOAT_MAX[DEPTHS.index(bits)]:
        if bits not in _ESCALATE:
            raise OverflowError("Overflow with reaching the max bit depth.")
        bits = _ESCALATE[bits]
    return bits


def pack_floats(values: np.ndarray, bits: int, little_endian: bool) -> bytes:
    """Serialise a flat float array at the given stream depth.

    `values` is the already-interleaved flat array (frame-major, channel
    interleaved). Endianness applies to 8-bit-aligned depths only; 12-bit
    is forced big-endian (profile0.py:28).
    """
    if bits not in DEPTHS:
        raise ValueError(f"Illegal bits value {bits}")
    if bits == 12:
        v12 = values.astype(np.float16).view(np.uint16) >> 4
        return _pack_nibble_triples(v12)

    from .. import native
    if native.has("frad_pack_floats") and values.size >= 4096:
        # threaded single-pass C++ (the numpy path below builds strided
        # byte temporaries that dominate profile-4 encode)
        return native.pack_floats(values, bits, little_endian)

    endian = "<" if little_endian else ">"
    raw = np.ascontiguousarray(values.astype(endian + CONTAINER[bits]))
    if bits in (16, 32, 64):
        return raw.tobytes()
    # 24/48-bit: drop the mantissa tail byte(s) of each f32/f64.
    group = bits // 6          # container bytes per value (4 or 8)
    keep = bits // 8           # stored bytes per value (3 or 6)
    cols = raw.view(np.uint8).reshape(-1, group)
    out = cols[:, :keep] if endian == ">" else cols[:, group - keep:]
    return np.ascontiguousarray(out).tobytes()


def unpack_floats(frad: bytes, bits: int, little_endian: bool) -> np.ndarray:
    """Inverse of `pack_floats`: stored bytes -> float64 flat array with
    NaN/Inf scrubbed to 0 (reference profile0.py:52-66)."""
    if bits not in DEPTHS:
        raise ValueError(f"Illegal bits value {bits}")
    from .. import native
    if bits == 12:
        v12 = _unpack_nibble_triples(np.frombuffer(frad, dtype=np.uint8))
        raw = (v12.astype(np.uint16) << 4).view(np.float16)
    elif (len(frad) >= 16384 and len(frad) % (bits // 8) == 0
          and native.has("frad_unpack_floats")):
        return native.unpack_floats(frad, bits, little_endian)
    elif bits in (16, 32, 64):
        endian = "<" if little_endian else ">"
        raw = np.frombuffer(frad, dtype=endian + CONTAINER[bits])
    else:
        endian = "<" if little_endian else ">"
        group = bits // 6
        keep = bits // 8
        data = np.frombuffer(frad, dtype=np.uint8)
        data = data[: (len(data) // keep) * keep].reshape(-1, keep)
        full = np.zeros((data.shape[0], group), dtype=np.uint8)
        if endian == ">":
            full[:, :keep] = data
        else:
            full[:, group - keep:] = data
        raw = full.reshape(-1).view(endian + CONTAINER[bits])
    vals = np.asarray(raw, dtype=np.float64)
    return np.where(np.isfinite(vals), vals, 0.0)


def _pack_nibble_triples(v12: np.ndarray) -> bytes:
    """12-bit values -> nibble stream, zero-padded to a whole byte
    (matches the hex-string construction at profile0.py:36-39)."""
    n = len(v12)
    nib = np.empty(n * 3 + (n * 3) % 2, dtype=np.uint8)
    nib[n * 3:] = 0
    nib[0:n * 3:3] = (v12 >> 8) & 0xF
    nib[1:n * 3:3] = (v12 >> 4) & 0xF
    nib[2:n * 3:3] = v12 & 0xF
    pairs = nib.reshape(-1, 2)
    return ((pairs[:, 0] << 4) | pairs[:, 1]).astype(np.uint8).tobytes()


def _unpack_nibble_triples(buf: np.ndarray) -> np.ndarray:
    """Byte stream -> 12-bit values (drops a trailing partial triple,
    matching profile0.py:55-57)."""
    nib = np.empty(len(buf) * 2, dtype=np.uint8)
    nib[0::2] = buf >> 4
    nib[1::2] = buf & 0xF
    n = (len(nib) // 3) * 3
    tri = nib[:n].reshape(-1, 3).astype(np.uint16)
    return (tri[:, 0] << 8) | (tri[:, 1] << 4) | tri[:, 2]
