"""Frame-payload ECC armor: chunked Reed-Solomon RS(dsize+codesize, dsize).

Parity with reference src/libfrad/tools/ecc.py: the payload is split into
dsize-byte chunks, each extended with `codesize` RS parity bytes; decode
strips parity, or — in repair mode — corrects each block and zero-fills
blocks beyond correction capability (ecc.py:22).

Unlike the reference (one reedsolo call per chunk), all chunks of a frame
are encoded/checked in one vectorised numpy pass (ops/rs.py); only blocks
with non-zero syndromes enter the scalar repair path.
"""

from __future__ import annotations

import numpy as np

from ..ops import rs


def encode(data: bytes, ecc_dsize: int, ecc_codesize: int) -> bytes:
    """data -> data armored as [dsize bytes | codesize parity] blocks."""
    if not data or ecc_codesize <= 0:
        return data
    buf = np.frombuffer(data, dtype=np.uint8)
    n_full = len(buf) // ecc_dsize
    out_parts = []
    if n_full:
        blocks = buf[: n_full * ecc_dsize].reshape(n_full, ecc_dsize)
        parity = rs.encode_blocks(blocks, ecc_codesize)
        out_parts.append(
            np.concatenate([blocks, parity], axis=1).reshape(-1).tobytes()
        )
    rem = buf[n_full * ecc_dsize:]
    if rem.size:
        parity = rs.encode_blocks(rem[None, :], ecc_codesize)
        out_parts.append(rem.tobytes() + parity[0].tobytes())
    return b"".join(out_parts)


def decode(data: bytes, ecc_dsize: int, ecc_codesize: int, repair: bool) -> bytes:
    """Strip (or verify-and-repair) ECC blocks back to the raw payload."""
    if not data or ecc_codesize <= 0:
        return data
    blocksize = ecc_dsize + ecc_codesize
    if (blocksize > 255 or ecc_dsize < 1) and repair:
        # A hand-crafted/corrupt header can claim a ratio GF(256) cannot
        # honor (each field is u8; the sum may reach 510, or dsize may
        # be 0). No conforming encoder produces this (encoder.set_ecc
        # clamps/falls back), so the robust decode behavior is
        # best-effort parity stripping rather than a raised error
        # mid-stream.
        repair = False
    buf = np.frombuffer(data, dtype=np.uint8)
    n_full = len(buf) // blocksize
    parts = []
    if n_full:
        blocks = buf[: n_full * blocksize].reshape(n_full, blocksize)
        if repair:
            fixed, _ok = rs.decode_blocks(blocks, ecc_codesize)
            parts.append(fixed.reshape(-1).tobytes())
        else:
            parts.append(np.ascontiguousarray(blocks[:, :ecc_dsize]).reshape(-1).tobytes())
    rem = buf[n_full * blocksize:]
    if rem.size:
        keep = max(len(rem) - ecc_codesize, 0)
        if repair and keep > 0:
            fixed, _ok = rs.decode_blocks(rem[None, :], ecc_codesize)
            parts.append(fixed[0].tobytes())
        else:
            # truncated tail blocks can't carry a full code; pass data bytes
            parts.append(rem[:keep].tobytes())
    return b"".join(parts)
