"""ctypes loader for the C++ native module (EGR / RS / CRC fast paths).

Loads `libfrad_native.so` if present (build with
`python -m frad_python_tpu.native.build`); falls back silently to the
vectorised numpy implementations otherwise. Set FRAD_TPU_NO_NATIVE=1 to
force the fallback (used by tests to cover both paths).
"""

from __future__ import annotations

import ctypes
import os
import pathlib

import numpy as np

_SO = pathlib.Path(__file__).resolve().parent / "libfrad_native.so"

LIB: ctypes.CDLL | None = None


def reload() -> bool:
    """(Re)load the shared library; returns availability. Called at
    import, and again by callers that build the .so mid-process
    (e.g. bench.py on a fresh checkout)."""
    global LIB
    LIB = None
    if os.environ.get("FRAD_TPU_NO_NATIVE") or not _SO.exists():
        return False
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.frad_crc16_ansi.restype = ctypes.c_uint16
        lib.frad_crc16_ansi.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.frad_egr_encode.restype = ctypes.c_size_t
        lib.frad_egr_encode.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_size_t, ctypes.c_char_p]
        lib.frad_egr_decode.restype = ctypes.c_size_t
        lib.frad_egr_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.POINTER(ctypes.c_int64)]
        lib.frad_rs_encode_blocks.restype = None
        lib.frad_rs_encode_blocks.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_char_p]
        lib.frad_rs_decode_blocks.restype = None
        lib.frad_rs_decode_blocks.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_char_p]
    except OSError:
        return False
    LIB = lib
    return True


reload()


def available() -> bool:
    return LIB is not None


def crc16_ansi(data: bytes) -> int:
    return int(LIB.frad_crc16_ansi(data, len(data)))


def egr_encode(data: np.ndarray) -> bytes:
    data = np.ascontiguousarray(data, dtype=np.int64)
    n = len(data)
    out = ctypes.create_string_buffer(17 * n + 16)
    written = LIB.frad_egr_encode(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n, out)
    return out.raw[:written]


def egr_decode(dbytes: bytes) -> np.ndarray:
    cap = max(8 * (len(dbytes) - 1), 1)
    out = np.empty(cap, dtype=np.int64)
    count = LIB.frad_egr_decode(
        dbytes, len(dbytes), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return out[:count].copy()


def rs_encode_blocks(data: np.ndarray, nsym: int) -> np.ndarray:
    nblocks, dsize = data.shape
    data = np.ascontiguousarray(data, dtype=np.uint8)
    parity = np.empty((nblocks, nsym), dtype=np.uint8)
    LIB.frad_rs_encode_blocks(
        data.ctypes.data_as(ctypes.c_char_p), nblocks, dsize, nsym,
        parity.ctypes.data_as(ctypes.c_char_p))
    return parity


def rs_decode_blocks(codewords: np.ndarray, nsym: int) -> tuple[np.ndarray, np.ndarray]:
    nblocks, blen = codewords.shape
    cw = np.ascontiguousarray(codewords, dtype=np.uint8).copy()
    ok = np.empty(nblocks, dtype=np.uint8)
    LIB.frad_rs_decode_blocks(
        cw.ctypes.data_as(ctypes.c_char_p), nblocks, blen, nsym,
        ok.ctypes.data_as(ctypes.c_char_p))
    return cw[:, : blen - nsym], ok.astype(bool)
