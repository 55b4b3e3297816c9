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
        lib.frad_i24_to_f64.restype = None
        lib.frad_i24_to_f64.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_int]
        lib.frad_i16_to_f64.restype = None
        lib.frad_i16_to_f64.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_double,
            ctypes.c_void_p, ctypes.c_int]
        lib.frad_p1_unpack_batch.restype = None
        lib.frad_p1_unpack_batch.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int]
    except (OSError, AttributeError):
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


def i24_to_f64(raw: bytes | np.ndarray, nthreads: int = 2) -> np.ndarray:
    """Packed little-endian int24 triples -> f64 in [-1, 1)."""
    if isinstance(raw, np.ndarray):
        raw = np.ascontiguousarray(raw).tobytes()
    n = len(raw) // 3
    out = np.empty(n, dtype=np.float64)
    LIB.frad_i24_to_f64(raw, n, out.ctypes.data_as(ctypes.c_void_p), nthreads)
    return out


def i16_to_f64(arr: np.ndarray, scale: float = 1.0 / 32768.0,
               nthreads: int = 2) -> np.ndarray:
    """int16 array -> f64 * scale (shape preserved)."""
    arr = np.ascontiguousarray(arr, dtype=np.int16)
    out = np.empty(arr.shape, dtype=np.float64)
    LIB.frad_i16_to_f64(arr.ctypes.data_as(ctypes.c_void_p), arr.size, scale,
                        out.ctypes.data_as(ctypes.c_void_p), nthreads)
    return out


def p1_unpack_batch(payloads: list[bytes], fq_len: int, tq_len: int,
                    lq_len: int = 0, nthreads: int = 3
                    ) -> tuple[np.ndarray, np.ndarray, np.ndarray | None, np.ndarray]:
    """Inflate + EGR-decode + untrim a batch of P1/P2 payloads into f32.

    Returns (fq [B, fq_len], tq [B, tq_len], lq [B, lq_len] | None,
    ok [B] bool). Corrupt frames come back as zero rows with ok=False
    (the decoder's zero-frame path, reference profile1.py:59-64).
    """
    b = len(payloads)
    blob = b"".join(payloads)
    offsets = np.zeros(b + 1, dtype=np.int64)
    np.cumsum([len(p) for p in payloads], out=offsets[1:])
    fq = np.empty((b, fq_len), dtype=np.float32)
    tq = np.empty((b, tq_len), dtype=np.float32)
    lq = np.empty((b, lq_len), dtype=np.float32) if lq_len else None
    ok = np.empty(b, dtype=np.uint8)
    LIB.frad_p1_unpack_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        b, fq_len, tq_len, lq_len,
        fq.ctypes.data_as(ctypes.c_void_p), tq.ctypes.data_as(ctypes.c_void_p),
        lq.ctypes.data_as(ctypes.c_void_p) if lq is not None else None,
        ok.ctypes.data_as(ctypes.c_void_p), nthreads)
    return fq, tq, lq, ok.astype(bool)


def rs_decode_blocks(codewords: np.ndarray, nsym: int) -> tuple[np.ndarray, np.ndarray]:
    nblocks, blen = codewords.shape
    cw = np.ascontiguousarray(codewords, dtype=np.uint8).copy()
    ok = np.empty(nblocks, dtype=np.uint8)
    LIB.frad_rs_decode_blocks(
        cw.ctypes.data_as(ctypes.c_char_p), nblocks, blen, nsym,
        ok.ctypes.data_as(ctypes.c_char_p))
    return cw[:, : blen - nsym], ok.astype(bool)
