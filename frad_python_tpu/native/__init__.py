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


# (symbol name, restype, argtypes). CORE symbols must all bind or the
# library is rejected; OPTIONAL ones (added after round 1) bind
# individually so a stale prebuilt .so keeps its older fast paths —
# callers gate on `has(name)`.
_C = ctypes
_CORE_SYMBOLS = [
    ("frad_crc16_ansi", _C.c_uint16, [_C.c_char_p, _C.c_size_t]),
    ("frad_egr_encode", _C.c_size_t,
     [_C.POINTER(_C.c_int64), _C.c_size_t, _C.c_char_p]),
    ("frad_egr_decode", _C.c_size_t,
     [_C.c_char_p, _C.c_size_t, _C.POINTER(_C.c_int64)]),
    ("frad_rs_encode_blocks", None,
     [_C.c_char_p, _C.c_size_t, _C.c_size_t, _C.c_size_t, _C.c_char_p]),
    ("frad_rs_decode_blocks", None,
     [_C.c_char_p, _C.c_size_t, _C.c_size_t, _C.c_size_t, _C.c_char_p]),
]
_OPTIONAL_SYMBOLS = [
    ("frad_i24_to_f64", None,
     [_C.c_char_p, _C.c_size_t, _C.c_void_p, _C.c_int]),
    ("frad_i16_to_f64", None,
     [_C.c_void_p, _C.c_size_t, _C.c_double, _C.c_void_p, _C.c_int]),
    ("frad_f64_to_i24", None,
     [_C.c_void_p, _C.c_size_t, _C.c_void_p, _C.c_int]),
    ("frad_f64_to_i16", None,
     [_C.c_void_p, _C.c_size_t, _C.c_double, _C.c_void_p, _C.c_int]),
    ("frad_p1_unpack_batch", None,
     [_C.c_char_p, _C.POINTER(_C.c_int64),
      _C.c_int64, _C.c_int64, _C.c_int64, _C.c_int64,
      _C.c_void_p, _C.c_void_p, _C.c_void_p, _C.c_void_p, _C.c_int]),
    ("frad_p1_pack_batch", None,
     [_C.c_void_p, _C.POINTER(_C.c_int64), _C.POINTER(_C.c_int64),
      _C.c_void_p, _C.c_int64, _C.c_int64,
      _C.POINTER(_C.c_int64), _C.c_int64,
      _C.c_void_p, _C.c_int64, _C.POINTER(_C.c_int64), _C.c_int]),
    ("frad_frame_pack_batch", None,
     [_C.c_char_p, _C.POINTER(_C.c_int64), _C.c_int64,
      _C.c_void_p, _C.c_void_p, _C.c_void_p,
      _C.c_int, _C.c_int, _C.c_int, _C.c_uint32,
      _C.c_int, _C.c_int, _C.c_int,
      _C.c_int, _C.c_int, _C.c_int,
      _C.c_void_p, _C.POINTER(_C.c_int64), _C.c_int]),
    ("frad_unarmor_batch", None,
     [_C.c_char_p, _C.POINTER(_C.c_int64), _C.c_int64,
      _C.c_int, _C.c_int, _C.c_void_p, _C.c_int, _C.c_int,
      _C.c_void_p, _C.POINTER(_C.c_int64), _C.c_void_p, _C.c_int]),
    ("frad_pack_floats", None,
     [_C.c_void_p, _C.c_size_t, _C.c_int, _C.c_int, _C.c_void_p, _C.c_int]),
    ("frad_unpack_floats", None,
     [_C.c_char_p, _C.c_size_t, _C.c_int, _C.c_int, _C.c_void_p, _C.c_int]),
    ("frad_maxabs_rows", None,
     [_C.c_void_p, _C.c_size_t, _C.c_size_t, _C.c_void_p, _C.c_int]),
    ("frad_pack_floats_maxabs", None,
     [_C.c_void_p, _C.c_size_t, _C.c_size_t, _C.c_int, _C.c_int,
      _C.c_void_p, _C.c_void_p, _C.c_int]),
    ("frad_frame_parse_batch", _C.c_int64,
     [_C.c_char_p, _C.c_int64, _C.c_int64,
      _C.c_void_p, _C.c_void_p, _C.c_void_p, _C.c_void_p, _C.c_void_p,
      _C.c_void_p, _C.c_void_p, _C.c_void_p, _C.c_void_p, _C.c_void_p,
      _C.c_void_p, _C.c_void_p, _C.POINTER(_C.c_int64)]),
]

_missing: set[str] = set()
_warned = False


def reload() -> bool:
    """(Re)load the shared library; returns availability. Called at
    import, and again by callers that build the .so mid-process
    (e.g. bench.py on a fresh checkout)."""
    global LIB, _missing, _warned
    LIB = None
    _missing = set()
    if os.environ.get("FRAD_TPU_NO_NATIVE") or not _SO.exists():
        return False
    try:
        lib = ctypes.CDLL(str(_SO))
        for name, restype, argtypes in _CORE_SYMBOLS:
            fn = getattr(lib, name)
            fn.restype = restype
            fn.argtypes = argtypes
    except (OSError, AttributeError):
        return False
    for name, restype, argtypes in _OPTIONAL_SYMBOLS:
        try:
            fn = getattr(lib, name)
            fn.restype = restype
            fn.argtypes = argtypes
        except AttributeError:
            _missing.add(name)
    if _missing and not _warned:
        _warned = True
        import warnings
        warnings.warn(
            "libfrad_native.so is stale (missing: %s); rebuild with "
            "`python -m frad_python_tpu.native.build` for the full fast "
            "path" % ", ".join(sorted(_missing)), RuntimeWarning)
    LIB = lib
    return True


reload()


def available() -> bool:
    return LIB is not None


def has(symbol: str) -> bool:
    """True when the loaded .so exports `symbol` (stale builds may not)."""
    return LIB is not None and symbol not in _missing


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
    from ..ops.rs import check_code_params
    check_code_params(dsize, nsym)   # guards the C statics indexed by nsym
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
    if len(raw) % 3:
        # match the numpy fallback's reshape(-1, 3) strictness
        raise ValueError(f"i24 byte stream length {len(raw)} not a multiple of 3")
    n = len(raw) // 3
    out = np.empty(n, dtype=np.float64)
    LIB.frad_i24_to_f64(raw, n, out.ctypes.data_as(ctypes.c_void_p), nthreads)
    return out


def f64_to_i24(pcm: np.ndarray, nthreads: int = 2) -> np.ndarray:
    """f64 PCM -> packed little-endian int24 triples as uint8 [n*3]."""
    pcm = np.ascontiguousarray(pcm, dtype=np.float64)
    out = np.empty(pcm.size * 3, dtype=np.uint8)
    LIB.frad_f64_to_i24(pcm.ctypes.data_as(ctypes.c_void_p), pcm.size,
                        out.ctypes.data_as(ctypes.c_void_p), nthreads)
    return out


def f64_to_i16(pcm: np.ndarray, scale: float = 32768.0,
               nthreads: int = 2) -> np.ndarray:
    """f64 PCM -> clamped int16 (x * scale), shape preserved."""
    pcm = np.ascontiguousarray(pcm, dtype=np.float64)
    out = np.empty(pcm.shape, dtype=np.int16)
    LIB.frad_f64_to_i16(pcm.ctypes.data_as(ctypes.c_void_p), pcm.size, scale,
                        out.ctypes.data_as(ctypes.c_void_p), nthreads)
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


def p1_pack_batch(words: np.ndarray, nbits: np.ndarray, ks: np.ndarray,
                  skip: np.ndarray, tq: np.ndarray, nthreads: int = 3
                  ) -> list[bytes | None]:
    """Assemble + deflate a batch of P1 payloads from device-packed EGR
    words (the encode mirror of `p1_unpack_batch`).

    words [B, W] uint32 (big-endian stream order), nbits/ks [B],
    skip [B] bool (overflow frames the caller re-packs on the host),
    tq [B, T] threshold ints. Returns per-frame payload bytes, or None
    where skipped (deflate output byte-identical to
    zlib.compress(frad, wbits=-15)).
    """
    b, w = words.shape
    words = np.ascontiguousarray(words, dtype=np.uint32)
    nbits = np.ascontiguousarray(nbits, dtype=np.int64)
    ks = np.ascontiguousarray(ks, dtype=np.int64)
    skip_u8 = np.ascontiguousarray(skip, dtype=np.uint8)
    tq = np.ascontiguousarray(tq, dtype=np.int64).reshape(b, -1)
    t = tq.shape[1]
    frad_max = 4 + 17 * t + 16 + 1 + 4 * w
    cap = frad_max + frad_max // 1000 + 128   # > deflateBound for raw deflate
    out = np.empty(b * cap, dtype=np.uint8)
    out_len = np.zeros(b, dtype=np.int64)
    LIB.frad_p1_pack_batch(
        words.ctypes.data_as(ctypes.c_void_p),
        nbits.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ks.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        skip_u8.ctypes.data_as(ctypes.c_void_p), b, w,
        tq.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), t,
        out.ctypes.data_as(ctypes.c_void_p), cap,
        out_len.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), nthreads)
    return [out[i * cap: i * cap + out_len[i]].tobytes()
            if out_len[i] > 0 else None for i in range(b)]


def frame_pack_batch(payloads: "list[bytes] | tuple[bytes, np.ndarray]",
                     bdis: np.ndarray, fsizes: np.ndarray,
                     fsize_idx: np.ndarray | None, *, profile: int,
                     is_compact: bool, channels: int, srate: int,
                     srate_idx: int = 0, overlap_ratio: int = 0,
                     little_endian: bool = False, ecc: bool = False,
                     ecc_dsize: int = 0, ecc_codesize: int = 0,
                     nthreads: int = 3) -> bytes:
    """Assemble a batch of frames into the final byte stream: RS armor +
    ASFH header + CRC per frame, threaded, one output buffer.

    `payloads` is a list of raw per-frame payloads OR a pre-joined
    (blob, offsets[B+1]) pair. Output is byte-identical to the per-frame
    ecc.encode + ASFH.write chain (reference encoder.py:102-104)."""
    if isinstance(payloads, tuple):
        blob, offsets = payloads
        offsets = np.ascontiguousarray(offsets, dtype=np.int64)
        b = len(offsets) - 1
    else:
        b = len(payloads)
        blob = b"".join(payloads)
        offsets = np.zeros(b + 1, dtype=np.int64)
        np.cumsum([len(p) for p in payloads], out=offsets[1:])

    lens = np.diff(offsets)
    if ecc and ecc_codesize > 0:
        nfull = lens // ecc_dsize
        rem = lens - nfull * ecc_dsize
        alens = np.where(lens > 0,
                         lens + (nfull + (rem > 0)) * ecc_codesize, 0)
    else:
        alens = lens
    hlen = (16 if ecc else 12) if is_compact else 32
    exts = np.where(alens >= 0xFFFFFFFF, 8, 0)
    out_offsets = np.zeros(b + 1, dtype=np.int64)
    np.cumsum(hlen + exts + alens, out=out_offsets[1:])

    bdis = np.ascontiguousarray(bdis, dtype=np.uint8)
    fsizes = np.ascontiguousarray(fsizes, dtype=np.uint32)
    if fsize_idx is None:
        fsize_idx = np.zeros(b, dtype=np.uint8)
    fsize_idx = np.ascontiguousarray(fsize_idx, dtype=np.uint8)
    out = np.empty(int(out_offsets[-1]), dtype=np.uint8)
    LIB.frad_frame_pack_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), b,
        bdis.ctypes.data_as(ctypes.c_void_p),
        fsizes.ctypes.data_as(ctypes.c_void_p),
        fsize_idx.ctypes.data_as(ctypes.c_void_p),
        profile, int(is_compact), channels, srate, srate_idx,
        overlap_ratio, int(little_endian),
        int(ecc), ecc_dsize, ecc_codesize,
        out.ctypes.data_as(ctypes.c_void_p),
        out_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), nthreads)
    return out.tobytes()


def unarmor_batch(payloads: list[bytes], dsize: int, csize: int,
                  crcs: np.ndarray, crc_is16: bool, fix_error: bool,
                  nthreads: int = 3) -> tuple[list[bytes], np.ndarray]:
    """Strip (and, on CRC mismatch with fix_error, RS-repair) a batch of
    armored payloads; returns (raw payloads, ok[B] bool)."""
    b = len(payloads)
    blob = b"".join(payloads)
    offsets = np.zeros(b + 1, dtype=np.int64)
    np.cumsum([len(p) for p in payloads], out=offsets[1:])
    lens = np.diff(offsets)
    bs = dsize + csize
    nfull = lens // bs
    rem = lens - nfull * bs
    outlens = nfull * dsize + np.where(rem > 0, np.maximum(rem - csize, 0), 0)
    out_offsets = np.zeros(b + 1, dtype=np.int64)
    np.cumsum(outlens, out=out_offsets[1:])
    crcs = np.ascontiguousarray(crcs, dtype=np.uint32)
    out = np.empty(int(out_offsets[-1]), dtype=np.uint8)
    ok = np.empty(b, dtype=np.uint8)
    LIB.frad_unarmor_batch(
        blob, offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), b,
        dsize, csize, crcs.ctypes.data_as(ctypes.c_void_p),
        int(crc_is16), int(fix_error),
        out.ctypes.data_as(ctypes.c_void_p),
        out_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ok.ctypes.data_as(ctypes.c_void_p), nthreads)
    raw = out.tobytes()
    return ([raw[out_offsets[i]: out_offsets[i + 1]] for i in range(b)],
            ok.astype(bool))


def pack_floats(values: np.ndarray, bits: int, little_endian: bool,
                nthreads: int = 3) -> bytes:
    """Truncated-float serialisation (16/24/32/48/64-bit), threaded;
    byte-identical to ops/packing.pack_floats."""
    flat = np.ascontiguousarray(values, dtype=np.float64).reshape(-1)
    out = np.empty(flat.size * (bits // 8), dtype=np.uint8)
    LIB.frad_pack_floats(flat.ctypes.data_as(ctypes.c_void_p), flat.size,
                         bits, int(little_endian),
                         out.ctypes.data_as(ctypes.c_void_p), nthreads)
    return out.tobytes()


def unpack_floats(frad: bytes, bits: int, little_endian: bool,
                  nthreads: int = 3) -> np.ndarray:
    """Inverse of pack_floats: stored bytes -> f64 with NaN/Inf -> 0."""
    n = len(frad) // (bits // 8)
    out = np.empty(n, dtype=np.float64)
    LIB.frad_unpack_floats(frad, n, bits, int(little_endian),
                           out.ctypes.data_as(ctypes.c_void_p), nthreads)
    return out


def pack_floats_maxabs(mat: np.ndarray, bits: int, little_endian: bool,
                       nthreads: int = 2) -> tuple[bytes, np.ndarray]:
    """Fused `pack_floats` + per-row max|x| over an [rows, cols] f64
    matrix: one pass instead of a maxabs scan followed by a pack scan.
    Returns (packed bytes, maxabs [rows]). Caller must gate bits != 12
    and re-pack if any row's max escalates past the container float."""
    mat = np.ascontiguousarray(mat, dtype=np.float64)
    rows, cols = mat.shape
    out = np.empty(rows * cols * (bits // 8), dtype=np.uint8)
    maxabs = np.empty(rows, dtype=np.float64)
    LIB.frad_pack_floats_maxabs(
        mat.ctypes.data_as(ctypes.c_void_p), rows, cols, bits,
        int(little_endian), out.ctypes.data_as(ctypes.c_void_p),
        maxabs.ctypes.data_as(ctypes.c_void_p), nthreads)
    return out.tobytes(), maxabs


def maxabs_rows(mat: np.ndarray, nthreads: int = 2) -> np.ndarray:
    """Per-row max|x| of an [rows, cols] f64 matrix in one striped pass
    (the lossless bit-depth escalation probe)."""
    mat = np.ascontiguousarray(mat, dtype=np.float64)
    rows, cols = mat.shape
    out = np.empty(rows, dtype=np.float64)
    LIB.frad_maxabs_rows(mat.ctypes.data_as(ctypes.c_void_p), rows, cols,
                         out.ctypes.data_as(ctypes.c_void_p), nthreads)
    return out


def rs_decode_blocks(codewords: np.ndarray, nsym: int) -> tuple[np.ndarray, np.ndarray]:
    nblocks, blen = codewords.shape
    from ..ops.rs import check_code_params
    check_code_params(blen - nsym, nsym)  # guards the C statics indexed by nsym
    cw = np.ascontiguousarray(codewords, dtype=np.uint8).copy()
    ok = np.empty(nblocks, dtype=np.uint8)
    LIB.frad_rs_decode_blocks(
        cw.ctypes.data_as(ctypes.c_char_p), nblocks, blen, nsym,
        ok.ctypes.data_as(ctypes.c_char_p))
    return cw[:, : blen - nsym], ok.astype(bool)


def frame_parse_batch(stream: bytes):
    """Batched ASFH frame scan (container/asfh.py parse semantics).

    Returns (count, pay_off, pay_len, is_ff, pfb, chans, srates, fsizes,
    olaps, eccds, ecccs, crcs, hdrlens, tail_pos) where tail_pos is the
    byte offset of the unparsed tail or -1 when there is none. Raises
    IndexError on a CSS srate index outside the table, matching the
    Python parser's behaviour on the same bytes.
    """
    n = len(stream)
    cap = max(min(stream.count(b"\xff\xd0\xd2\x98"), n // 12 + 1), 1)
    pay_off = np.empty(cap, dtype=np.int64)
    pay_len = np.empty(cap, dtype=np.int64)
    is_ff = np.empty(cap, dtype=np.uint8)
    pfb = np.empty(cap, dtype=np.uint8)
    chans = np.empty(cap, dtype=np.uint16)
    srates = np.empty(cap, dtype=np.uint32)
    fsizes = np.empty(cap, dtype=np.uint32)
    olaps = np.empty(cap, dtype=np.uint8)
    eccds = np.empty(cap, dtype=np.uint8)
    ecccs = np.empty(cap, dtype=np.uint8)
    crcs = np.empty(cap, dtype=np.uint32)
    hdrlens = np.empty(cap, dtype=np.int32)
    tail_pos = ctypes.c_int64(-1)
    cnt = LIB.frad_frame_parse_batch(
        stream, n, cap,
        pay_off.ctypes.data_as(ctypes.c_void_p),
        pay_len.ctypes.data_as(ctypes.c_void_p),
        is_ff.ctypes.data_as(ctypes.c_void_p),
        pfb.ctypes.data_as(ctypes.c_void_p),
        chans.ctypes.data_as(ctypes.c_void_p),
        srates.ctypes.data_as(ctypes.c_void_p),
        fsizes.ctypes.data_as(ctypes.c_void_p),
        olaps.ctypes.data_as(ctypes.c_void_p),
        eccds.ctypes.data_as(ctypes.c_void_p),
        ecccs.ctypes.data_as(ctypes.c_void_p),
        crcs.ctypes.data_as(ctypes.c_void_p),
        hdrlens.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(tail_pos))
    if tail_pos.value == -2:
        raise IndexError("tuple index out of range")  # CSS srate index
    return (int(cnt), pay_off, pay_len, is_ff, pfb, chans, srates, fsizes,
            olaps, eccds, ecccs, crcs, hdrlens, int(tail_pos.value))
