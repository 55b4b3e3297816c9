"""Native C++ module parity vs numpy fallbacks (skipped when not built)."""

import numpy as np
import pytest

from frad_python_tpu import native
from frad_python_tpu.common import _CRC16_TABLE_LIST
from frad_python_tpu.ops import golomb, rs

pytestmark = pytest.mark.skipif(not native.available(), reason="native module not built")
rng = np.random.default_rng(11)


def python_crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = (crc >> 8) ^ _CRC16_TABLE_LIST[(crc ^ b) & 0xFF]
    return crc


def test_crc16_parity():
    for n in (0, 1, 7, 999):
        b = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert native.crc16_ansi(b) == python_crc16(b)


def test_egr_native_equals_numpy():
    for scale in (1, 7, 500, 2**18, 2**40):
        data = (rng.standard_normal(3000) * scale).astype(np.int64)
        enc_nat = native.egr_encode(data)
        lib = native.LIB
        try:
            native.LIB = None
            enc_np = golomb.encode(data)
            dec_np_of_nat = golomb.decode(enc_nat)
        finally:
            native.LIB = lib
        assert enc_nat == enc_np
        np.testing.assert_array_equal(native.egr_decode(enc_np), data)
        np.testing.assert_array_equal(dec_np_of_nat, data)


def test_rs_native_equals_numpy():
    data = rng.integers(0, 256, size=(32, 96), dtype=np.uint8)
    par_nat = native.rs_encode_blocks(data, 24)
    lib = native.LIB
    try:
        native.LIB = None
        par_np = rs.encode_blocks(data, 24)
    finally:
        native.LIB = lib
    np.testing.assert_array_equal(par_nat, par_np)

    cw = np.concatenate([data, par_nat], axis=1)
    cw[2, 10] ^= 0xAB
    cw[5, 100] ^= 0x01
    fixed, ok = native.rs_decode_blocks(cw, 24)
    assert ok.all()
    np.testing.assert_array_equal(fixed, data)

    cw[9, :60] ^= 0x5A
    fixed, ok = native.rs_decode_blocks(cw, 24)
    assert not ok[9] and not fixed[9].any()


@pytest.mark.parametrize("dsize,nsym", [
    (96, 1), (96, 5), (96, 7),      # < one u64 lane: pure tail loop
    (96, 8), (96, 15), (96, 32),    # exact lane / lane+tail mixes
    (200, 55),                      # max-length GF(256) codeword (255)
])
def test_rs_table_kernels_match_numpy_all_widths(dsize, nsym):
    """The table-driven encode XORs feedback rows in u64 lanes with a
    byte tail — every width class must match the numpy GF oracle bit
    for bit, and a single error must round-trip at every valid width."""
    data = rng.integers(0, 256, size=(8, dsize), dtype=np.uint8)
    par_nat = native.rs_encode_blocks(data, nsym)
    lib = native.LIB
    try:
        native.LIB = None
        par_np = rs.encode_blocks(data, nsym)
    finally:
        native.LIB = lib
    np.testing.assert_array_equal(par_nat, par_np)

    if nsym >= 2:
        cw = np.concatenate([data, par_nat], axis=1)
        cw[3, dsize // 2] ^= 0xC3
        fixed, ok = native.rs_decode_blocks(cw, nsym)
        assert ok.all()
        np.testing.assert_array_equal(fixed, data)


def test_rs_rejects_codewords_beyond_gf256():
    """dsize+nsym > 255 cannot be honored in GF(256) (Chien positions
    alias mod 255) and the wire format can't express it — both the
    native wrappers and the numpy path must reject it loudly instead
    of silently emitting an uncorrectable code (reference reedsolo
    would instead auto-extend the field, ecc.py:6-12)."""
    data = rng.integers(0, 256, size=(4, 600), dtype=np.uint8)
    with pytest.raises(ValueError, match="GF\\(256\\)"):
        native.rs_encode_blocks(data, 200)
    with pytest.raises(ValueError, match="GF\\(256\\)"):
        rs.encode_blocks(data, 200)
    cw = rng.integers(0, 256, size=(4, 800), dtype=np.uint8)
    with pytest.raises(ValueError, match="GF\\(256\\)"):
        native.rs_decode_blocks(cw, 200)
    with pytest.raises(ValueError, match="GF\\(256\\)"):
        rs.decode_blocks(cw, 200)
    lib = native.LIB
    try:
        native.LIB = None
        with pytest.raises(ValueError, match="GF\\(256\\)"):
            rs.encode_blocks(data, 200)
    finally:
        native.LIB = lib


def test_ecc_decode_survives_oversize_wire_ratio():
    """A hand-crafted header can claim ecc ratios whose sum exceeds 255
    (both fields are u8). The container decode must strip parity
    best-effort, never raise mid-stream."""
    from frad_python_tpu.container import ecc as ecc_mod
    data = bytes(rng.integers(0, 256, 1200, dtype=np.uint8))
    out = ecc_mod.decode(data, 255, 255, repair=True)
    assert out == ecc_mod.decode(data, 255, 255, repair=False)


# ---------------------------------------------------------------------------
# Round-2 entry points: transfer-format converters + batched lossy unpack
# ---------------------------------------------------------------------------

def test_i24_round_trip_and_strictness():
    pcm = np.clip(rng.standard_normal(5000) * 0.3, -1.0, 1.0 - 2.0 ** -23)
    raw = native.f64_to_i24(pcm)
    assert raw.dtype == np.uint8 and raw.size == pcm.size * 3
    # numpy oracle: little-endian sign-extended triples / 2^23
    trip = raw.reshape(-1, 3).astype(np.int32)
    val = trip[:, 0] | (trip[:, 1] << 8) | (trip[:, 2] << 16)
    val = (val ^ 0x800000) - 0x800000
    np.testing.assert_array_equal(val, np.rint(pcm * 2 ** 23).astype(np.int64))
    back = native.i24_to_f64(raw)
    np.testing.assert_allclose(back, pcm, atol=2.0 ** -23)
    # clamp at the rails
    rails = native.f64_to_i24(np.array([1.5, -1.5]))
    r = rails.reshape(-1, 3).astype(np.int32)
    rv = (r[:, 0] | (r[:, 1] << 8) | (r[:, 2] << 16) ^ 0x800000) - 0x800000
    np.testing.assert_array_equal(rv, [0x7FFFFF, -0x800000])
    # malformed length must raise, matching the numpy reshape(-1, 3) path
    with pytest.raises(ValueError):
        native.i24_to_f64(raw.tobytes()[:-1])


def test_i16_round_trip_matches_numpy():
    pcm = rng.standard_normal(70000) * 0.5          # crosses threading gate
    ints = native.f64_to_i16(pcm)
    oracle = np.clip(np.rint(pcm * 32768.0), -32768, 32767).astype(np.int16)
    np.testing.assert_array_equal(ints, oracle)
    back = native.i16_to_f64(ints)
    np.testing.assert_allclose(back, ints.astype(np.float64) / 32768.0)


def _py_unpack(payloads, fq_len, tq_len, lq_len=0):
    """The pipeline's numpy fallback semantics (pipeline.py unpack_one)."""
    from frad_python_tpu.models import profile1, profile2
    fq = np.zeros((len(payloads), fq_len), np.float32)
    tq = np.zeros((len(payloads), tq_len), np.float32)
    lq = np.zeros((len(payloads), lq_len), np.float32)
    for i, p in enumerate(payloads):
        st = profile2.unpack_streams(p) if lq_len else profile1.unpack_streams(p)
        if st is None:
            continue
        if lq_len:
            fi, ti, li = st
            lq[i, :min(lq_len, len(li))] = li[:lq_len]
        else:
            fi, ti = st
        fq[i, :min(fq_len, len(fi))] = fi[:fq_len]
        tq[i, :min(tq_len, len(ti))] = ti[:tq_len]
    return fq, tq, lq


def _random_p1_payload(n, ch, scale=300):
    from frad_python_tpu.models import profile1
    f = (rng.standard_normal(n * ch) * scale).astype(np.int64)
    t = rng.integers(-40, 120, 27 * ch).astype(np.int64)
    return profile1.pack_streams(f, t)


def test_p1_unpack_batch_parity_valid():
    n, ch = 256, 2
    ps = [_random_p1_payload(n, ch) for _ in range(12)]
    fq, tq, lq, ok = native.p1_unpack_batch(ps, n * ch, 27 * ch)
    assert ok.all() and lq is None
    efq, etq, _ = _py_unpack(ps, n * ch, 27 * ch)
    np.testing.assert_array_equal(fq, efq)
    np.testing.assert_array_equal(tq, etq)


def test_p1_unpack_batch_corrupt_payloads():
    import struct
    import zlib
    n, ch = 128, 1
    good = _random_p1_payload(n, ch)
    cases = [
        good,
        b"",                                         # empty
        b"\x00\x01\x02garbage-not-deflate",          # inflate fails
        good[: len(good) // 2],                       # truncated mid-stream
        zlib.compress(b"\x00\x01", wbits=-15),        # inflated < 4 bytes
        # thres_len field overruns the inflated buffer: short-slice, like
        # the Python fallback (everything becomes thres, freqs empty)
        zlib.compress(struct.pack(">I", 10 ** 6) + b"\x80" * 40, wbits=-15),
    ]
    fq, tq, lq, ok = native.p1_unpack_batch(cases, n * ch, 27 * ch)
    efq, etq, _ = _py_unpack(cases, n * ch, 27 * ch)
    np.testing.assert_array_equal(fq, efq)
    np.testing.assert_array_equal(tq, etq)
    assert ok[0] and not ok[1] and not ok[2] and not ok[4]
    # zero-row contract for every frame that failed to unpack
    for i in (1, 2, 4):
        assert not fq[i].any() and not tq[i].any()


def test_p2_unpack_batch_parity_and_lq_contract():
    import struct
    import zlib

    from frad_python_tpu.models import profile2
    n, ch, order1 = 128, 2, 13
    ps = []
    for _ in range(6):
        f = (rng.standard_normal(n * ch) * 200).astype(np.int64)
        t = rng.integers(-40, 120, 27 * ch).astype(np.int64)
        lpc = rng.integers(-8, 8, order1 * ch).astype(np.int64)
        ps.append(profile2.pack_streams(f, t, lpc))
    # corrupt variants: inflated < 6 bytes, lpc_len overrun (layout never
    # validates -> ALL rows incl. lq must stay zero: the ADVICE.md contract)
    ps.append(zlib.compress(b"\x00\x01\x02", wbits=-15))
    ps.append(zlib.compress(struct.pack(">H", 60000) + b"\x80" * 30, wbits=-15))
    ps.append(b"not-deflate-at-all")
    fq, tq, lq, ok = native.p1_unpack_batch(ps, n * ch, 27 * ch, order1 * ch)
    efq, etq, elq = _py_unpack(ps, n * ch, 27 * ch, order1 * ch)
    np.testing.assert_array_equal(fq, efq)
    np.testing.assert_array_equal(tq, etq)
    np.testing.assert_array_equal(lq, elq)
    assert ok[:6].all() and not ok[6:].any()
    for i in (6, 7, 8):
        assert not lq[i].any()


def test_p1_pack_batch_pipeline_parity():
    """The native batched payload assembler must produce a byte-identical
    stream to the Python per-frame pack path (words_to_stream + golomb +
    zlib.compress)."""
    from frad_python_tpu.parallel import batch_encode

    pcm = rng.standard_normal((2048 * 24, 2)) * 0.4
    assert native.has("frad_p1_pack_batch")
    stream_nat = batch_encode(pcm, 1, 48000, 16, 2048, overlap_ratio=16)
    lib = native.LIB
    try:
        native.LIB = None
        native._missing = {"frad_p1_pack_batch"}
        stream_py = batch_encode(pcm, 1, 48000, 16, 2048, overlap_ratio=16)
    finally:
        native.LIB = lib
        native._missing = set()
    assert stream_nat == stream_py


def test_frame_parse_batch_matches_python_parser():
    """The C++ ASFH batch scan must return structures identical to the
    Python _parse_frames on frames with ECC, overlap, force-flush
    terminators, junk, truncation, and the u64 length escape."""
    import struct

    from frad_python_tpu.container.asfh import ASFH
    from frad_python_tpu.parallel import batch_encode, pipeline
    import frad_python_tpu.native as nat

    if not nat.has("frad_frame_parse_batch"):
        import pytest
        pytest.skip("native frame parser not built")

    pcm = rng.standard_normal((20000, 2)) * 0.4
    s_p1 = batch_encode(pcm, 1, 48000, 16, 2048, enable_ecc=True,
                        overlap_ratio=16)
    s_p0 = batch_encode(pcm, 0, 44100, 24, 512)
    s_p4 = batch_encode(pcm, 4, 44100, 64, 512, enable_ecc=True)

    a = ASFH()
    a.profile, a.ecc, a.endian, a.bit_depth_index = 0, False, False, 2
    a.channels, a.srate, a.fsize, a.overlap_ratio = 2, 44100, 16, 0
    payload = bytes(range(100)) * 2
    hdr = a.write(payload)
    escaped = (hdr[:4] + b"\xff\xff\xff\xff" + hdr[8:32]
               + struct.pack(">Q", len(payload)) + payload)

    streams = [
        s_p1, s_p0,
        b"JUNKJUNK" + s_p4[: len(s_p4) - 37],          # junk + truncation
        s_p1 + b"\xff\xd0" + s_p0 + b"\xff\xd0\xd2\x98\x00\x00",
        escaped + s_p0[:500],
        b"", b"\xff\xd0\xd2",                           # degenerate
    ]

    def snap(headers, payloads, tail):
        hs = [(h.profile, h.ecc, h.endian, h.bit_depth_index, h.channels,
               h.srate, h.fsize, h.overlap_ratio, h.ecc_dsize,
               h.ecc_codesize, h.crc, h.header_bytes, h.buffer,
               h.frmbytes if p is not None else -1)
              for h, p in zip(headers, payloads)]
        return hs, payloads, tail

    for i, s in enumerate(streams):
        got = snap(*pipeline._parse_frames(s))
        missing = nat._missing.copy()
        nat._missing.add("frad_frame_parse_batch")
        try:
            want = snap(*pipeline._parse_frames(s))
        finally:
            nat._missing = missing
        assert got == want, f"stream {i} diverged"


@pytest.mark.skipif(not native.has("frad_maxabs_rows"),
                    reason="stale .so without maxabs")
def test_maxabs_rows_parity():
    m = rng.standard_normal((129, 333)) * 100
    np.testing.assert_allclose(native.maxabs_rows(m), np.abs(m).max(axis=1))


@pytest.mark.skipif(not native.has("frad_pack_floats_maxabs"),
                    reason="stale .so without fused pack")
def test_pack_floats_maxabs_parity():
    """Fused pack + per-row max must match pack_floats byte-for-byte
    (it feeds _BlobParts directly in the lossless encode path)."""
    from frad_python_tpu.ops import packing

    for bits in (16, 24, 32, 48, 64):
        for little in (False, True):
            m = rng.standard_normal((37, 512))
            blob, mx = native.pack_floats_maxabs(m, bits, little)
            assert blob == packing.pack_floats(m.reshape(-1), bits, little)
            np.testing.assert_allclose(mx, np.abs(m).max(axis=1))
