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
