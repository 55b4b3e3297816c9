"""Container-layer conformance: CRC, ASFH frame headers, file header.

Golden byte-level checks per SURVEY §4.2; oracle values derived from the
FrAD format spec (field layouts at reference asfh.py:6-32,51-73).
"""

import struct

import pytest

from frad_python_tpu.common import FRM_SIGN, SIGNATURE, crc16_ansi, crc32
from frad_python_tpu.container import head
from frad_python_tpu.container.asfh import (
    ASFH, COMPLETE, FORCE_FLUSH, INCOMPLETE, decode_css, decode_pfb,
    encode_css, encode_pfb,
)


class TestCRC:
    def test_crc16_ansi_check_value(self):
        # CRC-16/ARC catalogue check value
        assert crc16_ansi(b"123456789") == 0xBB3D

    def test_crc16_empty(self):
        assert crc16_ansi(b"") == 0

    def test_crc32_check_value(self):
        assert crc32(b"123456789") == 0xCBF43926


class TestPFB:
    @pytest.mark.parametrize("profile,ecc,le,bdi", [
        (0, False, False, 0), (1, True, False, 5), (4, False, True, 3),
        (7, True, True, 7), (2, True, False, 1),
    ])
    def test_roundtrip(self, profile, ecc, le, bdi):
        assert decode_pfb(encode_pfb(profile, ecc, le, bdi)) == (profile, ecc, le, bdi)

    def test_bit_layout(self):
        # profile in top 3 bits, ecc bit 4, endian bit 3, depth low 3
        assert encode_pfb(4, False, False, 0) == 0b100_0_0_000
        assert encode_pfb(1, True, True, 5) == 0b001_1_1_101


class TestCSS:
    def test_roundtrip(self):
        for ch in (1, 2, 8, 64):
            for srate in (96000, 44100, 8000):
                for fsize in (128, 2048, 28672):
                    got = decode_css(encode_css(ch, srate, fsize, False))
                    assert got == (ch, srate, fsize, False)

    def test_force_flush_bit(self):
        assert decode_css(encode_css(2, 48000, 2048, True))[3] is True

    def test_layout(self):
        # channels-1 << 10 | srate_idx << 6 | fsize_idx << 1 | flush
        v = encode_css(3, 48000, 2048, False)
        assert v >> 10 == 2
        assert (v >> 6) & 0xF == 3       # 48000 is index 3
        assert (v >> 1) & 0x1F == 16     # 2048 is index 16
        assert v & 1 == 0


def make_asfh(profile=0, **kw) -> ASFH:
    a = ASFH()
    a.profile = profile
    a.channels = kw.get("channels", 2)
    a.srate = kw.get("srate", 44100 if profile not in (1, 2) else 48000)
    a.fsize = kw.get("fsize", 2048)
    a.bit_depth_index = kw.get("bit_depth_index", 1)
    a.ecc = kw.get("ecc", False)
    a.ecc_dsize = kw.get("ecc_dsize", 0)
    a.ecc_codesize = kw.get("ecc_codesize", 0)
    a.endian = kw.get("endian", False)
    a.overlap_ratio = kw.get("overlap_ratio", 0)
    return a


class TestASFH:
    @pytest.mark.parametrize("profile", [0, 4])
    def test_lossless_header_layout(self, profile):
        a = make_asfh(profile, srate=95999, fsize=7777)
        payload = b"hello frad payload"
        frame = a.write(payload)
        assert frame[:4] == FRM_SIGN
        assert struct.unpack(">I", frame[4:8])[0] == len(payload)
        assert len(frame) == 32 + len(payload)
        assert struct.unpack(">I", frame[12:16])[0] == 95999
        assert struct.unpack(">I", frame[24:28])[0] == 7777
        assert struct.unpack(">I", frame[28:32])[0] == crc32(payload)

    def test_compact_header_sizes(self):
        a = make_asfh(1, srate=48000, overlap_ratio=16)
        frame = a.write(b"x" * 100)
        assert len(frame) == 12 + 100
        a.ecc, a.ecc_dsize, a.ecc_codesize = True, 96, 24
        frame = a.write(b"x" * 100)
        assert len(frame) == 16 + 100
        assert struct.unpack(">H", frame[14:16])[0] == crc16_ansi(b"x" * 100)

    @pytest.mark.parametrize("profile,ecc,olap", [
        (0, False, 0), (0, True, 0), (4, True, 0),
        (1, False, 16), (1, True, 2), (2, True, 256),
    ])
    def test_write_read_roundtrip(self, profile, ecc, olap):
        a = make_asfh(profile, ecc=ecc, ecc_dsize=96, ecc_codesize=24,
                      overlap_ratio=olap)
        payload = bytes(range(256)) * 3
        frame = a.write(payload)

        b = ASFH()
        status, rest = b.read(frame)
        assert status == COMPLETE
        assert b.frmbytes == len(payload)
        assert rest == payload
        assert (b.profile, b.channels, b.srate, b.ecc) == (a.profile, a.channels, a.srate, ecc)
        if profile in (1, 2):
            assert b.fsize == a.fsize
            assert b.overlap_ratio == olap
        if ecc:
            assert (b.ecc_dsize, b.ecc_codesize) == (96, 24)
            assert b.payload_crc_matches(payload)
            assert not b.payload_crc_matches(payload + b"!")

    def test_incremental_parse_byte_at_a_time(self):
        a = make_asfh(1, srate=48000, ecc=True, ecc_dsize=96, ecc_codesize=24,
                      overlap_ratio=16)
        frame = a.write(b"payload-bytes")
        b = ASFH()
        rest = b""
        for i in range(len(frame)):
            status, rest = b.read(rest + frame[i:i + 1])
            if status == COMPLETE:
                break
            assert status == INCOMPLETE
        assert status == COMPLETE
        assert frame[i + 1:].startswith(rest + b"payload-bytes"[len(rest):]) or rest == b""

    def test_force_flush_roundtrip(self):
        a = make_asfh(1, srate=48000, overlap_ratio=16)
        term = a.force_flush()
        assert len(term) == 12
        b = ASFH()
        status, rest = b.read(term)
        assert status == FORCE_FLUSH
        assert rest == b""

    def test_force_flush_lossless_is_empty(self):
        assert make_asfh(0).force_flush() == b""
        assert make_asfh(4).force_flush() == b""

    def test_extended_64bit_frame_size(self):
        # Synthesise a lossless header claiming the 0xFFFFFFFF escape.
        a = make_asfh(0)
        payload = b"Z" * 50
        frame = bytearray(a.write(payload))
        frame[4:8] = b"\xff\xff\xff\xff"
        ext = struct.pack(">Q", len(payload))
        raw = bytes(frame[:32]) + ext + payload
        b = ASFH()
        status, rest = b.read(raw)
        assert status == COMPLETE
        assert b.frmbytes == len(payload)
        assert rest == payload


class TestHead:
    def test_roundtrip_meta_and_image(self):
        meta = [("TITLE", "Song".encode()), ("artist", "Me éé".encode()),
                ("blob", bytes(range(256)))]
        img = b"\x89PNG fake image data" * 10
        hdr = head.builder(meta, img)
        assert hdr[:4] == SIGNATURE
        assert int.from_bytes(hdr[8:16], "big") == len(hdr)
        got_meta, got_img = head.parser(hdr[64:])
        assert got_meta == meta
        assert got_img == img

    def test_empty(self):
        hdr = head.builder([], b"")
        assert len(hdr) == 64
        assert head.parser(hdr[64:]) == ([], b"")

    def test_parser_skips_garbage(self):
        hdr = head.builder([("k", b"v")], b"")
        blocks = b"\x01\x02garbage" + hdr[64:]
        meta, _ = head.parser(blocks)
        assert meta == [("k", b"v")]
