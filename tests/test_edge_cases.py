"""Edge-case coverage: srate extremes, deep depths, multichannel,
mixed-depth escalation, ECC on compact streams, image metadata."""

import numpy as np
import pytest

from frad_python_tpu import Decoder, Encoder
from frad_python_tpu.parallel import batch_decode, batch_encode

rng = np.random.default_rng(1001)


def roundtrip(pcm, profile, srate, bits, fsize, ecc=False, overlap=16):
    enc = Encoder(profile, srate, pcm.shape[1], bits, fsize, "f64be")
    enc.set_overlap_ratio(overlap)
    if ecc:
        enc.set_ecc(True, (96, 24))
    stream = enc.process(pcm.astype(">f8").tobytes()).buf + enc.flush().buf
    dec = Decoder(fix_error=ecc)
    out = [dec.process(stream).pcm, dec.flush().pcm]
    return stream, np.concatenate([p for p in out if p.size])


def snr_db(a, b):
    e = np.sum((a - b) ** 2)
    return np.inf if e == 0 else 10 * np.log10(np.sum(a ** 2) / e)


class TestSrateExtremes:
    def test_p1_8khz(self):
        t = np.arange(4000) / 8000
        pcm = (0.5 * np.sin(2 * np.pi * 440 * t))[:, None]
        _, out = roundtrip(pcm, 1, 8000, 16, 512)
        m = min(len(pcm), len(out))
        assert snr_db(pcm[:m], out[:m]) > 10

    def test_p1_96khz_small_frames(self):
        # tiny frame at 96k: most subbands empty -> masking early-break path
        t = np.arange(2000) / 96000
        pcm = (0.5 * np.sin(2 * np.pi * 2000 * t))[:, None]
        _, out = roundtrip(pcm, 1, 96000, 16, 128)
        assert out.shape[1] == 1 and len(out) >= len(pcm)

    def test_p0_arbitrary_srate(self):
        pcm = rng.standard_normal((3000, 2)) * 0.4
        _, out = roundtrip(pcm, 0, 123457, 32, 1024, overlap=0)
        assert snr_db(pcm, out[: len(pcm)]) > 120


class TestDeepDepths:
    @pytest.mark.parametrize("bits", [48, 64])
    def test_p0_deep(self, bits):
        pcm = rng.standard_normal((2048, 2)) * 0.5
        _, out = roundtrip(pcm, 0, 44100, bits, 2048, overlap=0)
        assert snr_db(pcm, out[: len(pcm)]) > 180

    def test_p1_depth_64(self):
        # factor 2^63: wide-dynamic-range EGR symbols (host fallback path
        # in the batch pipeline)
        t = np.arange(4096) / 48000
        pcm = (0.4 * np.sin(2 * np.pi * 440 * t))[:, None]
        stream = batch_encode(pcm, 1, 48000, 64, 2048)
        out, _ = batch_decode(stream)
        m = min(len(pcm), len(out))
        assert snr_db(pcm[:m], out[:m]) > 15


class TestMultichannel:
    def test_p1_8ch(self):
        t = np.arange(4096) / 48000
        pcm = np.stack([0.4 * np.sin(2 * np.pi * 220 * (c + 1) * t)
                        for c in range(8)], 1)
        _, out = roundtrip(pcm, 1, 48000, 16, 2048)
        assert out.shape[1] == 8
        m = min(len(pcm), len(out))
        assert snr_db(pcm[:m], out[:m]) > 12

    def test_p4_many_channels(self):
        pcm = rng.standard_normal((1000, 32)) * 0.3
        _, out = roundtrip(pcm, 4, 44100, 64, 256, overlap=0)
        np.testing.assert_array_equal(out, pcm)


class TestDepthEscalation:
    def test_mixed_depth_frames_batch_vs_streaming(self):
        """Loud frames escalate depth; grouped packing must still be
        byte-exact with the per-frame streaming encoder."""
        pcm = rng.standard_normal((4096, 1)) * 0.1
        pcm[1024:2048] *= 1e6   # exceeds f16 max -> escalates 16 -> 24
        enc = Encoder(4, 44100, 1, 16, 1024, "f64be")
        ref = enc.process(pcm.astype(">f8").tobytes()).buf + enc.flush().buf
        got = batch_encode(pcm, 4, 44100, 16, 1024)
        assert got == ref
        # decode reproduces both regions
        out, _ = batch_decode(got)
        assert snr_db(pcm, out[: len(pcm)]) > 50


class TestCompactECC:
    def test_p1_ecc_crc16_repair(self):
        t = np.arange(8192) / 48000
        pcm = (0.4 * np.sin(2 * np.pi * 440 * t))[:, None]
        stream, clean = roundtrip(pcm, 1, 48000, 16, 2048, ecc=True)
        # corrupt payload bytes (skip the 16-byte compact+ecc header)
        damaged = bytearray(stream)
        damaged[20] ^= 0x42
        damaged[21] ^= 0x99
        dec = Decoder(fix_error=True)
        outs = [dec.process(bytes(damaged)).pcm, dec.flush().pcm]
        out = np.concatenate([p for p in outs if p.size])
        np.testing.assert_allclose(out, clean, atol=1e-12)


class TestImageMetadata:
    def test_cli_image_embed_parse_rmimg(self, tmp_path, monkeypatch):
        from frad_python_tpu.app.main import main
        pcm = tmp_path / "x.pcm"
        pcm.write_bytes((rng.standard_normal((2000, 1)) * 1000).astype(">i2").tobytes())
        img = tmp_path / "cover.png"
        img.write_bytes(b"\x89PNG\r\n\x1a\n" + bytes(range(256)))
        frad = tmp_path / "x.frad"
        main(["t", "encode", str(pcm), "--srate", "44100", "--ch", "1",
              "--pcm", "s16be", "-o", str(frad), "-y", "--img", str(img)])
        monkeypatch.chdir(tmp_path)
        main(["t", "meta", "parse", str(frad)])
        assert (tmp_path / "x.png").read_bytes() == img.read_bytes()

        main(["t", "meta", "rm-img", str(frad)])
        (tmp_path / "x.png").unlink()
        main(["t", "meta", "parse", str(frad)])
        assert not (tmp_path / "x.png").exists()

    def test_headerless_file_meta_add(self, tmp_path):
        """meta on a frame-first (headerless) file splices a new header."""
        from frad_python_tpu.app.main import main
        pcm = rng.standard_normal((2000, 1)) * 0.3
        stream = batch_encode(pcm, 4, 44100, 16, 512)
        f = tmp_path / "raw.frad"
        f.write_bytes(stream)
        main(["t", "meta", "add", str(f), "--meta", "K", "V"])
        data = f.read_bytes()
        assert data[:4] == b"fRad"
        out, _ = batch_decode(data)
        assert len(out) >= 2000


class TestCliMultiFormatDecode:
    def test_turbo_decode_rotates_outputs(self, tmp_path):
        from frad_python_tpu.app.main import main
        a = (rng.standard_normal((3000, 2)) * 0.3)
        b = (rng.standard_normal((2000, 1)) * 0.3)
        s1 = batch_encode(a, 4, 44100, 64, 512)
        s2 = batch_encode(b, 4, 48000, 64, 512)
        f = tmp_path / "multi.frad"
        f.write_bytes(s1 + s2)
        out = tmp_path / "out"
        main(["t", "decode", str(f), "-o", str(out), "-y"])
        got1 = np.frombuffer((tmp_path / "out.pcm").read_bytes(), ">f8").reshape(-1, 2)
        got2 = np.frombuffer((tmp_path / "out.1.pcm").read_bytes(), ">f8").reshape(-1, 1)
        np.testing.assert_array_equal(got1, a)
        np.testing.assert_array_equal(got2, b)
