"""Profile kernel round-trips: bit-exact lossless, SNR-bounded lossy
(SURVEY §4.1)."""

import numpy as np
import pytest

from frad_python_tpu.models import profile0, profile1, profile2, profile4

rng = np.random.default_rng(7)


def snr_db(ref, got):
    err = ref - got
    p_sig = np.sum(ref ** 2)
    p_err = np.sum(err ** 2)
    if p_err == 0:
        return np.inf
    return 10 * np.log10(p_sig / p_err)


class TestProfile4:
    @pytest.mark.parametrize("bits,tol", [(12, 5e-2), (16, 4e-3), (24, 2e-4),
                                          (32, 5e-7), (48, 1e-10), (64, 0.0)])
    @pytest.mark.parametrize("le", [False, True])
    def test_roundtrip(self, bits, tol, le):
        pcm = rng.standard_normal((512, 2)) * 0.7
        frad, bdi, ch, sr = profile4.analogue(pcm, bits, 44100, le)
        assert (ch, sr) == (2, 44100)
        assert profile4.DEPTHS[bdi] == bits
        back = profile4.digital(frad, bdi, ch, le)
        assert back.shape == pcm.shape
        if tol == 0.0:
            np.testing.assert_array_equal(back, pcm)
        else:
            np.testing.assert_allclose(back, pcm, atol=tol)

    def test_depth_escalation_on_overflow(self):
        pcm = np.full((64, 1), 1e6)  # exceeds f16 max
        frad, bdi, *_ = profile4.analogue(pcm, 16, 44100, False)
        assert profile4.DEPTHS[bdi] == 24
        back = profile4.digital(frad, bdi, 1, False)
        np.testing.assert_allclose(back, pcm, rtol=1e-6)

    def test_invalid_bits_falls_back_to_16(self):
        pcm = rng.standard_normal((64, 1))
        _, bdi, *_ = profile4.analogue(pcm, 13, 44100, False)
        assert profile4.DEPTHS[bdi] == 16


class TestProfile0:
    @pytest.mark.parametrize("bits,snr_min", [(12, 35), (16, 55), (24, 95),
                                              (32, 125), (48, 195), (64, 250)])
    def test_roundtrip_snr(self, bits, snr_min):
        t = np.arange(2048) / 44100
        pcm = np.stack([np.sin(2 * np.pi * 440 * t), np.sin(2 * np.pi * 1000 * t)], 1) * 0.5
        frad, bdi, ch, sr = profile0.analogue(pcm, bits, 44100, False)
        back = profile0.digital(frad, bdi, ch, False)
        assert back.shape == pcm.shape
        assert snr_db(pcm, back) > snr_min

    def test_64bit_near_exact(self):
        pcm = rng.standard_normal((1024, 2))
        frad, bdi, ch, _ = profile0.analogue(pcm, 64, 48000, False)
        back = profile0.digital(frad, bdi, ch, False)
        np.testing.assert_allclose(back, pcm, atol=1e-12)

    @pytest.mark.parametrize("le", [False, True])
    def test_endianness(self, le):
        pcm = rng.standard_normal((256, 1))
        frad, bdi, ch, _ = profile0.analogue(pcm, 24, 44100, le)
        back = profile0.digital(frad, bdi, ch, le)
        assert snr_db(pcm, back) > 90

    def test_multichannel(self):
        pcm = rng.standard_normal((512, 8)) * 0.3
        frad, bdi, ch, _ = profile0.analogue(pcm, 32, 96000, False)
        assert ch == 8
        back = profile0.digital(frad, bdi, ch, False)
        assert snr_db(pcm, back) > 120


class TestProfile1:
    @pytest.mark.parametrize("fsize", [128, 1024, 2048])
    def test_roundtrip_tonal_snr(self, fsize):
        t = np.arange(fsize) / 48000
        pcm = np.stack([np.sin(2 * np.pi * 440 * t), 0.5 * np.sin(2 * np.pi * 880 * t)], 1) * 0.6
        frad, bdi, ch, sr = profile1.analogue(pcm, 16, 48000, 0.125)
        assert sr == 48000
        back = profile1.digital(frad, bdi, ch, sr, fsize)
        assert back.shape == (fsize, 2)
        assert snr_db(pcm, back) > 20

    def test_srate_coerced_to_compact(self):
        pcm = rng.standard_normal((512, 1)) * 0.1
        _, _, _, sr = profile1.analogue(pcm, 16, 44100, 0.5)
        assert sr == 44100   # 44100 is a valid compact rate
        _, _, _, sr = profile1.analogue(pcm, 16, 40000, 0.5)
        assert sr == 44100   # coerced up

    def test_pad_to_compact_size(self):
        pcm = rng.standard_normal((1000, 2)) * 0.2
        frad, bdi, ch, sr = profile1.analogue(pcm, 16, 48000, 0.5)
        back = profile1.digital(frad, bdi, ch, sr, 1024)
        assert back.shape == (1024, 2)

    def test_corrupt_deflate_gives_silence(self):
        back = profile1.digital(b"\x00\x01\x02", 2, 2, 48000, 1024)
        assert back.shape == (1024, 2)
        assert not back.any()

    def test_compresses(self):
        t = np.arange(2048) / 48000
        pcm = np.sin(2 * np.pi * 440 * t)[:, None] * 0.5
        frad, *_ = profile1.analogue(pcm, 16, 48000, 1.0)
        # 2048 f64 samples = 16 KiB raw; lossy tonal frame must be far smaller
        assert len(frad) < 4000

    def test_loss_level_tradeoff(self):
        x = rng.standard_normal((2048, 2)) * 0.3
        lo, *_ = profile1.analogue(x, 16, 48000, 0.125)
        hi, *_ = profile1.analogue(x, 16, 48000, 10.0)
        assert len(hi) < len(lo)


class TestProfile2:
    @pytest.mark.parametrize("fsize", [512, 2048])
    def test_roundtrip_snr(self, fsize):
        t = np.arange(fsize) / 48000
        pcm = np.stack([np.sin(2 * np.pi * 440 * t),
                        np.sin(2 * np.pi * 1320 * t)], 1) * 0.6
        frad, bdi, ch, sr = profile2.analogue(pcm, 16, 48000, 0.125)
        back = profile2.digital(frad, bdi, ch, sr, fsize)
        assert back.shape == (fsize, 2)
        assert snr_db(pcm, back) > 18

    def test_noise_roundtrip(self):
        pcm = rng.standard_normal((1024, 1)) * 0.3
        frad, bdi, ch, sr = profile2.analogue(pcm, 16, 48000, 0.25)
        back = profile2.digital(frad, bdi, ch, sr, 1024)
        assert back.shape == (1024, 1)
        assert snr_db(pcm, back) > 5

    def test_corrupt_deflate_gives_silence(self):
        back = profile2.digital(b"\x99\x88", 2, 1, 48000, 512)
        assert back.shape == (512, 1)
        assert not back.any()
