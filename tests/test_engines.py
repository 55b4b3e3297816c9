"""End-to-end engine tests: encode->decode round-trips, streaming
equivalence, corruption/ECC repair, resync, mid-stream reconfiguration
(SURVEY §4.1-4.6)."""

import numpy as np
import pytest

from frad_python_tpu import Decoder, Encoder, Repairer
from frad_python_tpu.common import FRM_SIGN

rng = np.random.default_rng(99)


def make_pcm(seconds=0.2, srate=44100, channels=2, fmt=np.dtype(">f8")):
    n = int(seconds * srate)
    t = np.arange(n) / srate
    sig = np.stack([0.4 * np.sin(2 * np.pi * (220 * (c + 1)) * t)
                    for c in range(channels)], axis=1)
    return sig, sig.astype(fmt).tobytes()


def encode_all(enc: Encoder, raw: bytes, chunk=32768) -> bytes:
    out = []
    for i in range(0, len(raw), chunk):
        out.append(enc.process(raw[i:i + chunk]).buf)
    out.append(enc.flush().buf)
    return b"".join(out)


def decode_all(dec: Decoder, stream: bytes, chunk=32768):
    pcm = []
    for i in range(0, len(stream), chunk):
        pcm.append(dec.process(stream[i:i + chunk]).pcm)
    pcm.append(dec.flush().pcm)
    return np.concatenate([p for p in pcm if p.size]) if any(p.size for p in pcm) else np.empty((0,))


def snr_db(ref, got):
    err = ref - got
    p = np.sum(ref ** 2)
    e = np.sum(err ** 2)
    return np.inf if e == 0 else 10 * np.log10(p / e)


class TestLosslessRoundtrip:
    @pytest.mark.parametrize("profile", [0, 4])
    def test_f64_roundtrip(self, profile):
        sig, raw = make_pcm()
        enc = Encoder(profile, 44100, 2, 64, 2048, "f64be")
        stream = encode_all(enc, raw)
        dec = Decoder()
        out = decode_all(dec, stream)
        assert out.shape == sig.shape
        if profile == 4:
            np.testing.assert_array_equal(out, sig)
        else:
            np.testing.assert_allclose(out, sig, atol=1e-12)

    def test_s16_input(self):
        sig, _ = make_pcm()
        raw = (sig * 32768).astype(">i2").tobytes()
        enc = Encoder(4, 44100, 2, 16, 2048, "s16be")
        stream = encode_all(enc, raw)
        out = decode_all(Decoder(), stream)
        want = (sig * 32768).astype(">i2").astype(np.float64) / 32768
        np.testing.assert_allclose(out, want, atol=2e-3)

    def test_frame_size_not_dividing_stream(self):
        sig, raw = make_pcm(seconds=0.1)  # 4410 samples, fsize 2048
        enc = Encoder(0, 44100, 2, 32, 2048, "f64be")
        out = decode_all(Decoder(), encode_all(enc, raw))
        assert out.shape == sig.shape
        assert snr_db(sig, out) > 120


class TestStreamingEquivalence:
    @pytest.mark.parametrize("chunk", [1, 17, 32768])
    def test_encoder_chunk_invariance(self, chunk):
        _, raw = make_pcm(seconds=0.05)
        ref_stream = encode_all(Encoder(4, 44100, 2, 64, 512, "f64be"), raw, chunk=32768)
        got_stream = encode_all(Encoder(4, 44100, 2, 64, 512, "f64be"), raw, chunk=chunk)
        assert got_stream == ref_stream

    @pytest.mark.parametrize("profile,bits,kw", [
        (4, 64, dict()),
        (0, 24, dict()),
        (1, 16, dict(overlap=16)),
        (1, 16, dict(overlap=16, ecc=True)),
        (0, 24, dict(ecc=True)),
        (1, 16, dict(overlap=0)),
    ])
    def test_deep_buffer_push_equals_per_frame(self, profile, bits, kw):
        """A one-shot deep push triggers Encoder._micro_batch (batched
        device dispatch); the stream must byte-equal the shallow-chunk
        per-frame path for every profile/overlap/ECC combination."""
        _, raw = make_pcm(seconds=1.0)
        fsize = 960                      # off-grid: compact rounds to 1024

        def build():
            e = Encoder(profile, 44100, 2, bits, fsize, "f64be")
            if "overlap" in kw:
                e.set_overlap_ratio(kw["overlap"])
            if kw.get("ecc"):
                e.set_ecc(True, (96, 24))
            return e

        frame_bytes = 1024 * 2 * 8
        ref = encode_all(build(), raw, chunk=frame_bytes // 2)  # < 1 frame/push
        deep = build()
        got = deep.process(raw).buf + deep.flush().buf
        assert got == ref

    def test_deep_push_resumes_per_frame_after_reconfig(self):
        """Micro-batch must fall back cleanly when the overlap fragment
        is off the standard carry grid (mid-stream frame-size change)."""
        _, raw = make_pcm(seconds=0.6)
        half = (len(raw) // 32) * 16

        def run(chunk):
            e = Encoder(1, 44100, 2, 16, 2048, "f64be")
            e.set_overlap_ratio(16)
            out = [e.process(raw[:half]).buf]
            e.set_frame_size(512)        # fragment now off the 512 grid
            for i in range(half, len(raw), chunk):
                out.append(e.process(raw[i:i + chunk]).buf)
            out.append(e.flush().buf)
            return b"".join(out)

        assert run(len(raw)) == run(4096)

    @pytest.mark.parametrize("chunk", [1, 17, 32768])
    def test_decoder_chunk_invariance(self, chunk):
        """Push granularity changes the decoder's batch grouping, which
        carries <= few-ulp f64 accumulation-order noise in the batched
        cores (PARITY.md 6b); the output must agree to that bound."""
        _, raw = make_pcm(seconds=0.05)
        stream = encode_all(Encoder(1, 44100, 2, 16, 512, "f64be"), raw)
        ref = decode_all(Decoder(), stream, chunk=32768)
        got = decode_all(Decoder(), stream, chunk=chunk)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-14)

    @pytest.mark.parametrize("chunk", [1, 17, 32768])
    def test_decoder_exact_mode_chunk_invariance(self, chunk):
        """Decoder(exact=True) takes the strictly per-frame path: decoded
        floats are BIT-identical across push granularities, matching the
        reference decoder's exact invariance (reference decoder.py:28-46)."""
        _, raw = make_pcm(seconds=0.05)
        stream = encode_all(Encoder(1, 44100, 2, 16, 512, "f64be"), raw)
        ref = decode_all(Decoder(exact=True), stream, chunk=32768)
        got = decode_all(Decoder(exact=True), stream, chunk=chunk)
        np.testing.assert_array_equal(got, ref)

    def test_decoder_run_to_run_deterministic(self):
        """Same stream bytes -> bit-identical PCM on EVERY decode, both
        micro-batched and exact paths (regression: XLA:CPU's DUCC FFT
        custom call plans by runtime thread availability, flipping every
        output element by ~1 ulp between runs until the package pinned
        xla_cpu_multi_thread_eigen=false at import)."""
        _, raw = make_pcm(seconds=0.3)
        enc = Encoder(1, 44100, 2, 16, 1024, "f64be")
        enc.set_overlap_ratio(16)
        stream = encode_all(enc, raw)
        for exact in (False, True):
            ref = decode_all(Decoder(exact=exact), stream)
            for _ in range(3):
                np.testing.assert_array_equal(
                    decode_all(Decoder(exact=exact), stream), ref)

    @pytest.mark.parametrize("profile,bits,kw", [
        (4, 64, dict()),
        (0, 24, dict()),
        (1, 16, dict(overlap=16)),
        (1, 16, dict(overlap=16, ecc=True)),
        (0, 24, dict(ecc=True)),
    ])
    def test_decoder_deep_push_equals_per_frame(self, profile, bits, kw):
        """A one-shot deep push hits Decoder._drain_pending's batched
        branch; its PCM must agree with the strictly per-frame (1-byte
        chunk) path to within the batched cores' few-ulp f64
        accumulation-order noise (PARITY.md 6b) at every chunking."""
        _, raw = make_pcm(seconds=0.6)
        enc = Encoder(profile, 44100, 2, bits, 1024, "f64be")
        if "overlap" in kw:
            enc.set_overlap_ratio(kw["overlap"])
        if kw.get("ecc"):
            enc.set_ecc(True, (96, 24))
        stream = encode_all(enc, raw)
        ref = decode_all(Decoder(fix_error=True), stream, chunk=1)
        for chunk in (1000, 10 ** 9):
            got = decode_all(Decoder(fix_error=True), stream, chunk=chunk)
            assert got.shape == ref.shape
            np.testing.assert_allclose(got, ref, atol=1e-14)

    def test_decoder_deep_push_mixed_runs(self):
        """A push holding runs with different headers (mid-stream bit
        depth change) must batch run-by-run and agree with per-frame."""
        _, raw = make_pcm(seconds=0.6)
        half = (len(raw) // 32) * 16
        enc = Encoder(0, 44100, 2, 24, 1024, "f64be")
        s1 = enc.process(raw[:half]).buf
        enc.set_bit_depth(32)
        s2 = enc.process(raw[half:]).buf + enc.flush().buf
        stream = s1 + s2
        ref = decode_all(Decoder(), stream, chunk=1)
        deep = Decoder()
        got = np.concatenate([p for p in (deep.process(stream).pcm,
                                          deep.flush().pcm) if p.size])
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-14)

    def test_decoder_deep_push_with_corrupt_frame(self):
        """The batched drain must preserve the zero-frame semantics for
        a payload corrupted beyond repair, matching per-frame pushes."""
        _, raw = make_pcm(seconds=0.4)
        enc = Encoder(1, 44100, 2, 16, 1024, "f64be")
        enc.set_overlap_ratio(16)
        stream = bytearray(encode_all(enc, raw))
        # flip payload bytes mid-file (past the 3rd frame header region)
        for off in range(len(stream) // 2, len(stream) // 2 + 6):
            stream[off] ^= 0x55
        stream = bytes(stream)
        ref = decode_all(Decoder(), stream, chunk=1)
        deep = Decoder()
        got = np.concatenate([p for p in (deep.process(stream).pcm,
                                          deep.flush().pcm) if p.size])
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-14)
        # the corrupted frame must decode to the SAME zero-frame region
        # in both paths (silence is exact)
        z_ref = np.flatnonzero((ref == 0).all(axis=1))
        z_got = np.flatnonzero((got == 0).all(axis=1))
        np.testing.assert_array_equal(z_got, z_ref)


class TestLossyRoundtrip:
    def test_profile1_snr_and_overlap(self):
        sig, raw = make_pcm(seconds=0.3, srate=48000)
        enc = Encoder(1, 48000, 2, 16, 2048, "f64be")
        enc.set_overlap_ratio(16)
        enc.set_loss_level(0.125)
        stream = encode_all(enc, raw)
        out = decode_all(Decoder(), stream)
        assert abs(len(out) - len(sig)) <= 2048 // 16 + 1
        m = min(len(out), len(sig))
        assert snr_db(sig[:m], out[:m]) > 15

    def test_profile1_no_overlap(self):
        sig, raw = make_pcm(seconds=0.2, srate=48000)
        enc = Encoder(1, 48000, 2, 16, 2048, "f64be")
        enc.set_overlap_ratio(0)
        out = decode_all(Decoder(), encode_all(enc, raw))
        # the final partial frame is padded up to the compact frame-size
        # grid (CSS transmits a table index), so the decoded stream may
        # carry trailing pad samples — same as the reference
        assert len(sig) <= len(out) < len(sig) + 2048
        assert out.shape[1] == 2
        assert snr_db(sig, out[:len(sig)]) > 15


class TestECC:
    def test_ecc_roundtrip_clean(self):
        sig, raw = make_pcm(seconds=0.05)
        enc = Encoder(4, 44100, 2, 64, 512, "f64be")
        enc.set_ecc(True, (96, 24))
        stream = encode_all(enc, raw)
        out = decode_all(Decoder(fix_error=True), stream)
        np.testing.assert_array_equal(out, sig)

    def test_ecc_repairs_corruption(self):
        sig, raw = make_pcm(seconds=0.05)
        enc = Encoder(4, 44100, 2, 64, 512, "f64be")
        enc.set_ecc(True, (96, 24))
        stream = bytearray(encode_all(enc, raw))
        # Corrupt a few payload bytes inside the first frame (header is 32B)
        for off in (40, 41, 42):
            stream[off] ^= 0xFF
        out = decode_all(Decoder(fix_error=True), bytes(stream))
        np.testing.assert_array_equal(out, sig)

    def test_corruption_without_repair_differs(self):
        sig, raw = make_pcm(seconds=0.05)
        enc = Encoder(4, 44100, 2, 64, 512, "f64be")
        enc.set_ecc(True, (96, 24))
        stream = bytearray(encode_all(enc, raw))
        stream[40] ^= 0xFF
        out = decode_all(Decoder(fix_error=False), bytes(stream))
        assert not np.array_equal(out, sig)

    def test_invalid_ratio_falls_back(self):
        enc = Encoder(4, 44100, 1, 16, 512, "f64be")
        msg = enc.set_ecc(True, (0, 10))
        assert msg is not None
        assert (enc.asfh.ecc_dsize, enc.asfh.ecc_codesize) == (96, 24)
        msg = enc.set_ecc(True, (200, 100))
        assert msg is not None
        assert (enc.asfh.ecc_dsize, enc.asfh.ecc_codesize) == (96, 24)


class TestResync:
    def test_garbage_prefix(self):
        sig, raw = make_pcm(seconds=0.05)
        stream = encode_all(Encoder(4, 44100, 2, 64, 512, "f64be"), raw)
        garbage = b"this is not frad data \x00\x01\x02" * 3
        assert FRM_SIGN not in garbage
        out = decode_all(Decoder(), garbage + stream)
        np.testing.assert_array_equal(out, sig)

    def test_truncated_frame_then_resync(self):
        sig, raw = make_pcm(seconds=0.05)
        enc = Encoder(4, 44100, 2, 64, 512, "f64be")
        stream = encode_all(enc, raw)
        # find the second frame boundary and cut part of the first payload
        second = stream.index(FRM_SIGN, 4)
        chopped = stream[: second - 100] + stream[second:]
        out = decode_all(Decoder(), chopped)
        # decoder should survive and still decode the following frames
        assert len(out) >= len(sig) - 2 * 512


class TestReconfiguration:
    def test_channel_change_flushes_and_crit(self):
        sig1, raw1 = make_pcm(seconds=0.05, channels=2)
        sig2, raw2 = make_pcm(seconds=0.05, channels=1)
        enc = Encoder(4, 44100, 2, 64, 512, "f64be")
        part1 = enc.process(raw1).buf + enc.flush().buf
        res = enc.set_profile(4, 44100, 1, 64, 512)
        part1 += res.buf if hasattr(res, "buf") else b""
        part2 = enc.process(raw2).buf + enc.flush().buf

        dec = Decoder()
        r1 = dec.process(part1 + part2)
        assert r1.crit
        assert r1.pcm.shape[1] == 2
        r2 = dec.process(b"")
        r3 = dec.flush()
        rest = np.concatenate([p for p in (r2.pcm, r3.pcm) if p.size])
        assert rest.shape[1] == 1
        np.testing.assert_array_equal(rest, sig2)

    def test_midstream_fsize_change(self):
        _, raw = make_pcm(seconds=0.05)
        enc = Encoder(4, 44100, 2, 64, 512, "f64be")
        b1 = enc.process(raw).buf
        enc.set_frame_size(1024)
        b2 = enc.process(raw).buf + enc.flush().buf
        out = decode_all(Decoder(), b1 + b2)
        assert len(out) == 2 * (len(raw) // 16)


class TestRepairer:
    def test_repair_adds_ecc_and_preserves_audio(self):
        sig, raw = make_pcm(seconds=0.05)
        stream = encode_all(Encoder(4, 44100, 2, 64, 512, "f64be"), raw)
        rep = Repairer((96, 24))
        armored = rep.process(stream) + rep.flush()
        assert len(armored) > len(stream)
        out = decode_all(Decoder(fix_error=True), armored)
        np.testing.assert_array_equal(out, sig)

    def test_repair_fixes_damaged_armored_stream(self):
        sig, raw = make_pcm(seconds=0.05)
        enc = Encoder(4, 44100, 2, 64, 512, "f64be")
        enc.set_ecc(True, (96, 24))
        stream = bytearray(encode_all(enc, raw))
        stream[50] ^= 0xAA
        rep = Repairer((96, 24))
        repaired = rep.process(bytes(stream)) + rep.flush()
        out = decode_all(Decoder(fix_error=False), repaired)
        np.testing.assert_array_equal(out, sig)

    def test_repair_continues_past_force_flush_terminator(self):
        """Frames AFTER a compact stream's force-flush terminator must
        still be re-armored in the same process() call (regression: the
        scanner used to starve at the terminator and flush the rest raw)."""
        sig, raw = make_pcm(seconds=0.05)
        enc1 = Encoder(1, 44100, 2, 16, 2048, "f64be")
        part1 = encode_all(enc1, raw)          # ends with terminators
        part2 = encode_all(Encoder(4, 44100, 2, 64, 512, "f64be"), raw)
        rep = Repairer((96, 24))
        out = rep.process(part1 + part2) + rep.flush()
        assert len(out) > len(part1) + len(part2)   # parity added throughout
        # every complete frame in the output must carry the ECC flag
        from frad_python_tpu.parallel.pipeline import _parse_frames
        headers, payloads, tail = _parse_frames(out)
        assert not tail
        armored = [h.ecc for h, p in zip(headers, payloads) if p is not None]
        assert armored and all(armored)
        decoded = decode_all(Decoder(fix_error=True), out)
        assert decoded.size

    def test_passthrough_of_non_frame_bytes(self):
        from frad_python_tpu.container import head
        hdr = head.builder([("k", b"v")], b"")
        _, raw = make_pcm(seconds=0.02)
        stream = encode_all(Encoder(4, 44100, 2, 64, 512, "f64be"), raw)
        rep = Repairer((96, 24))
        out = rep.process(hdr + stream) + rep.flush()
        assert out.startswith(hdr)


class TestValidation:
    def test_invalid_profile(self):
        with pytest.raises(ValueError):
            Encoder(3, 44100, 2, 16, 2048, "f64be")

    def test_invalid_compact_srate(self):
        with pytest.raises(ValueError):
            Encoder(1, 44101, 2, 16, 2048, "f64be")

    def test_invalid_depth(self):
        with pytest.raises(ValueError):
            Encoder(4, 44100, 2, 13, 2048, "f64be")

    def test_oversize_frame(self):
        with pytest.raises(ValueError):
            Encoder(1, 48000, 2, 16, 30000, "f64be")


class TestEngineState:
    def test_encoder_suspend_resume(self):
        _, raw = make_pcm(seconds=0.1)
        ref = encode_all(Encoder(4, 44100, 2, 64, 512, "f64be"), raw, chunk=1000)

        enc = Encoder(4, 44100, 2, 64, 512, "f64be")
        out = enc.process(raw[:5000]).buf
        state = enc.state_dict()

        enc2 = Encoder(4, 44100, 2, 64, 512, "f64be")
        enc2.load_state_dict(state)
        out += enc2.process(raw[5000:]).buf + enc2.flush().buf
        assert out == ref

    def test_decoder_suspend_resume(self):
        sig, raw = make_pcm(seconds=0.1, srate=48000)
        stream = encode_all(Encoder(1, 48000, 2, 16, 512, "f64be"), raw)
        dec = Decoder()
        p1 = dec.process(stream[:4000]).pcm
        state = dec.state_dict()
        dec2 = Decoder()
        dec2.load_state_dict(state)
        p2 = dec2.process(stream[4000:]).pcm
        p3 = dec2.flush().pcm
        got = np.concatenate([p for p in (p1, p2, p3) if p.size])
        ref = decode_all(Decoder(), stream)
        np.testing.assert_array_equal(got, ref)


class TestAdversarialInput:
    """The engines must never raise on hostile bytes — the reference's
    failure model (resync + zero-fill + passthrough) means ANY byte
    sequence is a valid input that produces a best-effort output."""

    def test_random_bytes_never_crash(self):
        from frad_python_tpu import Repairer
        r = np.random.default_rng(99)
        for seed in range(8):
            junk = r.integers(0, 256, size=int(r.integers(10, 60000)),
                              dtype=np.uint8).tobytes()
            d = Decoder(fix_error=True)
            d.process(junk)
            d.flush()
            rep = Repairer()
            out = rep.process(junk) + rep.flush()
            assert isinstance(out, bytes)

    def test_random_truncations_never_crash(self):
        """A valid stream cut at arbitrary positions (and the tail fed
        later) must decode without raising, on both decoder modes."""
        _, raw = make_pcm(seconds=0.3)
        enc = Encoder(1, 44100, 2, 16, 1024, "f64be")
        enc.set_overlap_ratio(16)
        enc.set_ecc(True, (96, 24))
        stream = encode_all(enc, raw)
        r = np.random.default_rng(7)
        cuts = sorted(int(c) for c in r.integers(1, len(stream), size=6))
        for exact in (False, True):
            d = Decoder(fix_error=True, exact=exact)
            prev = 0
            for c in cuts + [len(stream)]:
                d.process(stream[prev:c])
                prev = c
            d.flush()

    def test_bitflip_storm_never_crashes(self):
        """Heavy corruption (1% of bytes flipped) beyond RS capacity:
        decode must still terminate cleanly with best-effort output."""
        _, raw = make_pcm(seconds=0.3)
        enc = Encoder(1, 44100, 2, 16, 1024, "f64be")
        enc.set_ecc(True, (96, 24))
        stream = bytearray(encode_all(enc, raw))
        r = np.random.default_rng(3)
        for off in r.integers(0, len(stream), size=len(stream) // 100):
            stream[int(off)] ^= int(r.integers(1, 256))
        d = Decoder(fix_error=True)
        out = [d.process(bytes(stream)).pcm, d.flush().pcm]
        got = np.concatenate([p for p in out if p.size]) if any(
            p.size for p in out) else np.empty((0, 2))
        assert np.all(np.isfinite(got))
