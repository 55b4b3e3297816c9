"""Cross-implementation wire compatibility with the reference encoder.

Runs the reference FrAD_Python implementation in-process (read-only from
/root/reference) and checks that
  * our decoder decodes reference-encoded streams (all profiles), and
  * the reference decoder decodes our streams,
with lossless payloads sample-exact and lossy payloads SNR-equivalent.
The reference's `reedsolo` dependency is shimmed with our RS module
(wire-compatible GF(256), verified by codeword-root tests in test_ops).

Skipped when the reference tree is not present.
"""

import pathlib
import sys
import types

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/src")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference tree not mounted")

rng = np.random.default_rng(33)


@pytest.fixture(scope="module")
def reference():
    from frad_python_tpu.ops import rs as _rs

    mod = types.ModuleType("reedsolo")

    class ReedSolomonError(Exception):
        pass

    class RSCodec:
        def __init__(self, nsym, nsize=255, *a, **k):
            self.nsym = nsym

        def encode(self, data):
            arr = np.frombuffer(bytes(data), dtype=np.uint8)
            parity = _rs.encode_blocks(arr[None, :], self.nsym)[0]
            return bytearray(arr.tobytes() + parity.tobytes())

        def decode(self, data):
            arr = np.frombuffer(bytes(data), dtype=np.uint8)
            fixed, ok = _rs.decode_blocks(arr[None, :], self.nsym)
            if not ok[0]:
                raise ReedSolomonError("uncorrectable")
            return bytearray(fixed[0].tobytes()), bytearray(bytes(data)), []

    mod.RSCodec = RSCodec
    mod.ReedSolomonError = ReedSolomonError
    sys.modules.setdefault("reedsolo", mod)
    sys.path.insert(0, str(REF))
    import libfrad as ref_libfrad

    yield ref_libfrad
    sys.path.remove(str(REF))


def tone(n=6000, ch=2, srate=44100):
    t = np.arange(n) / srate
    return np.stack([0.5 * np.sin(2 * np.pi * 220 * (c + 1) * t)
                     for c in range(ch)], axis=1) + 0.002 * rng.standard_normal((n, ch))


def snr_db(ref, got):
    e = np.sum((ref - got) ** 2)
    return np.inf if e == 0 else 10 * np.log10(np.sum(ref ** 2) / e)


def ours_decode(stream, fix=False):
    from frad_python_tpu import Decoder
    d = Decoder(fix_error=fix)
    parts = [d.process(stream).pcm, d.flush().pcm]
    return np.concatenate([p for p in parts if p.size])


def ref_decode(reference, stream, fix=False):
    d = reference.Decoder(fix_error=fix)
    parts = [d.process(stream).pcm, d.flush().pcm]
    parts = [p for p in parts if p.size]
    return np.concatenate(parts) if parts else np.empty((0,))


@pytest.mark.parametrize("profile,bits,ecc", [
    (4, 64, False), (4, 24, False), (0, 24, False), (0, 64, True), (1, 16, False),
    (1, 16, True),
])
def test_ours_decodes_reference_stream(reference, profile, bits, ecc):
    sig = tone()
    enc = reference.Encoder(profile, 44100, 2, bits, 2048, "f64be")
    if ecc:
        enc.set_ecc(True, (96, 24))
    if profile == 1:
        enc.set_overlap_ratio(16)
        enc.set_loss_level(0.25)
    stream = enc.process(sig.astype(">f8").tobytes()).buf + enc.flush().buf

    ref_out = ref_decode(reference, stream, fix=ecc)
    our_out = ours_decode(stream, fix=ecc)
    assert our_out.shape == ref_out.shape
    np.testing.assert_allclose(our_out, ref_out, atol=1e-9)
    m = min(len(sig), len(our_out))
    if profile in (0, 4):
        assert snr_db(sig[:m], our_out[:m]) > (55 if bits == 24 else 200)


@pytest.mark.parametrize("profile,bits,ecc", [
    (4, 64, False), (0, 24, False), (0, 64, True), (1, 16, False), (1, 16, True),
])
def test_reference_decodes_our_stream(reference, profile, bits, ecc):
    from frad_python_tpu import Encoder
    sig = tone()
    enc = Encoder(profile, 44100, 2, bits, 2048, "f64be")
    if ecc:
        enc.set_ecc(True, (96, 24))
    if profile == 1:
        enc.set_overlap_ratio(16)
        enc.set_loss_level(0.25)
    stream = enc.process(sig.astype(">f8").tobytes()).buf + enc.flush().buf

    ref_out = ref_decode(reference, stream, fix=ecc)
    our_out = ours_decode(stream, fix=ecc)
    assert ref_out.shape == our_out.shape
    np.testing.assert_allclose(ref_out, our_out, atol=1e-9)


def test_reference_repairs_our_damaged_ecc_stream(reference):
    """Reference RS repair must fix corruption in OUR armored stream —
    proves GF(256) parity bytes are wire-identical."""
    from frad_python_tpu import Encoder
    sig = tone(3000)
    enc = Encoder(4, 44100, 2, 64, 512, "f64be")
    enc.set_ecc(True, (96, 24))
    stream = bytearray(enc.process(sig.astype(">f8").tobytes()).buf + enc.flush().buf)
    stream[40] ^= 0xFF
    stream[41] ^= 0xA5
    out = ref_decode(reference, bytes(stream), fix=True)
    np.testing.assert_array_equal(out, sig)


def test_snr_parity_profile1(reference):
    """Our lossy encode must reach at least the reference's SNR on the
    same audio (BASELINE.json north star)."""
    from frad_python_tpu import Encoder
    sig = tone(12000, srate=48000)

    def encode_with(encoder_cls, set_ll):
        enc = encoder_cls(1, 48000, 2, 16, 2048, "f64be")
        enc.set_overlap_ratio(16)
        set_ll(enc)
        return enc.process(sig.astype(">f8").tobytes()).buf + enc.flush().buf

    s_ref = encode_with(reference.Encoder, lambda e: e.set_loss_level(0.5))
    s_our = encode_with(Encoder, lambda e: e.set_loss_level(0.5))

    out_ref = ref_decode(reference, s_ref)
    out_our = ours_decode(s_our)
    m = min(len(sig), len(out_ref), len(out_our))
    snr_ref = snr_db(sig[:m], out_ref[:m])
    snr_our = snr_db(sig[:m], out_our[:m])
    assert snr_our >= snr_ref - 0.1, (snr_our, snr_ref)
    # bitrate must not regress materially either
    assert len(s_our) <= len(s_ref) * 1.02
