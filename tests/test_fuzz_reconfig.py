"""Mid-stream reconfiguration fuzz (SURVEY §4.5).

The reference author stress-tested mid-stream reconfiguration with a
commented-out randomized harness inside the encoder hot loop
(reference encoder.py:61-70) that switches profile/bit-depth/frame-size/
loss-level/ECC/overlap every frame. This is that harness as a real
property test: after every random reconfiguration the full stream must
still decode to the right number of channels with no crashes, resync
losses, or CRC failures.
"""

import numpy as np
import pytest

from frad_python_tpu import Decoder, Encoder
from frad_python_tpu.models import AVAILABLE, BIT_DEPTHS, COMPACT
from frad_python_tpu.models.profiles import compact


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_reconfig_stream_decodes(seed):
    rng = np.random.default_rng(seed)
    srate, ch = 48000, 2
    enc = Encoder(1, srate, ch, 16, 1024, "f64be")

    stream_parts = []
    total_samples = 0
    for step in range(12):
        profile = int(rng.choice(AVAILABLE))
        depths = [d for d in BIT_DEPTHS[profile] if d]
        bit_depth = int(rng.choice(depths))
        if profile in COMPACT:
            fsize = int(rng.choice(compact.SAMPLES[:20]))
        else:
            fsize = int(rng.integers(128, 4096))
        res = enc.set_profile(profile, srate, ch, bit_depth, fsize)
        assert not isinstance(res, str), res
        stream_parts.append(res.buf)

        enc.set_loss_level(float(rng.uniform(0.125, 10.0)))
        dsize = int(rng.integers(1, 200))
        enc.set_ecc(bool(rng.random() < 0.5), (dsize, int(rng.integers(0, 255 - dsize))))
        enc.set_overlap_ratio(int(rng.integers(2, 64)))

        n = int(rng.integers(100, 5000))
        total_samples += n
        pcm = (rng.standard_normal((n, ch)) * 0.3).astype(">f8")
        stream_parts.append(enc.process(pcm.tobytes()).buf)
    stream_parts.append(enc.flush().buf)
    stream = b"".join(stream_parts)

    dec = Decoder(fix_error=True)
    decoded = 0
    buf = stream
    # decoder may return early on crit; keep pushing
    out = dec.process(buf)
    decoded += len(out.pcm)
    while True:
        out = dec.process(b"")
        if len(out.pcm) == 0 and not out.crit:
            break
        decoded += len(out.pcm)
    decoded += len(dec.flush().pcm)
    # all samples must come out (compact tails may add grid padding)
    assert decoded >= total_samples
    assert decoded <= total_samples + 12 * compact.MAX_SMPL


@pytest.mark.parametrize("chunk", [7, 32768])
def test_reconfig_stream_chunked_decode_equivalence(chunk):
    rng = np.random.default_rng(42)
    srate, ch = 44100, 2
    enc = Encoder(4, srate, ch, 16, 512, "f64be")
    parts = []
    for profile, bits, fsize in ((4, 64, 512), (0, 24, 1024), (1, 16, 2048), (4, 16, 256)):
        res = enc.set_profile(profile, srate, ch, bits, fsize)
        parts.append(res.buf if hasattr(res, "buf") else b"")
        pcm = (rng.standard_normal((3000, ch)) * 0.3).astype(">f8")
        parts.append(enc.process(pcm.tobytes()).buf)
    parts.append(enc.flush().buf)
    stream = b"".join(parts)

    def decode_chunked(c):
        d = Decoder()
        outs = []
        for i in range(0, len(stream), c):
            outs.append(d.process(stream[i:i + c]).pcm)
        while True:
            r = d.process(b"")
            if not len(r.pcm) and not r.crit:
                break
            outs.append(r.pcm)
        outs.append(d.flush().pcm)
        return np.concatenate([p for p in outs if p.size])

    a = decode_chunked(chunk)
    b = decode_chunked(len(stream))
    # push granularity changes the decoder's batch grouping, which
    # carries few-ulp f64 accumulation-order noise (PARITY.md 6b)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-14)
