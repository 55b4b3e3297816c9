"""Archival (48/64-bit) lossless depths always get the f64 transform.

VERDICT r1 #6 / SURVEY §7 hard part (b): on a TPU backend the f32 compute
dtype carries ~1e-7 transform noise — unacceptable for containers that
store 36/52 mantissa bits. policy.transform_dtype routes deep depths to
the f64 program (on the CPU backend when the accelerator has no native
f64), so deep-depth streams are byte-identical across backends. These
tests simulate the TPU session by forcing compute dtype / the pipeline's
`compute_dtype="float32"` argument on the CPU rig.
"""

import numpy as np
import pytest

from frad_python_tpu.models import profile0
from frad_python_tpu.ops import policy
from frad_python_tpu.parallel import batch_decode, batch_encode

rng = np.random.default_rng(21)


@pytest.fixture
def f32_policy(monkeypatch):
    """Simulate the TPU session's compute-dtype policy on the CPU rig."""
    monkeypatch.setenv("FRAD_TPU_COMPUTE_DTYPE", "float32")
    policy.compute_dtype.cache_clear()
    yield
    policy.compute_dtype.cache_clear()


def _pcm(frames=6, n=512, ch=2):
    return rng.standard_normal((frames * n, ch)) * 0.5


class TestStreamingDeepDepth:
    @pytest.mark.parametrize("bits", [48, 64])
    def test_payload_identical_to_f64_policy(self, f32_policy, bits):
        pcm = _pcm(1)[:512]
        frad32, bdi32, *_ = profile0.analogue(pcm, bits, 44100, False)
        policy.compute_dtype.cache_clear()
        import os

        del os.environ["FRAD_TPU_COMPUTE_DTYPE"]
        frad64, bdi64, *_ = profile0.analogue(pcm, bits, 44100, False)
        assert frad32 == frad64 and bdi32 == bdi64
        back = profile0.digital(frad32, bdi32, 2, False)
        err = back - pcm
        snr = 10 * np.log10(np.sum(pcm**2) / max(np.sum(err**2), 1e-300))
        assert snr > (195 if bits == 48 else 250)

    def test_shallow_depths_keep_f32_under_f32_policy(self, f32_policy):
        pcm = _pcm(1)[:512]
        frad, bdi, *_ = profile0.analogue(pcm, 24, 44100, False)
        back = profile0.digital(frad, bdi, 2, False)
        # f32 transform noise visible but bounded (24-bit container regime)
        assert 90 < 10 * np.log10(np.sum(pcm**2) / np.sum((back - pcm) ** 2)) < 200

    def test_escalation_through_f32_overflow(self, f32_policy):
        # coefficients beyond f32 range: the f32 transform sees inf; the
        # deep recompute must kick in and escalate 32 -> 48 losslessly
        pcm = np.full((256, 1), 1e39)
        frad, bdi, *_ = profile0.analogue(pcm, 32, 44100, False)
        assert profile0.DEPTHS[bdi] == 48
        back = profile0.digital(frad, bdi, 1, False)
        np.testing.assert_allclose(back, pcm, rtol=1e-9)


class TestOnDeviceDeepPath:
    """48-bit archival transform ON the accelerator (VERDICT r3 #4).

    policy.deep_on_device routes the 48-bit f64 DCT to the device as a
    matmul (no complex128 on TPU for the FFT form). These tests run the
    SAME code path on the CPU rig: the forced-matmul f64 formulation vs
    the host FFT must agree within one ulp of the 48-bit container
    (36-bit mantissa), and the full stream round trip must hold
    archival quality with the device branch patched active.
    """

    def test_forced_matmul_f64_within_one_ulp48(self):
        from frad_python_tpu.ops import dct
        x = rng.standard_normal((4, 2048, 2))
        a = np.asarray(dct.dct2_forward(x, axis=1))            # f64 FFT
        b = np.asarray(dct.dct2_forward(x, axis=1, force_matmul=True))
        # 1 ulp of the 48-bit container = 2^-36 relative to the frame
        # peak; the matmul path must sit well inside it
        assert np.abs(a - b).max() / np.abs(a).max() < 2.0 ** -40
        xa = np.asarray(dct.idct2_forward(a, axis=1))
        xb = np.asarray(dct.idct2_forward(a, axis=1, force_matmul=True))
        assert np.abs(xa - xb).max() / np.abs(xa).max() < 2.0 ** -40

    @pytest.fixture
    def device_deep(self, monkeypatch):
        """Force the on-device 48-bit branch on the CPU rig."""
        monkeypatch.setattr(
            policy, "deep_on_device",
            lambda bits, n=0, max_abs=None: bits == 48 and (
                max_abs is None or max_abs <= policy.DEVICE_F64_SAFE_MAX))

    def test_stream_roundtrip_with_device_branch(self, device_deep):
        pcm = _pcm()
        s_dev = batch_encode(pcm, 0, 44100, 48, 512)
        out_dev, _ = batch_decode(s_dev)
        # archival contract: ~217 dB SNR at the 48-bit container
        err = out_dev - pcm[: len(out_dev)]
        snr = 10 * np.log10(np.sum(pcm**2) / max(np.sum(err**2), 1e-300))
        assert snr > 195

        # vs the host path: every decoded sample within one ulp48 of peak
        monkeypatch_off = policy.deep_on_device
        try:
            policy.deep_on_device = lambda bits, n=0, max_abs=None: False
            s_host = batch_encode(pcm, 0, 44100, 48, 512)
            out_host, _ = batch_decode(s_host)
        finally:
            policy.deep_on_device = monkeypatch_off
        np.testing.assert_allclose(
            out_dev, out_host, atol=float(np.abs(pcm).max()) * 2.0 ** -35)

    def test_streaming_engine_device_branch(self, device_deep):
        from frad_python_tpu import Decoder, Encoder
        pcm = _pcm(3, 512, 2)
        enc = Encoder(0, 44100, 2, 48, 512, "f64be")
        stream = enc.process(pcm.astype(">f8").tobytes()).buf + enc.flush().buf
        d = Decoder()
        out = np.concatenate([p for p in (d.process(stream).pcm,
                                          d.flush().pcm) if p.size])
        err = out - pcm[: len(out)]
        snr = 10 * np.log10(np.sum(pcm**2) / max(np.sum(err**2), 1e-300))
        assert snr > 195

    def test_oversize_frames_stay_on_host(self, monkeypatch):
        """Frames beyond the matmul matrix cap cannot use the device
        route (the f64 FFT form needs complex128, which TPU lacks) —
        the policy must route them to the host even on a TPU backend."""
        import jax

        from frad_python_tpu.ops.dct import MATMUL_MAX_N
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.delenv("FRAD_TPU_DEEP_ON_HOST", raising=False)
        # force the route so the per-process link-vs-host probe is not
        # exercised on the CPU rig; this test is about the n/magnitude
        # guards, which apply BEFORE the route decision
        monkeypatch.setenv("FRAD_TPU_DEEP_ON_DEVICE", "1")
        assert policy.deep_on_device(48, MATMUL_MAX_N)
        assert not policy.deep_on_device(48, MATMUL_MAX_N + 1)
        assert not policy.deep_on_device(64, MATMUL_MAX_N)
        # content beyond the f32-based f64 emulation's range (or NaN)
        # must route host even on a TPU backend
        assert policy.deep_on_device(48, 2048, 1.0)
        assert not policy.deep_on_device(48, 2048, 1e39)
        assert not policy.deep_on_device(48, 2048, float("nan"))
        # ... and below its subnormal-flush floor (ultra-quiet archival
        # frames must keep their content: host real-f64 only)
        assert not policy.deep_on_device(48, 2048, 1e-35)
        assert not policy.deep_on_device(48, 2048, 1e-13)
        assert policy.deep_on_device(48, 2048, 0.0)   # silence: route-safe
        # and the full encode path survives an oversize 48-bit frame
        # (host FFT route) on any backend
        pcm = _pcm(1, MATMUL_MAX_N + 2048, 1)[: MATMUL_MAX_N + 2048]
        frad, bdi, *_ = profile0.analogue(pcm, 48, 44100, False)
        back = profile0.digital(frad, bdi, 1, False)
        err = back - pcm
        snr = 10 * np.log10(np.sum(pcm**2) / max(np.sum(err**2), 1e-300))
        assert snr > 195

    def test_mixed_magnitude_batch_splits_per_frame(self, device_deep,
                                                    monkeypatch):
        """A batch straddling the device route's magnitude guard must
        split PER FRAME (r4 advisor: the batch path used to route from
        the max over the whole batch, so one >SAFE_MAX frame either
        dragged its in-range neighbours to the host route, or — worse —
        rode the device route itself, where the f32-based f64 emulation
        overflows to NaN). The spy asserts no out-of-range content ever
        reaches the device transform while the in-range frames still
        batch onto it."""
        from frad_python_tpu.ops import dct as dct_ops
        orig = dct_ops.dct2_forward
        dev_rows = []

        def spy(arr, axis=-1, force_matmul=False):
            if force_matmul:
                a = np.asarray(arr)
                assert float(np.abs(a).max()) <= policy.DEVICE_F64_SAFE_MAX, \
                    "out-of-range frame leaked onto the device route"
                dev_rows.append(a.size)
            return orig(arr, axis=axis, force_matmul=force_matmul)

        monkeypatch.setattr(dct_ops, "dct2_forward", spy)
        n = 512
        pcm = _pcm(5, n, 1)[: 5 * n]
        pcm[2 * n: 3 * n] = 1e33          # one frame beyond SAFE_MAX
        stream = batch_encode(pcm, 0, 44100, 48, n)
        # the four in-range frames batched onto the device route
        assert sum(dev_rows) == 4 * n
        out, _ = batch_decode(stream)
        # ... and the out-of-range frame survived on the host real-f64
        # path at archival precision
        np.testing.assert_allclose(out[2 * n: 3 * n], pcm[2 * n: 3 * n],
                                   rtol=1e-9)
        np.testing.assert_allclose(out[:n], pcm[:n], rtol=1e-7, atol=1e-9)

    def test_escalation_into_48_stays_on_host(self, device_deep):
        # f32 overflow escalates 32 -> 48 with content BEYOND the f32
        # range — exactly where the device's f32-based f64 emulation
        # overflows (measured NaN on hardware), so the redo must route
        # to the host real-f64 path (policy.DEVICE_F64_SAFE_MAX guard)
        # and still escalate + round-trip losslessly.
        pcm = np.full((512, 1), 1e39)
        frad, bdi, *_ = profile0.analogue(pcm, 32, 44100, False)
        assert profile0.DEPTHS[bdi] == 48
        back = profile0.digital(frad, bdi, 1, False)
        np.testing.assert_allclose(back, pcm, rtol=1e-9)


class TestPipelineDeepDepth:
    @pytest.mark.parametrize("bits", [48, 64])
    def test_stream_identical_to_f64_pipeline(self, bits):
        pcm = _pcm()
        s32 = batch_encode(pcm, 0, 44100, bits, 512, compute_dtype="float32")
        s64 = batch_encode(pcm, 0, 44100, bits, 512, compute_dtype=None)
        assert s32 == s64
        out32, _ = batch_decode(s32, compute_dtype="float32")
        out64, _ = batch_decode(s32, compute_dtype=None)
        np.testing.assert_array_equal(out32, out64)

    def test_pipeline_escalation_recompute(self):
        pcm = _pcm(4, 512, 1)
        pcm[600:700] = 1e39  # one loud region -> f32 inf -> deep recompute
        s32 = batch_encode(pcm, 0, 44100, 32, 512, compute_dtype="float32")
        s64 = batch_encode(pcm, 0, 44100, 32, 512, compute_dtype=None)
        assert s32 == s64
        out, _ = batch_decode(s32)
        # quiet frames stay in the 32-bit container (f32-grade noise);
        # the escalated loud frame must carry f64-grade relative precision
        # (its quiet samples are drowned by frame-relative container
        # noise — inherent to float storage, same as the reference)
        np.testing.assert_allclose(out[:512], pcm[:512], rtol=2e-6, atol=1e-7)
        np.testing.assert_allclose(out[1024:], pcm[1024:], rtol=2e-6, atol=1e-7)
        # 48-bit container noise accumulated over the IDCT sum (~2^-37 per
        # coefficient x sqrt(N)); the f32 path would have produced inf here
        np.testing.assert_allclose(out[600:700], pcm[600:700], rtol=1e-7)
        assert np.all(np.isfinite(out))


class TestDeepRouteProbe:
    def test_probe_returns_bool_and_caches(self):
        """_deep_device_route_wins must complete (CPU rig: 'device' is
        the same host, probe finishes immediately), return a bool, and
        cache — the product calls it per frame."""
        policy._deep_device_route_wins.cache_clear()
        try:
            r1 = policy._deep_device_route_wins()
            assert isinstance(r1, bool)
            assert policy._deep_device_route_wins() == r1
            assert policy._deep_device_route_wins.cache_info().hits >= 1
        finally:
            policy._deep_device_route_wins.cache_clear()
