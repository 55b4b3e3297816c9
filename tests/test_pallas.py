"""Pallas kernel parity (interpret mode on the CPU test harness)."""

import numpy as np
import pytest

from frad_python_tpu.research import pallas_kernels as pk

rng = np.random.default_rng(17)


def test_power_quant_matches_reference_chain():
    import jax.numpy as jnp
    f = jnp.asarray(rng.standard_normal((96, 256)), jnp.float32)
    d = jnp.asarray(np.abs(rng.standard_normal((96, 256))) + 0.01, jnp.float32)
    got = np.asarray(pk.power_quant(f, d, 2.0 ** 15))
    fa, da = np.asarray(f, dtype=np.float64), np.asarray(d, dtype=np.float64)
    x = fa / da * 2.0 ** 15
    want = np.rint(np.sign(x) * np.abs(x) ** 0.75).astype(np.int32)
    # f32 kernel vs f64 oracle: allow +-1 at rounding boundaries
    assert np.abs(got - want).max() <= 1
    assert (got != want).mean() < 0.01


def test_power_quant_zero_divisor_zeroes_bin():
    import jax.numpy as jnp
    f = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    d = jnp.zeros((8, 128), jnp.float32)
    got = np.asarray(pk.power_quant(f, d, 2.0 ** 15))
    assert not got.any()


def test_crossfade_matches_window_blend():
    import jax.numpy as jnp
    h = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    t = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    w = jnp.asarray(0.5 * (1 - np.cos(np.pi * np.arange(1, 129) / 129)), jnp.float32)
    got = np.asarray(pk.crossfade_frames(h, t, w))
    want = np.asarray(h) * np.asarray(w)[None, :] + np.asarray(t) * np.asarray(w)[None, ::-1]
    np.testing.assert_allclose(got, want, atol=1e-6)
