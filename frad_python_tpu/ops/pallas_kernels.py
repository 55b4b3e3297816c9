"""Pallas TPU kernels for the VPU-bound codec stages.

The MXU stages (DCT, subband reduction) are single matmuls that XLA
already schedules optimally; the elementwise chains around them are the
Pallas targets here:

* `power_quant` — fused masked-divide + power-law compand + round-to-int
  (reference profile1.py:34-36 chain): one VMEM pass instead of several
  XLA elementwise HLOs, tiled over (rows, lanes).
* `crossfade_frames` — the decoder's overlap-add blend
  (decoder.py:28-46) as a tiled two-operand kernel.

Kernels run in interpret mode on CPU (tests) and compiled on TPU.
They are OPT-IN (FRAD_TPU_PALLAS=1): XLA already fuses these elementwise
chains well, and this environment's remote Mosaic toolchain is fragile —
`jnp.dot` inside a kernel crashes it outright, index-map literal
constants fail to legalize (i64-vs-i32 program ids), and a crashed
helper leaves subsequent Pallas compiles hanging. The kernels are kept
correct (interpret-mode parity tests) for hardware with a healthy
Mosaic stack.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def enabled() -> bool:
    return os.environ.get("FRAD_TPU_PALLAS", "0") == "1"


def _quant_kernel(x_ref, div_ref, o_ref, *, factor: float, alpha: float):
    x = x_ref[:]
    div = div_ref[:]
    masked = jnp.where(div == 0.0, 0.0, x / jnp.where(div == 0.0, 1.0, div))
    scaled = masked * factor
    companded = jnp.sign(scaled) * jnp.abs(scaled) ** alpha
    o_ref[:] = jnp.rint(companded).astype(jnp.int32)


def power_quant(freqs: jax.Array, div: jax.Array, factor: float,
                alpha: float = 0.75, row_tile: int = 64) -> jax.Array:
    """rint(sign(f/d * factor) * |f/d * factor|^alpha) as int32.

    freqs/div: [R, N] float32 (R = batch*channels). Zero divisors map the
    bin to 0 (the reference's div==0 -> inf -> x/inf == 0 semantics).
    """
    r, n = freqs.shape
    tile = min(row_tile, r)
    # NB: every index-map component must derive from a program id — a
    # literal 0 emits an i64 constant that this libtpu's Mosaic cannot
    # legalize against i32 program ids (hence the (tiles, 1) grid).
    grid = (pl.cdiv(r, tile), 1)
    return pl.pallas_call(
        functools.partial(_quant_kernel, factor=float(factor), alpha=alpha),
        grid=grid,
        in_specs=[pl.BlockSpec((tile, n), lambda i, j: (i, j)),
                  pl.BlockSpec((tile, n), lambda i, j: (i, j))],
        out_specs=pl.BlockSpec((tile, n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((r, n), jnp.int32),
        interpret=_interpret(),
    )(freqs, div)


def _crossfade_kernel(heads_ref, tails_ref, w_ref, o_ref):
    # heads/tails: [tile, olap]; w: [1, olap] fade-in window
    w = w_ref[0, :]
    o_ref[:] = heads_ref[:] * w[None, :] + tails_ref[:] * w[None, ::-1]


def crossfade_frames(heads: jax.Array, tails: jax.Array, w: jax.Array,
                     row_tile: int = 256) -> jax.Array:
    """Batched crossfade: heads*w + tails*reverse(w), rows = frames*ch.

    heads/tails: [R, olap]; w: [olap]. Equivalent to the inner loop of
    reference decoder.py:33-40 across all frames at once.
    """
    r, olap = heads.shape
    tile = min(row_tile, r)
    grid = (pl.cdiv(r, tile), 1)
    return pl.pallas_call(
        _crossfade_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((tile, olap), lambda i, j: (i, j)),
                  pl.BlockSpec((tile, olap), lambda i, j: (i, j)),
                  pl.BlockSpec((1, olap), lambda i, j: (i - i, j))],
        out_specs=pl.BlockSpec((tile, olap), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((r, olap), heads.dtype),
        interpret=_interpret(),
    )(heads, tails, w[None, :])
