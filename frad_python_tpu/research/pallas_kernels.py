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

**Validated on the real chip (v5e, 2026-08-19)**: both kernels compile
through Mosaic and are bit-identical to the XLA formulation
(`power_quant` equal=True on 512x2048; `crossfade_frames` allclose).
Steady-state jitted timings on-chip: power_quant 36 us vs XLA-fused
41 us; crossfade 31 us — both dispatch-latency-bound at codec sizes,
i.e. parity. They stay OPT-IN (FRAD_TPU_PALLAS=1) because the XLA
elementwise chain FUSES INTO the adjacent DCT/subband matmul programs;
a separate pallas_call would split that fused program and add one more
dispatch through the (30 ms latency) tunnel for zero compute win.
Mosaic porting notes baked into the code: every BlockSpec index-map
component must derive from a program id (a literal 0 emits an i64
constant that fails to legalize against i32 program ids), `jnp.dot`
inside a kernel crashes the remote toolchain, and there is no `rev`
lowering (reversals are shipped as pre-reversed operands).
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


def _crossfade_kernel(heads_ref, tails_ref, w_ref, wr_ref, o_ref):
    # heads/tails: [tile, olap]; w/wr: [1, olap] fade-in / fade-out
    # windows — the reversal happens OUTSIDE the kernel (Mosaic has no
    # `rev` lowering; ship both orientations as operands instead)
    o_ref[:] = heads_ref[:] * w_ref[0, :][None, :] \
        + tails_ref[:] * wr_ref[0, :][None, :]


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
                  pl.BlockSpec((1, olap), lambda i, j: (i - i, j)),
                  pl.BlockSpec((1, olap), lambda i, j: (i - i, j))],
        out_specs=pl.BlockSpec((tile, olap), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((r, olap), heads.dtype),
        interpret=_interpret(),
    )(heads, tails, w[None, :], w[::-1][None, :])
