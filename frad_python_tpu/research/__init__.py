"""Research appendix — validated kernels NOT in the product path.

`pallas_kernels` holds the Pallas/Mosaic formulations of the codec's
VPU-bound stages (power-law quant, overlap crossfade). They are
validated on real TPU hardware (bit-identical to the XLA formulations,
r2) and kept as the starting point for custom-kernel work, but the
product pipeline deliberately does NOT call them: XLA already fuses
these elementwise chains INTO the adjacent DCT/subband matmul programs,
so a `pallas_call` would break that fusion boundary (materialising
intermediates to HBM) and, invoked standalone over the tunneled PJRT
link, adds a ~30 ms dispatch for zero compute win — measured at parity
(36 vs 41 us) on-chip. See docs/PERFORMANCE.md "Environment quirks"
for the Mosaic porting notes captured while validating them.
"""

from . import pallas_kernels  # noqa: F401
