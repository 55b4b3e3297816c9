"""On-device Exp-Golomb-Rice bit-packing.

SURVEY §7 hard part (a): frame byte-lengths are data-dependent, so the
TPU stage emits a FIXED-shape padded word tensor plus per-frame bit
lengths, and the host finishes the bitstream. Packing on the device
shrinks device->host traffic ~8x versus shipping raw int32 coefficient
tensors (the EGR stream is ~4-10 bits/symbol after masking) — decisive
here because d2h bandwidth is the pipeline bottleneck.

The emitted words reproduce the host EGR codec (ops/golomb.py /
native frad_egr_encode) bit-for-bit: same k, same signed mapping, same
unary+binary codes, zero padding to the byte boundary. Valid for symbol
magnitudes < 2^23 (exact float32 bit-length arithmetic); larger depths
fall back to the host encoder per frame via the overflow mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

MAX_EXACT = 1 << 23  # |mapped value| bound for exact f32 frexp bit-lengths


def _bitlen(v: jax.Array) -> jax.Array:
    """Exact bit length of positive int32 values < 2^24 via f32 frexp."""
    _, e = jnp.frexp(v.astype(jnp.float32))
    return e.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_words",))
def egr_pack_frames(symbols: jax.Array, max_words: int):
    """Pack [B, M] int32 symbol frames into EGR bitstreams on device.

    Returns (words [B, max_words] uint32 — big-endian bit order within
    each word, i.e. byte `4w+i` of the stream is byte i of word w's
    big-endian form —, total_bits [B] int32, k [B] int32, overflow [B]
    bool). Frames flagged `overflow` exceeded max_words*32 bits and must
    be re-encoded on the host.
    """
    b, m = symbols.shape
    s = symbols.astype(jnp.int32)

    dmax = jnp.max(jnp.abs(s), axis=1)                       # [B]
    k = _bitlen(jnp.maximum(dmax - 1, 0))                    # ceil(log2(dmax))
    mapped = jnp.where(s > 0, (s << 1) - 1, (-s) << 1)
    v = (mapped + (jnp.int32(1) << k[:, None])).astype(jnp.uint32)   # [B, M]

    blen = _bitlen(v.astype(jnp.int32))                      # [B, M]
    code_len = 2 * blen - k[:, None] - 1

    ends = jnp.cumsum(code_len, axis=1)                      # inclusive ends
    total_bits = ends[:, -1]
    overflow = total_bits > max_words * 32

    # value v occupies stream bits [end-blen, end); split across <= 2 words
    end = ends
    start = end - blen
    w0 = start >> 5
    w1 = (end - 1) >> 5

    # contribution to word w: ((v >> (end - bhi)) & mask) << (32w + 32 - bhi)
    # where [blo, bhi) is the intersection of the value's bit range with w
    def word_contrib(w):
        blo = jnp.maximum(start, w << 5)
        bhi = jnp.minimum(end, (w << 5) + 32)
        nbits = bhi - blo
        chunk = (v >> (end - bhi).astype(jnp.uint32)) & (
            (jnp.uint32(1) << nbits.astype(jnp.uint32)) - jnp.uint32(1))
        return chunk << ((w << 5) + 32 - bhi).astype(jnp.uint32)

    c0 = word_contrib(w0)
    c1 = jnp.where(w1 > w0, word_contrib(w1), jnp.uint32(0))
    w1c = jnp.minimum(w1, max_words - 1)
    w0c = jnp.minimum(w0, max_words - 1)

    base = (jnp.arange(b, dtype=jnp.int32) * max_words)[:, None]
    flat = jnp.zeros((b * max_words,), dtype=jnp.uint32)
    flat = flat.at[(base + w0c).ravel()].add(c0.ravel(), mode="drop")
    flat = flat.at[(base + w1c).ravel()].add(
        jnp.where(w1 > w0, c1, 0).ravel(), mode="drop")
    words = flat.reshape(b, max_words)
    return words, total_bits, k, overflow


def words_to_stream(words: np.ndarray, total_bits: int, k: int) -> bytes:
    """Host finisher: one frame's packed words -> EGR byte stream
    (k header byte + ceil(total_bits/8) big-endian bytes)."""
    nbytes = (int(total_bits) + 7) // 8
    raw = words.astype(">u4").tobytes()[:nbytes]
    return bytes([int(k)]) + raw
