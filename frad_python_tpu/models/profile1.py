"""Profile 1 — lossy DCT codec with psychoacoustic quantisation.

Pipeline parity with reference src/libfrad/fourier/profile1.py:
pad frame to the next compact size -> DCT-II forward -> per-channel
psychoacoustic threshold -> per-bin divisor -> power-law quantisation
(alpha=0.75) -> log_{e/2}-companded thresholds -> Exp-Golomb-Rice streams
`[u32 thres_len][thres][freqs]` -> raw DEFLATE (wbits=-15).
Decode inverts the chain and emits a zero frame on corrupt DEFLATE
(reference profile1.py:59-64).

TPU-first departures: the DCT is one batched matmul over all channels;
masking/interp/quant are vectorised over [ch, N] (ops/psycho.py) instead
of per-channel Python loops; EGR coding is the vectorised/native codec
(ops/golomb.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..ops import golomb, psycho
from ..ops.dct import dct2_forward, idct2_forward
from .profiles import compact

DEPTHS = (8, 12, 16, 24, 32, 48, 64)


def _scale_factor(bits: int) -> float:
    """2^(bits-1) (reference profile1.py:9-10)."""
    return float(2.0 ** (bits - 1))


def _untrim(arr: np.ndarray, fsize: int, channels: int) -> np.ndarray:
    """Zero-pad a flat array up to fsize*channels (profile1.py:12-13)."""
    need = fsize * channels - len(arr)
    return np.pad(arr, (0, max(0, need))) if need > 0 else arr


def analogue(pcm: np.ndarray, bits: int, srate: int, loss_level: float) -> tuple[bytes, int, int, int]:
    """Encode one frame: [fsize, channels] f64 PCM -> (payload, depth index,
    channels, srate)."""
    if bits not in DEPTHS:
        bits = 16
    factor = _scale_factor(bits)

    pcm = np.asarray(pcm, dtype=np.float64)
    dlen = compact.get_samples_min_ge(len(pcm))
    if dlen > len(pcm):
        pcm = np.pad(pcm, ((0, dlen - len(pcm)), (0, 0)))
    srate = compact.get_valid_srate(srate)
    loss_level = max(abs(loss_level), 0.125)
    channels = pcm.shape[1]

    # [ch, N] spectra in one batched transform
    freqs = np.asarray(dct2_forward(pcm, axis=0), dtype=np.float64).T

    thres = psycho.mask_thres_mos(freqs * factor, srate, loss_level)      # [ch, 27]
    div = psycho.mapping_from_opus(thres, dlen, srate)                    # [ch, N]
    div = np.where(div == 0.0, np.inf, div)
    masked = freqs / div

    freqs_flat = np.rint(psycho.quant(masked * factor)).astype(np.int64).T.ravel()
    thres_flat = np.rint(
        psycho.dequant(np.log(thres.clip(min=1.0)) / np.log(np.e / 2.0))
    ).astype(np.int64).T.ravel()

    thres_gol = golomb.encode(thres_flat)
    freqs_gol = golomb.encode(freqs_flat)
    frad = struct.pack(">I", len(thres_gol)) + thres_gol + freqs_gol
    frad = zlib.compress(frad, wbits=-15)

    return frad, DEPTHS.index(bits), channels, srate


def digital(frad: bytes, bit_depth_index: int, channels: int, srate: int, fsize: int) -> np.ndarray:
    """Decode one frame payload -> [fsize, channels] f64 PCM."""
    bits = DEPTHS[bit_depth_index]
    factor = _scale_factor(bits)

    try:
        frad = zlib.decompress(frad, wbits=-15)
    except Exception:
        return np.zeros((fsize, channels))
    if len(frad) < 4:
        return np.zeros((fsize, channels))
    (thres_len,) = struct.unpack(">I", frad[:4])
    thres_gol = frad[4:4 + thres_len]
    freqs_gol = frad[4 + thres_len:]

    freqs_flat = psycho.dequant(golomb.decode(freqs_gol).astype(np.float64)) / factor
    thres_flat = np.power(np.e / 2.0, psycho.quant(golomb.decode(thres_gol).astype(np.float64)))
    # pad up to / trim down to the frame grid (corrupt payloads may decode
    # to ragged lengths; the reference would crash on reshape)
    freqs_flat = _untrim(freqs_flat, fsize, channels)[: fsize * channels]
    thres_flat = _untrim(thres_flat, fsize, channels)[: fsize * channels]

    masked = freqs_flat.reshape(-1, channels).T       # [ch, N]
    thres = thres_flat.reshape(-1, channels).T        # [ch, >=27]

    div = psycho.mapping_from_opus(thres[:, :psycho.SUBBANDS], fsize, srate)
    freqs = masked * div

    return np.asarray(idct2_forward(freqs.T, axis=0), dtype=np.float64)
