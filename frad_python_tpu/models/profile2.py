"""Profile 2 — lossy DCT codec with Temporal Noise Shaping (experimental).

Profile 1's chain with TNS analysis between masking and quantisation
and payload `[u16 lpc_len][lpc][u32 thres_len][thres][freqs]`
(reference src/libfrad/fourier/profile2.py). Kept out of AVAILABLE just
like the reference (src/libfrad/fourier/__init__.py:3) but implemented
for capability parity; depth table differs from profile 1
(profile2.py:7).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from ..ops import golomb, policy, psycho, tns
from ..ops.dct import dct2_forward, idct2_forward
from .profile1 import _scale_factor, _untrim
from .profiles import compact

DEPTHS = (8, 10, 12, 14, 16, 20, 24)


def analogue(pcm: np.ndarray, bits: int, srate: int, loss_level: float) -> tuple[bytes, int, int, int]:
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

    freqs = np.asarray(dct2_forward(pcm.astype(policy.compute_dtype()), axis=0),
                       dtype=np.float64).T    # [ch, N]

    thres = psycho.mask_thres_mos(freqs * factor, srate, loss_level)
    div = psycho.mapping_from_opus(thres, dlen, srate)
    div = np.where(div == 0.0, np.inf, div)

    masked_rows = []
    lpc_rows = []
    for c in range(channels):
        res, lpc_q = tns.tns_analysis(freqs[c] / div[c])
        masked_rows.append(res)
        lpc_rows.append(lpc_q)
    masked = np.stack(masked_rows)
    lpc_quant = np.stack(lpc_rows)

    freqs_flat = np.rint(psycho.quant(masked * factor)).astype(np.int64).T.ravel()
    thres_flat = np.rint(
        psycho.dequant(np.log(thres.clip(min=1.0)) / np.log(np.e / 2.0))
    ).astype(np.int64).T.ravel()
    lpc_flat = lpc_quant.astype(np.int64).T.ravel()

    lpc_gol = golomb.encode(lpc_flat)
    thres_gol = golomb.encode(thres_flat)
    freqs_gol = golomb.encode(freqs_flat)
    frad = (struct.pack(">H", len(lpc_gol)) + lpc_gol
            + struct.pack(">I", len(thres_gol)) + thres_gol + freqs_gol)
    frad = zlib.compress(frad, wbits=-15)

    return frad, DEPTHS.index(bits), channels, srate


def digital(frad: bytes, bit_depth_index: int, channels: int, srate: int, fsize: int) -> np.ndarray:
    bits = DEPTHS[bit_depth_index]
    factor = _scale_factor(bits)

    try:
        frad = zlib.decompress(frad, wbits=-15)
    except Exception:
        return np.zeros((fsize, channels))
    if len(frad) < 6:
        return np.zeros((fsize, channels))
    (lpc_len,) = struct.unpack(">H", frad[:2])
    lpc_gol = frad[2:2 + lpc_len]
    frad = frad[2 + lpc_len:]
    (thres_len,) = struct.unpack(">I", frad[:4])
    thres_gol = frad[4:4 + thres_len]
    freqs_gol = frad[4 + thres_len:]

    freqs_flat = psycho.dequant(golomb.decode(freqs_gol).astype(np.float64)) / factor
    thres_flat = np.power(np.e / 2.0, psycho.quant(golomb.decode(thres_gol).astype(np.float64)))
    lpc_flat = golomb.decode(lpc_gol)

    freqs_flat = _untrim(freqs_flat, fsize, channels)[: fsize * channels]
    thres_flat = _untrim(thres_flat, psycho.SUBBANDS, channels)[: psycho.SUBBANDS * channels]
    lpc_flat = _untrim(lpc_flat, tns.MAX_ORDER + 1, channels)[: (tns.MAX_ORDER + 1) * channels]

    masked = freqs_flat.reshape(-1, channels).T
    thres = thres_flat.reshape(-1, channels).T
    lpc_quant = lpc_flat.reshape(-1, channels).T

    div = psycho.mapping_from_opus(thres, fsize, srate)
    rows = [tns.tns_synthesis(masked[c], lpc_quant[c]) * div[c] for c in range(channels)]
    freqs = np.stack(rows)

    return np.asarray(
        idct2_forward(freqs.T.astype(policy.compute_dtype()), axis=0),
        dtype=np.float64)
