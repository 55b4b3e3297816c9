"""Temporal Noise Shaping: order-12 LPC over the spectrum (profile 2).

Behavioural parity with reference p2tools.py:

* windowed, normalised autocorrelation (p2tools.py:8-15)
* Levinson-Durbin with reflection clamp at 0.96 and early exit on tiny
  error (p2tools.py:17-34)
* 4-bit LPC coefficient quantisation (p2tools.py:36-55)
* prediction-gain gate >= 10*log10(2)/10 dB and spectral-flatness gate
  (p2tools.py:57-70,108-111)
* analysis FIR / synthesis IIR with NaN/blow-up bail-outs
  (p2tools.py:72-105)

Host-side formulation (order-12 recurrences are scalar-serial and tiny
next to the transform); the batch pipeline runs the same math under
`lax.scan` when frames are batched on TPU (see models/batch.py).
"""

from __future__ import annotations

import numpy as np
from scipy import signal as _sig

MAX_ORDER = 12
COEF_RES = 4
MIN_PRED = float(np.log10(2.0) / 10.0)


def calc_autocorr(x: np.ndarray) -> np.ndarray:
    sig = x - np.mean(x)
    norm = np.sqrt(np.sum(sig * sig))
    if norm > 1e-6:
        sig = sig / norm
    # lags 0..MAX_ORDER of the autocorrelation, Gaussian lag window
    ac = np.correlate(sig, sig, mode="full")[len(sig) - 1:len(sig) + MAX_ORDER]
    window = np.exp(-0.5 * (np.arange(MAX_ORDER + 1) * 0.01) ** 2)
    return ac * window


def levinson_durbin(autocorr: np.ndarray) -> np.ndarray:
    lpc = np.zeros(MAX_ORDER + 1)
    lpc[0] = 1.0
    error = autocorr[0]
    if error <= 1e-10:
        return lpc
    for i in range(1, MAX_ORDER + 1):
        reflection = -np.sum(lpc[:i] * autocorr[i:0:-1]) / error
        if abs(reflection) >= 0.96:
            reflection = 0.96 * np.sign(reflection)
        prev = lpc.copy()
        lpc[i] = reflection
        lpc[1:i] += reflection * prev[i - 1:0:-1]
        error *= 1.0 - reflection * reflection
        if error <= 1e-12:
            break
    return lpc


def quantise_lpc(lpc: np.ndarray) -> np.ndarray:
    scale = (1 << COEF_RES) - 1
    q = np.zeros_like(lpc, dtype=np.int64)
    if len(lpc) > 1:
        q[1:] = np.rint(np.clip(lpc[1:] * scale, -scale, scale - 1)).astype(np.int64)
    return q


def dequantise_lpc(lpc_quant: np.ndarray) -> np.ndarray:
    if not np.any(lpc_quant):
        return np.array([1.0])
    scale = (1 << COEF_RES) - 1
    deq = np.zeros(len(lpc_quant), dtype=np.float64)
    deq[0] = 1.0
    if len(lpc_quant) > 1:
        deq[1:] = lpc_quant[1:].astype(np.float64) / scale
    return deq


def predgain(orig: np.ndarray, residual: np.ndarray) -> float:
    oc = orig - np.mean(orig)
    rc = residual - np.mean(residual)
    oe = float(np.sum(oc * oc))
    re = float(np.sum(rc * rc))
    if oe < 1e-10 or re < 1e-10 or re >= oe:
        return 0.0
    return float(20.0 * np.log10(oe / re))


def _flat_enough_for_lpc(freqs: np.ndarray) -> bool:
    """Spectral-flatness gate: geometric/arithmetic mean ratio < 0.5
    (p2tools.py:108-111); tonal spectra pass, noise-like ones don't."""
    geo = np.exp(np.mean(np.log(np.abs(freqs) + 1e-10)))
    ari = np.mean(np.abs(freqs))
    return bool(geo / (ari + 1e-10) < 0.5)


def tns_analysis(freqs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Returns (residual-or-passthrough, quantised LPC [13] — zeros when
    TNS is bypassed)."""
    zeros = np.zeros(MAX_ORDER + 1, dtype=np.int64)
    if len(freqs) < MAX_ORDER * 2 or not _flat_enough_for_lpc(freqs):
        return freqs, zeros
    if np.sum(freqs * freqs) < 1e-10:
        return freqs, zeros

    lpc = levinson_durbin(calc_autocorr(freqs))
    if np.sum(np.abs(lpc[1:])) < 0.01:
        return freqs, zeros
    lpc_quant = quantise_lpc(lpc)
    if not np.any(lpc_quant[1:]):
        return freqs, zeros
    lpc_deq = dequantise_lpc(lpc_quant)

    residual = _sig.lfilter(lpc_deq, [1.0], freqs)
    if (not np.all(np.isfinite(residual))) or np.max(np.abs(residual)) > 1e6:
        return freqs, zeros
    if predgain(freqs, residual) < MIN_PRED:
        return freqs, zeros
    return residual, lpc_quant


def tns_synthesis(tns_freqs: np.ndarray, lpc_quant: np.ndarray) -> np.ndarray:
    if not np.any(lpc_quant):
        return tns_freqs
    lpc_deq = dequantise_lpc(lpc_quant)
    filtered = _sig.lfilter([1.0], lpc_deq, tns_freqs)
    if (not np.all(np.isfinite(filtered))) or np.max(np.abs(filtered)) > 1e6:
        return tns_freqs
    return filtered
