"""Streaming FrAD decoder engine.

Push-based framed-FrAD -> PCM engine with behavioural parity to the
reference (src/libfrad/decoder.py): FRM_SIGN resync scanning
(decoder.py:82-90), incremental ASFH parsing, CRC-gated RS repair
(decoder.py:63-68), per-frame profile dispatch, Hann overlap-add
crossfade (decoder.py:28-46 — vectorised here via ops/window.py instead
of the reference's per-sample Python loop), mid-stream format-change
detection with `crit` flagging, and force-flush handling.

Intentional divergences from the reference, both documented in SURVEY §5:
* CRC comparison is int-vs-int, so RS repair only runs on frames that
  actually fail CRC (the reference compares int to bytes at
  decoder.py:64-66, which can never be equal, forcing a repair pass on
  every ECC frame).
* the format-change snapshot is a value copy — the reference binds
  `self.info = self.asfh` (decoder.py:96), silently disabling `crit`
  detection after the first frame.
"""

from __future__ import annotations

import numpy as np

from . import models
from .common import FRM_SIGN
from .container import ecc
from .container.asfh import ASFH, COMPLETE, FORCE_FLUSH, INCOMPLETE
from .models import COMPACT
from .ops.window import crossfade


class DecodeResult:
    __slots__ = ("pcm", "srate", "frames", "crit")

    def __init__(self, pcm: list[np.ndarray], srate: int, frames: int, crit: bool):
        chunks = [p for p in pcm if p is not None and p.size]
        if chunks:
            self.pcm = np.concatenate(chunks)
        else:
            # channel-consistent empty: concatenates cleanly with any
            # non-empty [T, C] result the same stream produced
            ch = next((p.shape[1] for p in pcm
                       if p is not None and p.ndim == 2), 0)
            self.pcm = np.empty((0, ch))
        self.srate = srate
        self.frames = frames
        self.crit = crit


class Decoder:
    def __init__(self, fix_error: bool = False):
        self.asfh = ASFH()
        self.info: tuple[int, int] = (0, 0)   # (channels, srate) snapshot
        self.buffer = b""
        self.overlap_fragment = np.empty((0, 0), dtype=np.float64)
        self.overlap_prog = 0
        self.fix_error = fix_error
        self.broken_frame = False

    def is_empty(self) -> bool:
        return len(self.buffer) < len(FRM_SIGN) or self.broken_frame

    def get_asfh(self) -> ASFH:
        return self.asfh

    # ------------------------------------------------------------------
    # overlap-add crossfade (reference decoder.py:28-46, vectorised)
    # ------------------------------------------------------------------
    def _overlap(self, frame: np.ndarray) -> np.ndarray:
        olap_len = len(self.overlap_fragment)
        if self.overlap_fragment.size:
            frame, consumed = crossfade(frame, self.overlap_fragment, self.overlap_prog)
            self.overlap_prog += consumed

        if olap_len <= self.overlap_prog:
            self.overlap_fragment = np.empty((0, 0), dtype=np.float64)
            self.overlap_prog = 0
            if self.asfh.profile in COMPACT and self.asfh.overlap_ratio != 0:
                cut = len(frame) * (self.asfh.overlap_ratio - 1) // self.asfh.overlap_ratio
                self.overlap_fragment, frame = frame[cut:], frame[:cut]
        return frame

    # ------------------------------------------------------------------
    def _decode_frame_payload(self, frad: bytes) -> np.ndarray:
        a = self.asfh
        if a.profile == 1:
            return models.profile1.digital(frad, a.bit_depth_index, a.channels, a.srate, a.fsize)
        if a.profile == 2:
            return models.profile2.digital(frad, a.bit_depth_index, a.channels, a.srate, a.fsize)
        if a.profile == 4:
            return models.profile4.digital(frad, a.bit_depth_index, a.channels, a.endian)
        return models.profile0.digital(frad, a.bit_depth_index, a.channels, a.endian)

    def process(self, stream: bytes) -> DecodeResult:
        self.buffer += stream
        ret_pcm: list[np.ndarray] = []
        frames = 0

        while True:
            if self.asfh.all_set:
                self.broken_frame = False
                if len(self.buffer) < self.asfh.frmbytes:
                    if len(stream) == 0:
                        self.broken_frame = True
                    break

                frad = self.buffer[:self.asfh.frmbytes]
                self.buffer = self.buffer[self.asfh.frmbytes:]
                if self.asfh.ecc:
                    repair = self.fix_error and not self.asfh.payload_crc_matches(frad)
                    frad = ecc.decode(frad, self.asfh.ecc_dsize, self.asfh.ecc_codesize, repair)

                try:
                    pcm = self._decode_frame_payload(frad)
                except Exception:
                    # corrupt payload beyond repair: emit silence for the frame
                    pcm = np.zeros((self.asfh.fsize, max(self.asfh.channels, 1)))
                pcm = self._overlap(pcm)
                ret_pcm.append(pcm)
                frames += 1
                self.asfh.clear()
            else:
                if self.asfh.buffer[:len(FRM_SIGN)] != FRM_SIGN:
                    i = self.buffer.find(FRM_SIGN)
                    if i != -1:
                        self.buffer = self.buffer[i:]
                        self.asfh.buffer = self.buffer[:len(FRM_SIGN)]
                        self.buffer = self.buffer[len(FRM_SIGN):]
                    else:
                        self.buffer = self.buffer[-len(FRM_SIGN) + 1:]
                        break
                status, self.buffer = self.asfh.read(self.buffer)
                if status == COMPLETE:
                    if not self.asfh.criteq(self.info):
                        chnl, srate = self.info
                        self.info = self.asfh.snapshot()
                        if srate or chnl:
                            # emit the residual overlap tail of the old
                            # format but KEEP the freshly parsed header so
                            # the pending frame decodes on the next push
                            # (the reference's flush() would clear it and
                            # lose one frame to resync)
                            ret_pcm.append(self._flush_overlap())
                            return DecodeResult(ret_pcm, srate, frames, True)
                elif status == FORCE_FLUSH:
                    ret_pcm.append(self.flush().pcm)
                    break
                else:  # INCOMPLETE
                    break

        return DecodeResult(ret_pcm, self.asfh.srate, frames, False)

    def _flush_overlap(self) -> np.ndarray:
        ret = self.overlap_fragment
        if not ret.size and self.info[0]:
            # channel-consistent empty so callers can concatenate
            # process()/flush() results unconditionally
            ret = np.empty((0, self.info[0]), dtype=np.float64)
        self.overlap_fragment = np.empty((0, 0), dtype=np.float64)
        self.overlap_prog = 0
        return ret

    def flush(self) -> DecodeResult:
        ret = self._flush_overlap()
        self.asfh.clear()
        return DecodeResult([ret], self.asfh.srate, 0, False)

    # serialisable engine state (SURVEY §5 checkpoint/resume)
    def state_dict(self) -> dict:
        return {
            "buffer": self.buffer,
            "overlap_fragment": np.asarray(self.overlap_fragment),
            "overlap_prog": self.overlap_prog,
            "info": self.info,
            "fix_error": self.fix_error,
        }

    def load_state_dict(self, state: dict) -> None:
        self.buffer = state["buffer"]
        self.overlap_fragment = np.asarray(state["overlap_fragment"])
        self.overlap_prog = state["overlap_prog"]
        self.info = tuple(state["info"])
        self.fix_error = state["fix_error"]
