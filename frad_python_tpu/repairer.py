"""Streaming FrAD repairer: re-armors every frame with fresh RS parity.

Parity with reference src/libfrad/repairer.py: parses frames like the
decoder, CRC-verifies, RS-repairs damaged payloads, re-encodes parity at
the requested ratio and rewrites the header with a recomputed CRC —
without ever touching the PCM payload (repair is a container-shell
transform, reference repairer.py:39-52). Non-frame bytes (file header,
garbage) pass through untouched (repairer.py:58-62).
"""

from __future__ import annotations

from .common import FRM_SIGN
from .container import ecc
from .container.asfh import ASFH, COMPLETE, FORCE_FLUSH, INCOMPLETE

DEFAULT_ECC_RATIO = (96, 24)


class Repairer:
    def __init__(self, ecc_ratio: tuple[int, int] = DEFAULT_ECC_RATIO):
        self.warnings: list[str] = []
        if ecc_ratio[0] == 0:
            self.warnings.append("ECC data size must not be zero; falling back to (96, 24)")
            ecc_ratio = DEFAULT_ECC_RATIO
        if ecc_ratio[0] + ecc_ratio[1] > 255:
            self.warnings.append(
                f"ECC data+check size must not exceed 255, given: "
                f"{ecc_ratio[0]} and {ecc_ratio[1]}; falling back to (96, 24)")
            ecc_ratio = DEFAULT_ECC_RATIO

        self.asfh = ASFH()
        self.buffer = b""
        self.fix_error = True
        self.ecc_ratio = ecc_ratio
        self.broken_frame = False

    def is_empty(self) -> bool:
        return len(self.buffer) < len(FRM_SIGN) or self.broken_frame

    def process(self, stream: bytes) -> bytes:
        self.buffer += stream
        out: list[bytes] = []

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

                frad = ecc.encode(frad, *self.ecc_ratio)
                self.asfh.ecc = True
                self.asfh.ecc_dsize, self.asfh.ecc_codesize = self.ecc_ratio

                out.append(self.asfh.write(frad))
                self.asfh.clear()
            else:
                if self.asfh.buffer[:len(FRM_SIGN)] != FRM_SIGN:
                    i = self.buffer.find(FRM_SIGN)
                    if i != -1:
                        out.append(self.buffer[:i])
                        self.buffer = self.buffer[i:]
                        self.asfh.buffer = self.buffer[:len(FRM_SIGN)]
                        self.buffer = self.buffer[len(FRM_SIGN):]
                    else:
                        out.append(self.buffer[:-len(FRM_SIGN) + 1])
                        self.buffer = self.buffer[-len(FRM_SIGN) + 1:]
                        break
                status, self.buffer = self.asfh.read(self.buffer)
                if status == COMPLETE:
                    continue
                if status == FORCE_FLUSH:
                    out.append(self.asfh.force_flush())
                    # reset parser state so a following stream re-syncs
                    # (the reference leaves the stale header buffered and
                    # would re-emit the terminator on the next push)
                    self.asfh.clear()
                    break
                break  # INCOMPLETE

        return b"".join(out)

    def flush(self) -> bytes:
        ret = self.buffer
        self.buffer = b""
        return ret
