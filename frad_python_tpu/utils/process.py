"""Progress / throughput telemetry for the app pipelines.

Parity with reference src/tools/process.py: wall-clock realtime speed,
per-sample-rate duration and bitrate accounting, and a block/unblock
mechanism that excludes interactive-prompt time from speed math.
"""

from __future__ import annotations

import time


class ProcessInfo:
    def __init__(self) -> None:
        self.start_time = time.time()
        self.t_block: float | None = None
        self.total_size = 0
        self.duration: dict[int, int] = {}
        self.bitrate: dict[int, int] = {}

    def update(self, size: int, samples: int, srate: int) -> None:
        self.total_size += size
        if srate == 0:
            return
        self.duration[srate] = self.duration.get(srate, 0) + samples
        self.bitrate[srate] = self.bitrate.get(srate, 0) + size

    def get_duration(self) -> float:
        return sum(v / k for k, v in self.duration.items() if k)

    def get_bitrate(self) -> float:
        total_duration = self.get_duration()
        if total_duration <= 0:
            return 0.0
        return sum(self.bitrate.values()) * 8 / total_duration

    def get_speed(self) -> float:
        elapsed = time.time() - self.start_time
        return self.get_duration() / elapsed if elapsed > 0 else 0.0

    def get_total_size(self) -> int:
        return self.total_size

    def block(self) -> None:
        self.t_block = time.time()

    def unblock(self) -> None:
        if self.t_block is not None:
            self.start_time += time.time() - self.t_block
            self.t_block = None
