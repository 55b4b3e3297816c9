"""App-level formatting and file helpers.

Parity with reference src/common.py: pipe-path detection, file-stem
logic, Julian-year time formatting, SI prefixes, speed formatting and
the interactive overwrite guard.
"""

from __future__ import annotations

import math
import os
import sys

PIPEIN = ("-", "/dev/stdin", "/dev/fd/0")
PIPEOUT = ("-", "/dev/stdout", "/dev/fd/1")


def get_file_stem(path: str) -> str:
    if path in PIPEIN or path in PIPEOUT:
        return "pipe"
    base = os.path.basename(path)
    if (base.startswith(".") and base.count(".") == 1) or "." not in base:
        return base
    return ".".join(base.split(".")[:-1])


def format_time(n: float) -> str:
    if n < 0.0:
        return f"-{format_time(-n)}"
    julian, n = divmod(n, 31557600.0)
    days, n = divmod(n, 86400.0)
    hours, n = divmod(n, 3600.0)
    minutes, n = divmod(n, 60.0)
    julian, days, hours, minutes = int(julian), int(days), int(hours), int(minutes)

    if julian:
        return f"J{julian}.{days:03d}:{hours:02d}:{minutes:02d}:{n:06.3f}"
    if days:
        return f"{days}:{hours:02d}:{minutes:02d}:{n:06.3f}"
    if hours:
        return f"{hours}:{minutes:02d}:{n:06.3f}"
    if minutes:
        return f"{minutes}:{n:06.3f}"
    if n >= 1.0:
        return f"{n:.3f} s"
    if n >= 1e-3:
        return f"{n * 1e3:.3f} ms"
    if n >= 1e-6:
        return f"{n * 1e6:.3f} µs"
    if n > 0.0:
        return f"{n * 1e9:.3f} ns"
    return "0"


def format_si(n: float) -> str:
    if n == 0:
        return "0 "
    exp = int(math.log10(abs(n)) // 3)
    units = ["", "k", "M", "G", "T", "P", "E", "Z", "Y"]
    exp = max(0, min(exp, len(units) - 1))
    return f"{n / 1000.0 ** exp:.3f} {units[exp]}"


def format_speed(n: float) -> str:
    if n >= 100.0:
        return f"{n:.0f}"
    if n >= 10.0:
        return f"{n:.1f}"
    if n >= 1.0:
        return f"{n:.2f}"
    return f"{n:.3f}"


def check_overwrite(path: str, overwrite: bool) -> None:
    """Interactive overwrite guard (reference common.py:41-50)."""
    if not os.path.exists(path) or overwrite:
        return
    if sys.stdin.isatty():
        print("Output file already exists, overwrite? (Y/N)", file=sys.stderr)
        while True:
            print("> ", end="", file=sys.stderr, flush=True)
            ans = input().strip().lower()
            if ans == "y":
                return
            if ans == "n":
                print("Aborted.", file=sys.stderr)
                raise SystemExit(0)
    else:
        print("Output file already exists, please provide --force(-y) flag "
              "to overwrite.", file=sys.stderr)
        raise SystemExit(0)
