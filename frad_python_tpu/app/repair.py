"""`repair` action: re-armor a .frad stream with fresh RS parity
(reference src/repairer.py)."""

from __future__ import annotations

import os
import sys
import time

from ..repairer import Repairer
from ..utils.cli import CliParams
from ..utils.fmt import PIPEIN, PIPEOUT, check_overwrite, format_si, get_file_stem
from ..utils.process import ProcessInfo


def _log(loglevel: int, info: ProcessInfo, linefeed: bool) -> None:
    if loglevel == 0:
        return
    elapsed = max(time.time() - info.start_time, 1e-9)
    print(f"size={format_si(info.get_total_size())}B "
          f"speed={format_si(info.get_total_size() / elapsed)}B/s    ",
          end="\r", file=sys.stderr)
    if linefeed:
        print(file=sys.stderr)


def repair(input_path: str, params: CliParams) -> None:
    if input_path == "":
        print("Input file must be given", file=sys.stderr)
        raise SystemExit(1)

    rpipe = input_path in PIPEIN
    if not rpipe and not os.path.exists(input_path):
        print("Input file doesn't exist", file=sys.stderr)
        raise SystemExit(1)

    wfile = params.output
    wpipe = wfile in PIPEOUT
    if not rpipe and not wpipe and wfile and os.path.exists(wfile) \
            and os.path.samefile(input_path, wfile):
        print("Input and output files cannot be the same", file=sys.stderr)
        raise SystemExit(1)

    if wfile == "":
        if rpipe:
            wfile = "repaired.frad"
        else:
            ext = input_path.split(".")[-1]
            wfile = f"{get_file_stem(input_path)}.repaired.{ext}"
    if not wpipe:
        check_overwrite(wfile, params.overwrite)

    readfile = sys.stdin.buffer if rpipe else open(input_path, "rb")
    writefile = sys.stdout.buffer if wpipe else open(wfile, "wb")

    repairer = Repairer(params.ecc_ratio)
    for msg in repairer.warnings:
        print(msg, file=sys.stderr)
    info = ProcessInfo()

    while True:
        buf = readfile.read(32768)
        if not buf and repairer.is_empty():
            break
        out = repairer.process(buf)
        info.update(len(out), 0, 0)
        writefile.write(out)
        _log(params.loglevel, info, False)

    out = repairer.flush()
    info.update(len(out), 0, 0)
    writefile.write(out)
    _log(params.loglevel, info, True)

    if params.overwrite_repair and not (rpipe or wpipe):
        writefile.close()
        os.replace(wfile, input_path)
