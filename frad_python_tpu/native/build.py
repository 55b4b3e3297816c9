"""Build the C++ native module: `python -m frad_python_tpu.native.build`."""

from __future__ import annotations

import pathlib
import subprocess
import sys

HERE = pathlib.Path(__file__).resolve().parent
SRC = HERE / "frad_native.cpp"
OUT = HERE / "libfrad_native.so"


def build(verbose: bool = True) -> pathlib.Path:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-std=c++17", "-o", str(OUT), str(SRC), "-lz", "-lpthread",
    ]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
