"""Build the native loader shared library.

    python -m streammos_tpu.native.build

Plain g++ (no pybind11 in this image; the C ABI is consumed via ctypes)."""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "loader.cpp")
OUT = os.path.join(HERE, "libsmtloader.so")


def build(force: bool = False) -> str:
    if not force and os.path.exists(OUT) and \
            os.path.getmtime(OUT) >= os.path.getmtime(SRC):
        return OUT
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", SRC, "-o", OUT]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build(force="--force" in sys.argv)
    print(path)
