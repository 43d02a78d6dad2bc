"""Build the native rANS shared library with g++ (no pybind11 needed).

Usage: python -m rgba_tpu.native.build
The library is cached next to the sources as librans.so and rebuilt when
rans.cpp is newer.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "rans.cpp")
LIB = os.path.join(_DIR, "librans.so")


def build(force: bool = False) -> str:
    if (not force and os.path.exists(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           SRC, "-o", LIB]
    subprocess.run(cmd, check=True, capture_output=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
