"""Lazy build harness for the native loader (the analogue of the reference's
JIT CUDA-extension build, ref: nr4seg/nerf/raymarching/backend.py:45-57).

Compiles native/ucsa_loader.cpp into libucsa_loader.so on first use; rebuilds
when the source is newer than the binary. No external build system needed —
one g++ invocation against system libjpeg/libpng.
"""

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "ucsa_loader.cpp")
LIB = os.path.join(_DIR, "libucsa_loader.so")


def build(force: bool = False) -> str:
    """Returns the path to the built shared library."""
    if (not force and os.path.isfile(LIB)
            and os.path.getmtime(LIB) >= os.path.getmtime(SRC)):
        return LIB
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        SRC, "-o", LIB, "-ljpeg", "-lpng", "-lpthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB


if __name__ == "__main__":
    print(build(force=True))
