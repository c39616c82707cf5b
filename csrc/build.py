"""Build the native host library: g++ -O2 -shared -> sba_native.so.

Usage: python csrc/build.py   (idempotent; skips if up to date)
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "sba_native.cpp")
OUT = os.path.join(HERE, "sba_native.so")


def build(force=False):
    if (
        not force
        and os.path.exists(OUT)
        and os.path.getmtime(OUT) >= os.path.getmtime(SRC)
    ):
        return OUT
    cmd = [
        "g++",
        "-O2",
        "-std=c++17",
        "-shared",
        "-fPIC",
        SRC,
        "-o",
        OUT,
        "-lpng",
        "-ljpeg",
        "-lz",
        "-lpthread",
    ]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
