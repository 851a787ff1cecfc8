"""Build the native host ops (csrc/ -> csrc/build/libccl.so).

Usage: python -m sam2unet_tpu.ops.build_native
The framework works without this (scipy fallback); the native path is the
fast route for the eval hot loop and predictor postprocessing.
"""

from __future__ import annotations

import os
import subprocess
import sys


def build(verbose: bool = True) -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    csrc = os.path.join(root, "csrc")
    out_dir = os.path.join(csrc, "build")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "libccl.so")
    src = os.path.join(csrc, "ccl.cc")
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-std=c++17", src, "-o", out,
    ]
    if verbose:
        print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print("built", path)
    sys.exit(0)
