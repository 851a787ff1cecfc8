"""Build the native host ops (csrc/ -> sam2unet_tpu/_native/lib*.so).

Usage: python -m sam2unet_tpu.ops.build_native
Targets: libccl.so (connected components) and libdataload.so (JPEG decode +
fused letterbox/normalize; needs libjpeg, skipped with a notice if absent).
The framework works without either (scipy/PIL fallbacks); the native paths
are the fast route for the eval hot loop, predictor postprocessing, and the
data pipeline on multi-chip machines.

Outputs land in the package's `_native/` dir (so they ship inside the
installed package / wheel, mirroring the reference's sam2/_C.pyd layout)
and are mirrored to `csrc/build/` for in-repo use. The wheel build
(setup.py) reuses `compile_sources` to bake the .so files into the wheel.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys


def _compile(src: str, out: str, extra: list[str], verbose: bool,
             portable: bool = False) -> str:
    # portable=True (wheel builds): baseline x86-64 codegen so the wheel
    # runs on any machine of its platform tag — -march=native binaries
    # SIGILL on older hosts. Dev builds keep native tuning.
    arch = "-march=x86-64" if portable else "-march=native"
    cmd = [
        "g++", "-O3", arch, "-shared", "-fPIC",
        "-std=c++17", src, "-o", out, *extra,
    ]
    if verbose:
        print("+", " ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


def compile_sources(csrc: str, out_dir: str, verbose: bool = True,
                    portable: bool = False) -> list[str]:
    """Compile every native target from `csrc` into `out_dir`.

    libdataload.so is best-effort (needs libjpeg); libccl.so is required —
    a compile failure there raises. `portable` selects baseline-ISA
    codegen for distributable wheels.
    """
    os.makedirs(out_dir, exist_ok=True)
    built = [
        _compile(os.path.join(csrc, "ccl.cc"),
                 os.path.join(out_dir, "libccl.so"), [], verbose, portable)
    ]
    try:
        built.append(
            _compile(os.path.join(csrc, "dataload.cc"),
                     os.path.join(out_dir, "libdataload.so"), ["-ljpeg"],
                     verbose, portable)
        )
    except subprocess.CalledProcessError:
        print("libdataload.so skipped (libjpeg not available); "
              "the PIL data path remains in use")
    return built


def build(verbose: bool = True) -> list[str]:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    csrc = os.path.join(root, "csrc")
    pkg_native = os.path.join(root, "sam2unet_tpu", "_native")
    built = compile_sources(csrc, pkg_native, verbose)
    mirror = os.path.join(csrc, "build")
    os.makedirs(mirror, exist_ok=True)
    for so in built:
        shutil.copy2(so, os.path.join(mirror, os.path.basename(so)))
    return built


if __name__ == "__main__":
    for path in build():
        print("built", path)
    sys.exit(0)
