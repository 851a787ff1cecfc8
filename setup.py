"""Wheel build with the native host ops baked in as package data.

The reference distributes its single native component as a prebuilt binary
inside the package (sam2/_C.pyd); the TPU framework's equivalents
(csrc/ccl.cc, csrc/dataload.cc — see SURVEY.md §2.3) are compiled here at
wheel-build time into ``sam2unet_tpu/_native/``. A missing toolchain (or
missing libjpeg for the loader) degrades to a pure-Python wheel: every
native consumer has a tested scipy/PIL fallback, so the wheel stays
functional — just without the fast host paths.

Build: ``pip wheel . --no-deps`` (or ``python -m build``).
"""

from __future__ import annotations

import os

from setuptools import Distribution, setup
from setuptools.command.build_py import build_py


class BinaryDistribution(Distribution):
    """Tag the wheel for the build platform: it carries compiled .so files
    (unless the toolchain fallback produced a pure-Python build)."""

    def has_ext_modules(self):
        return os.path.isdir(os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "csrc"))


class build_py_with_native(build_py):
    def run(self):
        super().run()
        here = os.path.dirname(os.path.abspath(__file__))
        csrc = os.path.join(here, "csrc")
        out_dir = os.path.join(self.build_lib, "sam2unet_tpu", "_native")
        if not os.path.isdir(csrc):
            print("csrc/ not present; building a pure-Python wheel")
            return
        try:
            from sam2unet_tpu.ops.build_native import compile_sources

            # portable codegen: the wheel must run on any machine of its
            # platform tag, not just hosts with this builder's ISA
            compile_sources(csrc, out_dir, verbose=True, portable=True)
        except Exception as exc:  # toolchain absent -> pure-Python wheel
            print(f"native build skipped ({exc}); pure-Python wheel "
                  "(scipy/PIL fallbacks stay in use)")
            # drop any stale dev-built .so copied in by package_data —
            # shipping another machine's -march=native binaries would
            # SIGILL instead of engaging the advertised fallbacks
            import glob

            for so in glob.glob(os.path.join(out_dir, "*.so")):
                os.remove(so)
                print(f"removed stale {so} from the wheel")


setup(cmdclass={"build_py": build_py_with_native},
      distclass=BinaryDistribution)
