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

            compile_sources(csrc, out_dir, verbose=True)
        except Exception as exc:  # toolchain absent -> pure-Python wheel
            print(f"native build skipped ({exc}); pure-Python wheel "
                  "(scipy/PIL fallbacks stay in use)")


setup(cmdclass={"build_py": build_py_with_native},
      distclass=BinaryDistribution)
