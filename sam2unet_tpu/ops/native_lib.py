"""Locate the native host libraries (libccl.so / libdataload.so).

Two layouts are supported:
  1. installed package data: ``sam2unet_tpu/_native/<name>`` — produced by
     the wheel build (setup.py compiles csrc/ into the package) or by
     ``python -m sam2unet_tpu.ops.build_native`` at an install site;
  2. in-repo dev build: ``<repo>/csrc/build/<name>`` — the historical
     location, still written by build_native for source checkouts.

The reference ships its one native component as a prebuilt binary next to
the package (sam2/_C.pyd); here the wheel carries the .so as package data
with the same "binary lives inside the package" deployment story.
"""

from __future__ import annotations

import os

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def native_search_paths(name: str) -> list[str]:
    repo = os.path.dirname(_PKG_DIR)
    return [
        os.path.join(_PKG_DIR, "_native", name),
        os.path.join(repo, "csrc", "build", name),
    ]


def find_native_lib(name: str) -> str | None:
    """Absolute path of the first existing copy of `name`, or None."""
    for path in native_search_paths(name):
        if os.path.exists(path):
            return path
    return None
