"""Wheel packaging: the built wheel carries the native libs + configs.

The reference ships its native component as a prebuilt binary inside the
package (sam2/_C.pyd). Our wheel build (setup.py) compiles csrc/ into
sam2unet_tpu/_native/ as package data; this test builds the wheel,
installs it into an isolated directory, and verifies from a subprocess
(cwd outside the repo, so the csrc/build dev fallback can't mask a
packaging bug) that the native CCL and data-loader libraries resolve and
run from the installed package.
"""

import pathlib
import shutil
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")
@pytest.mark.slow
def test_wheel_ships_native_libs(tmp_path):
    wheel_dir = tmp_path / "dist"
    subprocess.run(
        [sys.executable, "-m", "pip", "wheel", str(REPO), "--no-deps",
         "--no-build-isolation", "-w", str(wheel_dir)],
        check=True, capture_output=True, text=True, cwd=REPO,
    )
    wheels = list(wheel_dir.glob("sam2unet_tpu-*.whl"))
    assert len(wheels) == 1, wheels
    # native build succeeded -> platform-tagged, not pure-Python
    assert "linux" in wheels[0].name

    target = tmp_path / "site"
    subprocess.run(
        [sys.executable, "-m", "pip", "install", "--target", str(target),
         "--no-deps", str(wheels[0]), "-q"],
        check=True, capture_output=True, text=True,
    )

    probe = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "import sam2unet_tpu\n"
        "assert sam2unet_tpu.__file__.startswith(%r), sam2unet_tpu.__file__\n"
        "from sam2unet_tpu.ops.native_lib import find_native_lib\n"
        "for name in ('libccl.so', 'libdataload.so'):\n"
        "    path = find_native_lib(name)\n"
        "    assert path and path.startswith(%r), (name, path)\n"
        "from sam2unet_tpu.ops import connected_components as cc\n"
        "assert cc._load_native(), 'native CCL failed to load'\n"
        "m = np.zeros((1, 1, 8, 8), np.bool_)\n"
        "m[..., 1:3, 1:3] = True; m[..., 5:7, 5:7] = True\n"
        "labels, counts = cc.label_components_native(m)\n"
        "assert labels.max() == 2 and counts.max() == 4\n"
        "import os, sam2unet_tpu.configs as C\n"
        "ypath = os.path.join(os.path.dirname(C.__file__), 'yaml',\n"
        "                     'sam2_hiera_t.yaml')\n"
        "assert C.load_yaml(ypath) == C.hiera_config('sam2_hiera_t')\n"
        "print('wheel ok')\n"
    ) % (str(target), str(target))
    out = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True, text=True, cwd=tmp_path,
        env={"PATH": "/usr/bin:/bin", "PYTHONPATH": str(target),
             "HOME": str(tmp_path)},
    )
    assert out.returncode == 0, out.stderr
    assert "wheel ok" in out.stdout
