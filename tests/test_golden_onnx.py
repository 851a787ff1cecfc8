"""Golden-ONNX conformance corpus replay (external anchor for onnx_numpy).

The numpy ONNX runtime is the only engine on this image that executes the
exported artifact, so its opset conformance needs an anchor outside this
repo's own code paths: tests/golden_onnx/ holds small op-focused graphs
exported by torch.onnx with torch-computed expected outputs, generated
once by scripts/gen_golden_onnx.py and committed. This replay needs no
torch — the committed bytes ARE the oracle. Mirrors the role onnxruntime
plays for the reference (convert_onnx.py:69-107).
"""

import glob
import os

import numpy as np
import pytest

from sam2unet_tpu.deploy.onnx_numpy import NumpyOnnxRunner

CORPUS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden_onnx")
CASES = sorted(
    os.path.splitext(os.path.basename(p))[0]
    for p in glob.glob(os.path.join(CORPUS, "*.onnx"))
)


def test_corpus_present_and_broad():
    assert len(CASES) >= 12, CASES


@pytest.mark.parametrize("name", CASES)
def test_golden_case(name):
    data = np.load(os.path.join(CORPUS, f"{name}.npz"))
    ins = [data[k] for k in sorted(data.files) if k.startswith("in")]
    runner = NumpyOnnxRunner(os.path.join(CORPUS, f"{name}.onnx"))
    got = runner(*ins)
    outs = sorted(k for k in data.files if k.startswith("out"))
    assert list(got.keys()) == outs
    for k in outs:
        np.testing.assert_allclose(
            got[k], data[k], rtol=1e-4, atol=1e-5, err_msg=f"{name}:{k}"
        )
