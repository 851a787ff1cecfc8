"""Export + deployment harness tests (tiny model, StableHLO round trip)."""

import numpy as np
import pytest

from sam2unet_tpu.configs import HIERA_TEST, SAM2UNetConfig
from sam2unet_tpu.models.sam2unet import SAM2UNet


@pytest.fixture(scope="module")
def tiny_model():
    import jax
    import jax.numpy as jnp

    model = SAM2UNet(SAM2UNetConfig(trunk=HIERA_TEST, rfb_out=8))
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), x, train=False
    )
    return model, variables


def test_stablehlo_export_roundtrip(tiny_model, tmp_path):
    from sam2unet_tpu.interop.export import (
        export_stablehlo,
        load_exported,
        verify_export,
    )

    model, variables = tiny_model
    path = str(tmp_path / "model.stablehlo")
    data = export_stablehlo(model, variables, 64, path, platforms=("cpu",))
    assert len(data) > 1000

    diff = verify_export(model, variables, 64, path)
    assert diff < 1e-3  # far tighter than the reference's 1e-1 gate

    fn = load_exported(path)
    out = fn(np.zeros((1, 64, 64, 3), np.float32))
    assert set(out) == {"output", "output_1", "output_2"}
    assert out["output"].shape == (1, 64, 64, 1)


def test_onnx_export(tiny_model, tmp_path):
    """Runs the full jax2tf->tf2onnx path where tooling exists; on images
    without tensorflow/tf2onnx asserts the documented ImportError contract."""
    from sam2unet_tpu.interop.export import OUTPUT_NAMES, export_onnx

    model, variables = tiny_model
    path = str(tmp_path / "model.onnx")
    try:
        import tensorflow  # noqa: F401
        import tf2onnx  # noqa: F401
        import onnx  # noqa: F401
    except ImportError:
        with pytest.raises(ImportError, match="StableHLO"):
            export_onnx(model, variables, 64, path)
        return

    export_onnx(model, variables, 64, path)
    m = onnx.load(path)
    assert [o.name for o in m.graph.output] == list(OUTPUT_NAMES)
    assert m.graph.input[0].name == "images"


def test_deploy_segmenter(tiny_model, tmp_path):
    from sam2unet_tpu.deploy.segmenter import SamUnetSegmenter
    from sam2unet_tpu.interop.export import export_stablehlo

    model, variables = tiny_model
    path = str(tmp_path / "model.stablehlo")
    export_stablehlo(model, variables, 64, path, platforms=("cpu",))

    seg = SamUnetSegmenter(path, input_size=64, backend="stablehlo")
    rng = np.random.default_rng(0)
    image = (rng.random((50, 70, 3)) * 255).astype(np.uint8)
    mask = seg.segment(image)
    assert mask.shape == (50, 70)
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)) <= {0, 255}
    assert seg.last_process_time >= 0.0


def test_tf_savedmodel_export_runs(tiny_model, tmp_path):
    """The jax2tf leg of the ONNX deployment contract, executed for real:
    export a TF SavedModel, load it back with TensorFlow, run it, and
    verify output names + numerics against the native forward."""
    pytest.importorskip("tensorflow")
    from sam2unet_tpu.interop.export import (
        OUTPUT_NAMES,
        export_tf_savedmodel,
        verify_tf_savedmodel,
    )

    model, variables = tiny_model
    path = str(tmp_path / "saved_model")
    export_tf_savedmodel(model, variables, 64, path)
    diff = verify_tf_savedmodel(model, variables, 64, path)
    assert diff < 1e-3  # far tighter than the reference's 1e-1 gate

    import tensorflow as tf

    loaded = tf.saved_model.load(path)
    out = loaded.f(tf.zeros((1, 64, 64, 3)))
    assert set(out) == set(OUTPUT_NAMES)
    assert tuple(out["output"].shape) == (1, 64, 64, 1)


def test_deploy_segmenter_tf_backend_matches_stablehlo(tiny_model, tmp_path):
    """The segmenter's 'tf' backend (SavedModel) must produce the same
    uint8 mask as the StableHLO backend for the same weights."""
    pytest.importorskip("tensorflow")
    from sam2unet_tpu.deploy.segmenter import SamUnetSegmenter
    from sam2unet_tpu.interop.export import (
        export_stablehlo,
        export_tf_savedmodel,
    )

    model, variables = tiny_model
    p_hlo = str(tmp_path / "model.stablehlo")
    p_tf = str(tmp_path / "saved_model")
    export_stablehlo(model, variables, 64, p_hlo, platforms=("cpu",))
    export_tf_savedmodel(model, variables, 64, p_tf)

    rng = np.random.default_rng(1)
    image = (rng.random((50, 70, 3)) * 255).astype(np.uint8)
    m_hlo = SamUnetSegmenter(p_hlo, input_size=64,
                             backend="stablehlo").segment(image)
    m_tf = SamUnetSegmenter(p_tf, input_size=64, backend="tf").segment(image)
    assert m_tf.shape == (50, 70) and m_tf.dtype == np.uint8
    np.testing.assert_array_equal(m_tf, m_hlo)
