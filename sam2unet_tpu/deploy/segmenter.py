"""Deployment inference harness (reference: test_onnx.py:33-237).

Backend-abstracted model loading + a segmenter implementing the exact
numpy pre/postprocess contract: letterbox to model size, normalize, run,
un-pad, sigmoid, resize to input resolution, threshold 0.1 -> uint8 mask.

Backends:
  - "stablehlo": serialized jax.export artifact (the TPU-native ONNX analog)
  - "tf": TensorFlow SavedModel (interop/export.export_tf_savedmodel),
    runnable + verified on this image
  - "onnx": onnxruntime session when installed, else the in-repo numpy
    ONNX runtime (deploy/onnx_numpy.py) — runnable + verified on this image
  - "openvino": stub that raises, mirroring test_onnx.py:104-120
"""

from __future__ import annotations

import abc
import time

import numpy as np

from sam2unet_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD
from sam2unet_tpu.ops.resize_np import resize_np

SCORE_THRESHOLD = 0.1


class ModelMixin:
    """Load/run abstraction (test_onnx.py:33-120)."""

    backend: str = "stablehlo"
    model = None

    def load(self, model_path: str, backend: str | None = None) -> None:
        backend = backend or self.backend
        if backend == "stablehlo":
            from sam2unet_tpu.interop.export import load_exported

            self.model = load_exported(model_path)
        elif backend == "tf":
            try:
                import tensorflow as tf
            except ImportError as e:
                raise ImportError("tensorflow not available") from e
            loaded = tf.saved_model.load(model_path)
            self.model = lambda x: {
                k: np.asarray(v)
                for k, v in loaded.f(tf.constant(np.asarray(x))).items()
            }
        elif backend == "onnx":
            try:
                import onnxruntime as ort

                self._session = ort.InferenceSession(model_path)
            except ImportError:
                # no onnxruntime on this image: execute the graph with the
                # in-repo numpy ONNX runtime (same session API surface)
                from sam2unet_tpu.deploy.onnx_numpy import NumpyOnnxRunner

                self._session = NumpyOnnxRunner(model_path)
            info = self._session.get_inputs()[0]
            self._onnx_input = info.name
            # torch-exported graphs are NCHW; framework exports are NHWC
            self._onnx_nchw = len(info.shape) == 4 and info.shape[1] == 3
            self.model = self._run_onnx
        elif backend == "openvino":
            raise NotImplementedError("OpenVINO backend is not supported")
        else:
            raise ValueError(f"unknown backend {backend}")
        self.backend = backend

    def _run_onnx(self, x):
        x = np.asarray(x)
        if self._onnx_nchw and x.ndim == 4 and x.shape[-1] == 3:
            x = x.transpose(0, 3, 1, 2)
        outs = self._session.run(None, {self._onnx_input: x})
        names = ["output"] + [f"output_{i}" for i in range(1, len(outs))]
        return dict(zip(names, outs))

    def run(self, x: np.ndarray) -> dict:
        if self.model is None:
            raise RuntimeError("call load() first")
        return self.model(x)


class BaseSegmenter(abc.ABC, ModelMixin):
    """(test_onnx.py:123-142)."""

    def __init__(self, model_path: str, input_size: int = 960,
                 backend: str = "stablehlo"):
        self.input_size = input_size
        self.last_process_time = 0.0  # defined before the first segment()
        self.load(model_path, backend)

    @abc.abstractmethod
    def segment(self, image: np.ndarray) -> np.ndarray: ...


def normalize_image(img: np.ndarray) -> np.ndarray:
    """HWC float [0,1] -> normalized (test_onnx.py:189-205 semantics)."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD


class SamUnetSegmenter(BaseSegmenter):
    """(test_onnx.py:145-237): full numpy pre/post pipeline around the
    exported model."""

    def preprocess(self, image: np.ndarray):
        """image: HWC uint8 RGB. Returns (batch (1,S,S,3), padding, hw)."""
        h, w = image.shape[:2]
        img = np.asarray(image, np.float32) / 255.0
        chw = img.transpose(2, 0, 1)
        scale = self.input_size / max(h, w)
        nh, nw = int(round(h * scale)), int(round(w * scale))
        resized = resize_np(chw, (nh, nw), "bilinear", antialias=True)
        pad_h, pad_w = self.input_size - nh, self.input_size - nw
        top, left = pad_h // 2, pad_w // 2
        bottom, right = pad_h - top, pad_w - left
        canvas = np.zeros((3, self.input_size, self.input_size), np.float32)
        canvas[:, top : top + nh, left : left + nw] = resized
        normed = normalize_image(canvas.transpose(1, 2, 0))  # HWC normalized
        return normed[None], (left, top, right, bottom), (h, w)

    def segment(self, image: np.ndarray) -> np.ndarray:
        """Returns a uint8 {0,255} mask at the input resolution; zeros on
        inference failure (test_onnx.py:166-171 behavior)."""
        try:
            batch, (left, top, right, bottom), (h, w) = self.preprocess(image)
            t0 = time.perf_counter()
            out = self.run(batch)["output"]
            self.last_process_time = time.perf_counter() - t0
            logits = np.asarray(out, np.float32)[0, ..., 0] \
                if out.ndim == 4 and out.shape[-1] == 1 else np.asarray(out)[0, 0]
            s = self.input_size
            logits = logits[top : s - bottom, left : s - right]
            prob = 1.0 / (1.0 + np.exp(-logits))
            prob = resize_np(prob[None, None], (h, w), "bilinear")[0, 0]
            return ((prob > SCORE_THRESHOLD) * 255).astype(np.uint8)
        except Exception:
            self.last_process_time = 0.0
            return np.zeros(image.shape[:2], np.uint8)
