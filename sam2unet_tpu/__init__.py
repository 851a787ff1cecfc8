"""sam2unet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) segmentation framework.

Re-designed from scratch with the capabilities of hanguyenh2/SAM2-UNet
(SAM2-UNet: Segment Anything 2 Makes Strong Encoder for Natural and Medical
Image Segmentation, arXiv:2408.08870). Not a port: compute is expressed as
functional JAX transforms over NHWC tensors, hot attention paths have Pallas
TPU kernels, and scale-out rides `jax.sharding.Mesh` + XLA collectives.

Layering (bottom-up):
    ops/       pure-function TPU ops (resize, pooling, windowing, attention,
               connected components) + Pallas kernels under ops/pallas/
    nn/        flax.linen building blocks (Conv-BN, LayerNorm2d, MLP, ...)
    models/    Hiera trunk, SAM2-UNet, SAM2 heads/predictors
    parallel/  mesh + sharding policy
    data/      host decode + device-resident augmentation pipeline
    train/     loss, optimizer/schedule, jitted train engine, checkpoints
    eval/      metrics (semantic + instance segmentation)
    interop/   torch checkpoint converter, export
"""

# single-sourced from the installed distribution (pyproject.toml); the
# fallback covers running from a source checkout without installation
try:
    from importlib.metadata import version as _dist_version

    __version__ = _dist_version("sam2unet-tpu")
except Exception:  # pragma: no cover - uninstalled source tree
    __version__ = "0.2.0"

from sam2unet_tpu.configs import registry as config_registry  # noqa: F401
