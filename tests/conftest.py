"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of "test multi-node without a cluster": XLA's
host platform is forced to expose 8 devices so sharding/collective code paths
compile and execute exactly as they would on a v5e-8 slice.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force CPU even if the env targets TPU
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

from sam2unet_tpu.utils.jax_setup import setup_jax  # noqa: E402

# The axon TPU plugin in this environment ignores JAX_PLATFORMS; the config
# knob still wins, so force the CPU backend explicitly.
jax.config.update("jax_platforms", "cpu")

setup_jax()
jax.config.update("jax_default_matmul_precision", "highest")
