"""Device mesh + sharding policy.

The reference has no distributed story (SURVEY.md §2.4); ours is defined
TPU-first: a 1-D (or 2-D data×model) `jax.sharding.Mesh`, batch sharded over
'data', parameters replicated (they are small: ~37M fp32). Gradient and
batch-stat reductions become XLA psums over ICI automatically — there is no
hand-written communication anywhere in the framework.

For multi-host pods, `jax.distributed.initialize()` + the same code applies:
jit handles cross-host collectives transparently.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: int | None = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))
