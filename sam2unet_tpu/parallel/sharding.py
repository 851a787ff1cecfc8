"""Parameter sharding policy: tensor parallelism over the 'model' axis.

Large matmul weights shard on their output feature axis (Megatron-style
column split); everything else replicates. Because the train step is one
jit program over the mesh, XLA inserts the all-gathers/reduce-scatters —
the policy here only *places* the leaves.

Applies uniformly to params, Adam moments (same flat tree structure), and
batch stats (replicated).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sam2unet_tpu.parallel.mesh import MODEL_AXIS

# leaves smaller than this stay replicated (gather overhead dominates)
_MIN_SHARD_SIZE = 65536


def leaf_spec(arr, mesh: Mesh, min_size: int = _MIN_SHARD_SIZE) -> NamedSharding:
    tp = mesh.shape[MODEL_AXIS]
    if (
        tp > 1
        and hasattr(arr, "ndim")
        and arr.ndim >= 2
        and arr.shape[-1] % tp == 0
        and int(np.prod(arr.shape)) >= min_size
    ):
        return NamedSharding(
            mesh, P(*([None] * (arr.ndim - 1)), MODEL_AXIS)
        )
    return NamedSharding(mesh, P())


def tree_shardings(tree: Any, mesh: Mesh, min_size: int = _MIN_SHARD_SIZE) -> Any:
    return jax.tree.map(lambda a: leaf_spec(a, mesh, min_size), tree)


def shard_tree(tree: Any, mesh: Mesh, min_size: int = _MIN_SHARD_SIZE) -> Any:
    return jax.device_put(tree, tree_shardings(tree, mesh, min_size))
