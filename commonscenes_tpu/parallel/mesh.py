"""Device mesh + sharding utilities.

The reference's parallelism surface is a dormant DDP wrapper and hand-rolled
torch.distributed collectives (model/diff_utils/distributed.py:13-134,
sdfusion_txt2shape_model.py:114-156). The TPU-native equivalent is a single
``jax.sharding.Mesh`` with a ``data`` axis: parameters are replicated, batch
leaves are sharded on their leading axis, and XLA inserts the gradient
all-reduce over ICI (replacing reduce_loss_dict/DDP allreduce).

``shard_batch`` shards any GraphBatch/ShapeBatch pytree: leaves whose
leading dim is divisible by the mesh size are sharded there, everything else
is replicated — the diffusion ShapeBatch rides on its own leading S axis.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis: str = "data",
              devices=None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """Put a pytree on the mesh: leading-dim sharding where divisible."""
    n = mesh.devices.size
    data_sh = batch_sharding(mesh, axis)
    repl = replicated(mesh)

    def put(leaf):
        if leaf is None:
            return None
        arr = np.asarray(leaf) if not isinstance(leaf, jax.Array) else leaf
        if arr.ndim >= 1 and arr.shape[0] % n == 0 and arr.shape[0] > 0:
            return jax.device_put(arr, data_sh)
        return jax.device_put(arr, repl)

    return jax.tree.map(put, batch, is_leaf=lambda x: x is None)


def replicate_tree(mesh: Mesh, tree: Any) -> Any:
    repl = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, repl), tree)
