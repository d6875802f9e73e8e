"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL DDP launch stack
(tools/dist_train.sh + MMDistributedDataParallel, SURVEY §2.10): a 1-D
`Mesh(('data',))` over ICI, batch sharded on 'data', parameters replicated.
GSPMD inserts the gradient all-reduces; the reference's explicit
`reduce_mean` sync points are recovered automatically because the loss is
written over the *global* batch under jit.

Scaling to multi-slice later is the same code with a larger mesh (DCN axis
prepended); no backend config, the mesh IS the backend.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch with leading batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
