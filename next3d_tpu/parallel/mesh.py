"""Device-mesh helpers for data parallelism over ICI.

Replaces the reference's whole distributed stack (SURVEY section 2.7:
torch.multiprocessing spawn + NCCL file:// rendezvous + rank-strided
sampler + manual grad all_reduce) with jax.sharding: a 1-D Mesh('data'),
batch sharded on the data axis, params replicated; XLA inserts the psum.
Multi-slice scaling reuses the same mesh over DCN.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(batch, mesh: Mesh):
    """Shard every leaf on its leading (batch) axis."""
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    """Replicate params / optimizer state across the mesh (substitutes the
    reference's rank-0 broadcast, training_loop.py:241-245)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
