"""Device-mesh helpers for data parallelism over ICI (and DCN multi-slice).

Replaces the reference's whole distributed stack (SURVEY section 2.7:
torch.multiprocessing spawn + NCCL file:// rendezvous + rank-strided
sampler + manual grad all_reduce) with jax.sharding: a 1-D Mesh('data'),
batch sharded on the data axis, params replicated; XLA inserts the psum.

Multi-process (multi-host / multi-slice) support: the same 1-D mesh spans
all global devices; host batches enter through two distinct paths —
``shard_batch`` for host arrays every process computes identically at the
GLOBAL batch size (gen z/c/v, derived from a shared seed), and
``shard_host_local_batch`` for per-process data (real images from the
``jax.process_index()``-strided InfiniteSampler, the analog of the
reference's rank striding at torch_utils/misc.py:139). Both collapse to a
plain device_put in single-process runs. Tested with 2 real CPU processes
in tests/test_multiprocess.py.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), axis_names=("data",))


def shard_batch(batch, mesh: Mesh):
    """Shard host arrays that every process holds at GLOBAL batch size.

    Single-process: one device_put. Multi-process: each process contributes
    the rows of the global array its addressable devices own
    (jax.make_array_from_callback slices them out), so all processes must
    pass the SAME global-size host array (deterministic from a shared seed).
    """
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])
    return jax.tree.map(put, batch)


def shard_host_local_batch(batch, mesh: Mesh):
    """Shard host arrays of which each process holds only ITS slice
    (global batch = process-local batch x process_count; local rows feed
    this process's addressable devices). Single-process: plain device_put."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    def put(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x,
                                                      global_shape)
    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate params / optimizer state across the mesh (substitutes the
    reference's rank-0 broadcast, training_loop.py:241-245)."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
