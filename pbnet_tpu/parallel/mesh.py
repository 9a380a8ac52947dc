"""Device mesh helpers for data-parallel training.

The reference parallelizes with one process per GPU + NCCL DDP
(/root/reference/train.py:307-345).  TPU-native equivalent: a single process
driving a 1-D ``jax.sharding.Mesh`` over all local (or all global, via
``jax.distributed``) devices, with gradients averaged by ``psum`` over ICI
inside a ``shard_map`` — no external communication library.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0) -> Mesh:
    devs = jax.devices()
    if num_devices:
        devs = devs[:num_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def local_device_count(mesh: Mesh) -> int:
    """How many of this mesh's devices belong to THIS process (= how many
    host batches this process feeds per step)."""
    me = jax.process_index()
    return sum(1 for d in mesh.devices.flatten() if d.process_index == me)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches are stacked per-device along a leading axis -> shard axis 0."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, host_batches: list) -> dict:
    """Stack per-device host batches and device_put with the data sharding.

    Multi-host: each process passes its LOCAL device batches (one per local
    mesh device); the global array is assembled across processes.
    """
    stacked = {
        k: np.stack([b[k] for b in host_batches])
        for k in host_batches[0]
        if not isinstance(host_batches[0][k], (str, int))
    }
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(sh, v)
            for k, v in stacked.items()
        }
    return {k: jax.device_put(v, sh) for k, v in stacked.items()}
