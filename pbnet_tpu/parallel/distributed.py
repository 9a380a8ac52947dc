"""Multi-host (multi-slice / multi-node) support.

The reference's multi-node knobs (nodes, node_rank, tcp_port,
/root/reference/config/config.py:59-64) map to jax.distributed: every host
runs the same train.py, JAX wires ICI within a slice and DCN across slices,
and the data loaders shard scenes by process index (the DistributedSampler
equivalent, /root/reference/datasets/scannetv2/dataset_preprocess.py:50).
"""

from __future__ import annotations

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> tuple[int, int]:
    """Initialize multi-host JAX if configured; returns (rank, world).

    Single-host (coordinator unset and JAX not already distributed) is a
    no-op returning (0, 1).
    """
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def local_data_rank() -> tuple[int, int]:
    """Shard spec for per-host input pipelines."""
    return jax.process_index(), jax.process_count()
