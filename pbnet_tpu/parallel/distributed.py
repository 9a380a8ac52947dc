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


def initialize_from_config(cfg) -> tuple[int, int]:
    """Wire the reference's multi-node knobs (nodes/node_rank/tcp_port,
    /root/reference/config/config.py:59-64; rank = node_rank per host,
    /root/reference/train.py:321-324) into jax.distributed.

    ``cfg.coordinator`` ('host:port') names process 0's rendezvous; with
    ``nodes > 1`` but no coordinator, localhost:<tcp_port> is used — the same
    (single-machine-only) default the reference hard-codes.
    """
    if cfg.nodes <= 1 and not cfg.coordinator:
        return 0, 1
    coord = cfg.coordinator or f"127.0.0.1:{cfg.tcp_port}"
    return initialize(coord, num_processes=cfg.nodes, process_id=cfg.node_rank)


def local_data_rank() -> tuple[int, int]:
    """Shard spec for per-host input pipelines."""
    return jax.process_index(), jax.process_count()
