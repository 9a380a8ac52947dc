#!/usr/bin/env python
"""Training entry point — same public surface as the reference's train.py
(/root/reference/train.py:391-411) but one process drives the whole TPU mesh
(data parallelism over jax.sharding.Mesh, gradient pmean over ICI) instead of
mp.spawn + NCCL DDP.

Usage: python train.py [--epochs N] [--batch_size B] [--logpath DIR] ...
(see pbnet_tpu/config.py for every flag).
"""

import random

import numpy as np

import pbnet_tpu  # noqa: F401  (enables the persistent compile cache)
from pbnet_tpu import engine
from pbnet_tpu.config import get_parser


def main():
    cfg = get_parser()
    random.seed(cfg.manual_seed)
    np.random.seed(cfg.manual_seed)

    # multi-host rendezvous BEFORE any other JAX call (the reference's
    # init_process_group equivalent, /root/reference/train.py:323)
    from pbnet_tpu.parallel.distributed import initialize_from_config

    rank, world = initialize_from_config(cfg)

    import jax

    ndev = cfg.num_devices or len(jax.devices())
    cfg = cfg.replace(world_size=ndev, dist=ndev > 1, node_rank=rank, nodes=world)
    engine.train(cfg)


if __name__ == "__main__":
    main()
