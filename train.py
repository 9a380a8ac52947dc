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

    import jax

    ndev = cfg.num_devices or len(jax.devices())
    cfg = cfg.replace(world_size=ndev, dist=ndev > 1)
    engine.train(cfg)


if __name__ == "__main__":
    main()
