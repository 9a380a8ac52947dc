#!/usr/bin/env python
"""Standalone validation-set evaluation with a pretrained checkpoint — the
reference's eval_map.py surface (/root/reference/eval_map.py:200-205):
test-config defaults (cluster_epoch=-1 so the instance branch always runs,
checkpoints auto-resumed from ./pretrain/), ×3 rotation TTA, score/size
thresholds, NMS, superpoint refinement, ScanNet AP report.
"""

import random

import numpy as np

import pbnet_tpu  # noqa: F401
from pbnet_tpu import engine
from pbnet_tpu.config import get_parser


def main():
    cfg = get_parser(test=True)
    random.seed(cfg.manual_seed)
    np.random.seed(cfg.manual_seed)
    timing = {}
    result = engine.evaluate_pretrained(cfg, timing=timing)
    print(result)
    # deployment throughput: scenes/s over the whole overlapped eval loop
    # (the reference computes per-scene wall time but discards it,
    # /root/reference/eval_map.py:126) — see eval_throughput.py for the
    # measured synthetic-set figures
    print(timing)


if __name__ == "__main__":
    main()
