#!/usr/bin/env python
"""One-command checkpoint-parity harness.

The acceptance test for this framework is reproducing the reference's
published ScanNet v2 val numbers (mAP/AP50/AP25 = 56.4/71.4/80.3,
/root/reference/README.md:89) from the reference's own pretrained ``.pth``
(/root/reference/eval_map.py:200-205).  That needs real ScanNet data and the
real checkpoint — neither is available in the build environment — so this
script packages the whole chain into one command to run the day they exist:

  python tools/parity_eval.py --pth pretrain/000000452.pth \
      --scans /path/to/scans --data_root ./datasets/scannetv2

Steps:
  1. decode raw ScanNet val scans into the npy contract (skipped when
     ``--scans`` is omitted and ``<data_root>/npy`` already exists),
  2. generate the val-split GT txt files (val_gt/<scene>.txt),
  3. convert the torch checkpoint (tools/convert_checkpoint.py, ME
     x-fastest kernel-offset order),
  4. run the standalone eval driver (test-variant config: cluster_epoch=-1,
     batch 1, x3 TTA, NMS 0.10 / score 0.07 / npoints 101 thresholds,
     superpoint refinement — /root/reference/config/config_test.py,
     eval_map.py:40-158),
  5. print mAP/AP50/AP25 next to the published numbers.

Smoke-tested end-to-end on synthetic fixtures in
tests/test_extras.py::TestParityHarness (fabricated scenes + a synthetic
ME-format .pth through the identical code path).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE_NUMBERS = {"mAP": 56.4, "AP50": 71.4, "AP25": 80.3}


def build_argparser():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--pth", required=True,
                    help="reference PBNet checkpoint (.pth)")
    ap.add_argument("--scans", default=None,
                    help="raw ScanNet dir with a val/ subdir of "
                         "*_vh_clean_2.ply scans (decode_scannet.split_scans "
                         "layout); omit if <data_root>/npy is already decoded")
    ap.add_argument("--data_root", default="./datasets/scannetv2")
    ap.add_argument("--label_map", default=None,
                    help="scannetv2-labels.combined.tsv (raw decode only)")
    ap.add_argument("--max_scenes", type=int, default=None)
    ap.add_argument("--me_order", default="x_fastest",
                    choices=["x_fastest", "z_fastest"])
    # overrides for smoke tests / small-arch checkpoints
    ap.add_argument("--backbone_arch", default=None)
    ap.add_argument("--dunet_arch", default=None)
    ap.add_argument("--score_arch", default=None)
    return ap


def run_parity(cfg, pth_path: str, me_order: str = "x_fastest",
               max_scenes=None, logger=None):
    """decode-side inputs ready -> convert ckpt -> evaluate -> result dict."""
    from pbnet_tpu import engine
    from pbnet_tpu.data.dataset import Dataset
    from pbnet_tpu.parallel.train_step import TrainState
    from pbnet_tpu.tools import convert_checkpoint as cc
    from pbnet_tpu.tools import log as log_tools

    logger = logger or log_tools.get_logger(cfg)
    dataset = Dataset(cfg)
    if not dataset.val_file_list:
        raise FileNotFoundError(
            f"no val scenes under {cfg.data_root} (scannetv2_val.txt)"
        )
    model = engine.build_model(cfg, multi_device=False)
    sample = dataset.val_batch(0)
    init_model = engine.build_model(cfg, False, shapes=sample.get("shapes"))
    state, _ = engine.init_state(
        init_model, cfg, engine.device_batch(sample), cfg.manual_seed
    )

    params, stats = cc.load_reference_checkpoint(pth_path, me_order)
    merged, unmatched = cc.merge_into_variables(
        {"params": state.params, "batch_stats": state.batch_stats},
        params, stats,
    )
    n_conv = sum(
        x.size for x in _leaves(params)) + sum(x.size for x in _leaves(stats))
    logger.info(f"converted {pth_path}: {n_conv} weights")
    if unmatched:
        logger.warning(
            f"{len(unmatched)} converted tensors did not land on the model "
            f"tree (arch mismatch?): {unmatched[:8]}{'...' if len(unmatched) > 8 else ''}"
        )
    state = TrainState(merged["params"], merged["batch_stats"], state.opt_state)

    timing = {}
    res = engine.evaluate(
        cfg, model, state, dataset, epoch=cfg.epochs, logger=logger,
        max_scenes=max_scenes, test_mode=True, timing=timing,
    )
    return res, unmatched, timing


def _leaves(tree):
    for v in tree.values():
        if isinstance(v, dict):
            yield from _leaves(v)
        else:
            yield v


def main(argv=None, cfg=None):
    """``cfg`` overrides the test-variant config (used by the smoke test to
    substitute tiny shapes/archs; production runs build it from the flags)."""
    args = build_argparser().parse_args(argv)

    from pbnet_tpu.config import test_config
    from pbnet_tpu.data import decode_scannet as dec

    if cfg is None:
        cfg = test_config().replace(data_root=args.data_root, cache=False)
        for k in ("backbone_arch", "dunet_arch", "score_arch"):
            if getattr(args, k):
                cfg = cfg.replace(**{k: getattr(args, k)})

    npy_dir = os.path.join(cfg.data_root, "npy")
    if args.scans:
        print(f"decoding val scans from {args.scans} -> {npy_dir}")
        dec.decode_split(args.scans, "val", npy_dir, args.label_map)
    if not os.path.isdir(npy_dir):
        raise SystemExit(
            f"{npy_dir} missing — pass --scans to decode raw ScanNet data"
        )
    gt_dir = os.path.join(cfg.data_root, "val_gt")
    if not os.path.isdir(gt_dir):
        val_list = [
            l.strip() for l in open(
                os.path.join(cfg.data_root, "scannetv2_val.txt")
            ) if l.strip()
        ]
        dec.write_val_gt(npy_dir, val_list, gt_dir)

    res, unmatched, timing = run_parity(
        cfg, args.pth, args.me_order, args.max_scenes
    )
    print("\n=== parity vs reference (README.md:89, newest checkpoint) ===")
    for k, ref in REFERENCE_NUMBERS.items():
        ours = res.get(k)
        ours_s = f"{100 * ours:.1f}" if ours is not None else "n/a"
        print(f"{k:5s}: ours {ours_s}  reference {ref}")
    print(f"mIoU : ours {100 * res['mIoU']:.1f}")
    if timing.get("scenes_per_sec_warm"):
        print(f"throughput: {timing['scenes_per_sec_warm']} scenes/s (warm)")
    return res


if __name__ == "__main__":
    main()
