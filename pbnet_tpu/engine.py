"""Training / evaluation engine: the TPU-native equivalent of the
reference's Distributed_training + train_epoch + eval_epoch
(/root/reference/train.py:36-388) and Single_card_testing
(/root/reference/eval_map.py:161-197).

Single process drives the whole device mesh (vs. one process per GPU +
NCCL); per-iteration console meters/ETA and per-epoch checkpointing keep the
reference's operational UX.
"""

from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .data.dataset import Dataset
from .eval_pipeline import eval_scene_instances
from .models.pbnet import PBNet
from .parallel import mesh as mesh_lib
from .parallel.train_step import (
    TrainState, cosine_lr_after_step, make_eval_step, make_optimizer,
    make_train_step,
)
from .tools import eval_protocol, log as log_tools, metrics


class ScalarWriter:
    """TensorBoard-equivalent scalar logging: JSONL always, TB if available."""

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        self.f = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self.tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(logdir)
        except Exception:
            pass

    def add_scalar(self, tag, value, step):
        self.f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self.f.flush()
        if self.tb is not None:
            self.tb.add_scalar(tag, value, step)

    def close(self):
        self.f.close()
        if self.tb is not None:
            self.tb.close()


def build_model(cfg: Config, multi_device: bool, shapes=None) -> PBNet:
    return PBNet(
        shapes=shapes or cfg.shapes,
        sem_num=cfg.sem_num,
        voxel_size=cfg.voxel_size,
        scale_size=cfg.scale_size,
        radius=cfg.radius,
        min_pts=cfg.min_pts,
        axis_name=mesh_lib.DATA_AXIS if (multi_device and cfg.sync_bn) else None,
        backbone_arch=cfg.backbone_arch,
        dunet_arch=cfg.dunet_arch,
        score_arch=cfg.score_arch,
    )


def init_state(model, cfg, sample_batch, seed=0):
    dev_batch = {k: jnp.asarray(v) for k, v in sample_batch.items()
                 if isinstance(v, np.ndarray) or hasattr(v, "shape")}
    init_fn = jax.jit(
        lambda key, b: model.init(
            key, b, with_instances=True, with_labels=True, train=False
        )
    )
    variables = init_fn(jax.random.PRNGKey(seed), dev_batch)
    tx = make_optimizer(cfg)
    opt_state = tx.init(variables["params"])
    return TrainState(variables["params"], variables["batch_stats"], opt_state), tx


def device_batch(batch: dict) -> dict:
    drop = {"num_points", "num_voxels", "num_instances", "fn", "sup",
            "shapes", "keep_idx", "orig_num_points", "dropped_sem"}
    return {k: np.asarray(v) for k, v in batch.items()
            if k not in drop and v is not None}


def scatter_cropped_masks(pred_info: dict, batch: dict) -> dict:
    """Expand proposal masks of a cropped oversize scene back to the full
    point count (dropped points belong to no proposal)."""
    keep = batch.get("keep_idx")
    if keep is None:
        return pred_info
    full = np.zeros(
        (pred_info["mask"].shape[0], batch["orig_num_points"]),
        pred_info["mask"].dtype,
    )
    full[:, keep] = pred_info["mask"]
    return dict(pred_info, mask=full)


def train(cfg: Config, dataset: Dataset | None = None, max_epochs: int | None = None,
          max_iters: int | None = None):
    """Full training driver with auto-resume (reference semantics:
    backbone-only through cluster_epoch, then the full pipeline)."""
    logger = log_tools.get_logger(cfg)
    writer = ScalarWriter(cfg.logpath)
    logger.info(str(cfg))

    dataset = dataset or Dataset(cfg)
    # multi-host sharding: this process loads scenes for its own devices only
    # (DistributedSampler equivalent, /root/reference/train.py:321-324)
    rank, world = jax.process_index(), jax.process_count()
    m = mesh_lib.make_mesh(cfg.num_devices)
    ndev = len(m.devices.flatten())
    if world == 1 and len(dataset.train_file_list) < ndev * cfg.batch_size:
        # fewer scenes than one global step consumes -> shrink the mesh
        ndev = max(1, len(dataset.train_file_list) // cfg.batch_size)
        m = mesh_lib.make_mesh(ndev)
        logger.warning(
            f"dataset has only {len(dataset.train_file_list)} scenes — "
            f"shrinking the mesh to {ndev} device(s) so one step fits"
        )
    ldev = mesh_lib.local_device_count(m)
    multi = ndev > 1
    model = build_model(cfg, multi)
    logger.info(f"devices: {ndev} ({ldev} local, rank {rank}/{world}) mesh: {m}")

    # init from one sample batch
    ids0 = dataset.train_epoch_ids(0)[0]
    sample = dataset.train_batch(ids0, np.random.RandomState(0))
    state, tx = init_state(model, cfg, device_batch(sample), cfg.manual_seed)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    logger.info(f"#Model parameters: {n_params}")

    # auto-resume (/root/reference/train.py:373-375)
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state}
    restored, start_epoch, ckfile = log_tools.checkpoint_restore(
        template, cfg.logpath, cfg.pretrain
    )
    state = TrainState(restored["params"], restored["batch_stats"], restored["opt_state"])
    logger.info(
        f"Restore from {ckfile}" if ckfile else f"Start from epoch {start_epoch}"
    )

    steps = {}
    iter_time = metrics.AverageMeter()
    total_iters = 0
    end_epoch = min(cfg.epochs, max_epochs or cfg.epochs)
    for epoch in range(start_epoch, end_epoch + 1):
        with_instances = epoch > cfg.cluster_epoch
        if with_instances not in steps:
            steps[with_instances] = make_train_step(model, cfg, m, tx, with_instances)
        step_fn = steps[with_instances]
        lr = cosine_lr_after_step(cfg.lr, epoch, cfg.step_epoch, cfg.epochs)

        batches = dataset.train_epoch_ids(epoch, rank=rank, world=world)
        # group per-LOCAL-device stacks; other hosts feed their own devices
        nsteps = len(batches) // ldev
        am = {}
        t_epoch = time.time()
        loader = dataset.train_loader(epoch, rank=rank, world=world)
        buf = []
        it = 0
        for batch in loader:
            buf.append(device_batch(batch))
            if len(buf) < ldev:
                continue
            t0 = time.time()
            if cfg.profile_steps and total_iters == 2:
                jax.profiler.start_trace(os.path.join(cfg.logpath, "profile"))
            stack = mesh_lib.shard_batch(m, buf)
            buf = []
            state, aux = step_fn(state, stack, lr)
            aux = {k: float(v) for k, v in aux.items()}
            dt = time.time() - t0
            iter_time.update(dt)
            it += 1
            total_iters += 1
            if cfg.profile_steps and total_iters == 2 + cfg.profile_steps:
                jax.profiler.stop_trace()
            for k, v in aux.items():
                am.setdefault(k, metrics.AverageMeter()).update(v)
            remain = (nsteps - it) + nsteps * (end_epoch - epoch)
            eta = remain * iter_time.avg
            sys.stdout.write(
                f"epoch: {epoch}/{cfg.epochs} iter: {it}/{nsteps} "
                f"loss: {aux['loss']:.4f}({am['loss'].avg:.4f}) "
                f"iter_time: {dt:.2f}({iter_time.avg:.2f}) "
                f"remain_time: {int(eta//3600):02d}:{int(eta%3600//60):02d}:{int(eta%60):02d}\n"
            )
            if max_iters and total_iters >= max_iters:
                break
        if buf:
            # drop-last semantics across the device dimension: a partial
            # device-group at epoch end cannot form a full mesh step.
            # Counted explicitly — never silent.
            logger.warning(
                f"epoch: {epoch}/{cfg.epochs}: dropped {len(buf)} leftover "
                f"batch(es) (< {ldev} local devices; drop-last across the "
                f"device dimension)"
            )
        if not am:
            # loader yielded fewer batches than local devices: no step ran
            logger.warning(
                f"epoch: {epoch}/{cfg.epochs}: loader yielded < {ldev} "
                f"batches — no training step executed (dataset too small "
                f"for the mesh × batch_size)"
            )
            continue
        logger.info(
            f"epoch: {epoch}/{cfg.epochs}, train loss: {am['loss'].avg:.4f}, "
            f"time: {time.time()-t_epoch:.1f}s"
        )
        over = {k: v.avg for k, v in am.items()
                if k.startswith("overflow") and v.avg > 0}
        if over:
            logger.warning(
                f"capacity overflow detected (work was dropped; raise "
                f"StaticShapes caps): {over}"
            )
        for k, v in am.items():
            writer.add_scalar(k + "_train", v.avg, epoch)
        writer.add_scalar("train/learning_rate", lr, epoch)
        ck = log_tools.checkpoint_save(
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state},
            cfg.logpath, epoch, cfg.save_freq,
        )
        logger.info(f"Saving {ck}")

        if cfg.validation and (epoch % 4 == 0 or epoch == cfg.epochs):
            try:
                evaluate(cfg, model, state, dataset, epoch, logger, writer,
                         mesh=m if multi else None)
            except FileNotFoundError as e:
                logger.info(f"validation skipped: {e}")
        if max_iters and total_iters >= max_iters:
            break
    writer.close()
    return state


def evaluate(cfg: Config, model, state, dataset, epoch, logger=None, writer=None,
             max_scenes: int | None = None, test_mode: bool = False,
             timing: dict | None = None, mesh=None):
    """Validation: semantic mIoU + (past cluster_epoch) instance AP
    (/root/reference/train.py:123-304, eval_map.py:40-158).

    test_mode=True reproduces the standalone eval driver (task='test'): no
    labels in the forward, so no proposals are skipped by GT-mode and no
    mask-accuracy meters (the reference's eval_map.py vs train.eval_epoch
    distinction, network/PBNet.py:164,206).

    With ``mesh`` (>1 device), scenes are sharded over the mesh devices —
    the reference's DistributedSampler-on-val equivalent (/root/reference/
    datasets/scannetv2/dataset_preprocess.py:59): scenes of the same size
    bucket are grouped N-at-a-time through one shard_map forward, outputs
    unstacked, and the host metric work runs per scene exactly as in the
    single-device path (so metrics are identical by construction).
    """
    with_instances = epoch > cfg.cluster_epoch
    use_labels = with_instances and not test_mode
    emit = logger.info if logger else print

    inter_m = np.zeros(cfg.sem_num)
    union_m = np.zeros(cfg.sem_num)
    target_m = np.zeros(cfg.sem_num)
    matches = {}
    gt_dir = os.path.join(cfg.data_root, "val_gt")

    # single-device eval path: one jitted forward per scene-size bucket (the
    # collate tags each batch with the smallest StaticShapes bucket it fits).
    # with_labels=True also yields the mask-accuracy meters of the
    # reference's in-train eval (/root/reference/train.py:152-168).
    fwd_cache = {}
    # timing keys must distinguish buckets even when StaticShapes.scaled
    # rounds two close scales to the same point_cap — label each DISTINCT
    # shapes object uniquely (primes on collision)
    bucket_key = {}

    def fwd(params, batch_stats, dev, shapes):
        new = shapes not in fwd_cache
        if new:
            m2 = model if shapes == model.shapes else build_model(
                cfg, multi_device=False, shapes=shapes
            )
            fwd_cache[shapes] = jax.jit(
                lambda p, s, b: m2.apply(
                    {"params": p, "batch_stats": s}, b,
                    with_instances=with_instances, with_labels=use_labels,
                    train=False,
                )
            )
            k = f"p{shapes.point_cap}/v{shapes.voxel_caps[0]}"
            while k in bucket_key.values():
                k += "'"
            bucket_key[shapes] = k
        t0 = time.time()
        out = fwd_cache[shapes](params, batch_stats, dev)
        if timing is not None:
            bk = bucket_key[shapes]
            if new:  # the first dispatch per bucket blocks on the XLA compile
                timing.setdefault("bucket_compile_s", {})[bk] = (
                    round(time.time() - t0, 1)
                )
            h = timing.setdefault("bucket_scene_counts", {})
            h[bk] = h.get(bk, 0) + 1
        return out

    all_acc = metrics.AverageMeter()
    tp_acc = metrics.AverageMeter()
    tf_acc = metrics.AverageMeter()
    n_scenes = len(dataset.val_file_list)
    if max_scenes:
        n_scenes = min(n_scenes, max_scenes)
    def scene_work(i, batch, ret):
        """Host-side per-scene metric work — PURE (no shared state): fetch,
        semantic histogram, mask stats, NMS/superpoint/AP assignment.  Runs
        on the worker pool; the serial accumulation happens in merge_scene.
        """
        out = {}
        n = batch["num_points"]
        ov = (int(ret.get("overflow_vox", 0)) + int(ret.get("overflow_grid", 0))
              + int(ret.get("overflow_band", 0)))
        if "overflow" in ret:
            ov += sum(int(v) for v in ret["overflow"].values())
        if ov:
            emit(
                f"WARNING {batch.get('fn', i)}: capacity overflow, {ov} items "
                f"dropped — raise StaticShapes caps"
            )
        sem_pred = np.asarray(ret["sem_pred_p"])[:n]
        sem_lab = batch["sem_label"][:n]
        out["iu"] = metrics.intersection_and_union(
            sem_pred, sem_lab, cfg.sem_num
        )
        if batch.get("keep_idx") is not None:
            # cropped oversize scene: dropped points carry no prediction, so
            # their GT classes count as misses (honest vs the reference,
            # which never drops)
            dsem = batch["dropped_sem"]
            out["dropped_cnt"] = np.bincount(
                dsem[(dsem >= 0) & (dsem < cfg.sem_num)], minlength=cfg.sem_num
            )[: cfg.sem_num]

        if with_instances and use_labels:
            pm = np.asarray(ret["mask_scores"]) >= 0.5
            gm = np.asarray(ret["gt_mask"])
            sv = np.asarray(ret["scene_valid"]) & (gm != -1.0)
            if sv.any():
                out["mask_all"] = float((pm[sv] == (gm[sv] == 1.0)).mean())
                pos = sv & (gm == 1.0)
                neg = sv & (gm == 0.0)
                if pos.any():
                    out["mask_tp"] = float(pm[pos].mean())
                if neg.any():
                    out["mask_tf"] = float(1.0 - pm[neg].mean())
        if with_instances:
            pred_info = eval_scene_instances(ret, n, batch["sup"], cfg)
            if pred_info is None:
                print("no cluster")
                return out
            pred_info = scatter_cropped_masks(pred_info, batch)
            gt_file = os.path.join(gt_dir, batch["fn"] + ".txt")
            gt_ids = eval_protocol.load_gt_ids(gt_file)
            gt2pred, pred2gt = eval_protocol.assign_instances_for_scan(
                batch["fn"], pred_info, gt_ids
            )
            out["match"] = (batch["fn"], {"gt": gt2pred, "pred": pred2gt})
            print(f"complete {i}, has {pred_info['mask'].shape[0]} clts")
        return out

    def merge_scene(out):
        """Serial accumulator merge (main thread only)."""
        inter, union, target = out["iu"]
        inter_m[:] += inter
        union_m[:] += union
        target_m[:] += target
        if "dropped_cnt" in out:
            union_m[:] += out["dropped_cnt"]
            target_m[:] += out["dropped_cnt"]
        if "mask_all" in out:
            all_acc.update(out["mask_all"])
        if "mask_tp" in out:
            tp_acc.update(out["mask_tp"])
        if "mask_tf" in out:
            tf_acc.update(out["mask_tf"])
        if "match" in out:
            fn, m_ = out["match"]
            matches[fn] = m_

    ndev = len(mesh.devices.flatten()) if mesh is not None else 1
    # Overlap discipline: the prefetch loader prepares scene i+1 on the host
    # while the device runs scene i and the worker pool runs earlier scenes'
    # fetch + NMS/superpoint/AP assignment (scene_work — pure, so multiple
    # workers run concurrently on multi-core hosts; the single-core
    # measurement VM degenerates to the old serial behavior).  Accumulators
    # are only touched by merge_scene on the main thread.  The bounded
    # in-flight window also bounds how many scenes' outputs stay live on
    # device.
    pw = max(1, min((os.cpu_count() or 1) - 1, 8))
    loader = dataset.val_loader(max_scenes=n_scenes)
    t_loop = time.time()
    n_done = 0
    if ndev > 1:
        # mesh path: group same-bucket scenes ndev-at-a-time through one
        # shard_map step; a partial trailing group pads by repeating its
        # first scene (padded outputs are discarded, never counted)
        rep = mesh_lib.replicated(mesh)
        params_r = jax.device_put(state.params, rep)
        stats_r = jax.device_put(state.batch_stats, rep)
        step_cache = {}

        def mesh_step(shapes):
            new = shapes not in step_cache
            if new:
                m2 = model if shapes == model.shapes else build_model(
                    cfg, multi_device=True, shapes=shapes
                )
                step_cache[shapes] = make_eval_step(
                    m2, mesh, with_instances, use_labels
                )
                k = f"p{shapes.point_cap}/v{shapes.voxel_caps[0]}"
                while k in bucket_key.values():
                    k += "'"
                bucket_key[shapes] = k
            return step_cache[shapes], new

        with ThreadPoolExecutor(max_workers=pw) as pool:
            pending = []

            def flush(shapes, group):
                nonlocal pending, n_done
                step, new = mesh_step(shapes)
                pad_n = ndev - len(group)
                stack = mesh_lib.shard_batch(
                    mesh,
                    [device_batch(b) for _, b in group]
                    + [device_batch(group[0][1])] * pad_n,
                )
                t0 = time.time()
                ret = step(params_r, stats_r, stack)
                if timing is not None:
                    bk = bucket_key[shapes]
                    if new:
                        timing.setdefault("bucket_compile_s", {})[bk] = (
                            round(time.time() - t0, 1)
                        )
                    h = timing.setdefault("bucket_scene_counts", {})
                    h[bk] = h.get(bk, 0) + len(group)
                while pending and len(pending) >= pw:  # window of 1 group
                    merge_scene(pending.pop(0).result())
                pending += [
                    pool.submit(
                        scene_work, i, b,
                        jax.tree_util.tree_map(lambda x, j=j: x[j], ret),
                    )
                    for j, (i, b) in enumerate(group)
                ]
                n_done += len(group)

            groups = {}
            for i, batch in enumerate(loader):
                sh_b = batch.get("shapes", cfg.shapes)
                groups.setdefault(sh_b, []).append((i, batch))
                if len(groups[sh_b]) == ndev:
                    flush(sh_b, groups.pop(sh_b))
            for sh_b in list(groups):
                flush(sh_b, groups.pop(sh_b))
            for p in pending:
                merge_scene(p.result())
    else:
        with ThreadPoolExecutor(max_workers=pw) as pool:
            pending = []
            for i, batch in enumerate(loader):
                dev = {k: jnp.asarray(v) for k, v in device_batch(batch).items()}
                ret = fwd(state.params, state.batch_stats, dev,
                          batch.get("shapes", cfg.shapes))
                while len(pending) >= pw:
                    merge_scene(pending.pop(0).result())
                pending.append(pool.submit(scene_work, i, batch, ret))
                n_done += 1
            for p in pending:
                merge_scene(p.result())
    if timing is not None:
        wall = time.time() - t_loop
        timing["wall_s"] = round(wall, 2)
        timing["scenes"] = n_done
        compile_s = sum(timing.get("bucket_compile_s", {}).values())
        timing["compile_s"] = round(compile_s, 1)
        if n_done:
            timing["scenes_per_sec"] = round(n_done / wall, 3)
            # steady-state throughput: exclude the one-time bucket compiles
            # (amortized by the persistent XLA cache across runs)
            timing["scenes_per_sec_warm"] = round(
                n_done / max(wall - compile_s, 1e-9), 3
            )

    iou_class = inter_m / (union_m + 1e-10)
    acc_class = inter_m / (target_m + 1e-10)
    miou, macc = float(np.mean(iou_class)), float(np.mean(acc_class))
    allacc = float(inter_m.sum() / (target_m.sum() + 1e-10))
    emit(f"mIoU/mAcc/allAcc {miou:.4f}/{macc:.4f}/{allacc:.4f}.")
    result = {"mIoU": miou, "mAcc": macc, "allAcc": allacc}
    if writer:
        writer.add_scalar("val/mIOU_eval", miou, epoch)
        writer.add_scalar("val/mAcc_eval", macc, epoch)
        writer.add_scalar("val/allACC_eval", allacc, epoch)
    if with_instances and matches:
        aps = eval_protocol.evaluate_matches(matches)
        avgs = eval_protocol.compute_averages(aps)
        eval_protocol.print_results(avgs, logger)
        result.update(
            mAP=float(avgs["all_ap"]), AP50=float(avgs["all_ap_50%"]),
            AP25=float(avgs["all_ap_25%"]),
        )
        result.update(mask_all_acc=all_acc.avg, mask_tp_acc=tp_acc.avg,
                      mask_tf_acc=tf_acc.avg)
        if writer:
            writer.add_scalar("val/mAP", avgs["all_ap"], epoch)
            writer.add_scalar("val/AP_50", avgs["all_ap_50%"], epoch)
            writer.add_scalar("val/AP_25", avgs["all_ap_25%"], epoch)
            writer.add_scalar("val/All_mask_acc", all_acc.avg, epoch)
            writer.add_scalar("val/Tp_acc", tp_acc.avg, epoch)
            writer.add_scalar("val/Fp_acc", tf_acc.avg, epoch)
    return result


def evaluate_pretrained(cfg: Config, max_scenes=None, timing: dict | None = None):
    """Standalone eval with auto-resumed checkpoint (eval_map.py driver)."""
    logger = log_tools.get_logger(cfg)
    dataset = Dataset(cfg)
    model = build_model(cfg, multi_device=False)
    sample = dataset.val_batch(0)
    # init through the sample's own size bucket (params are cap-independent)
    init_model = build_model(cfg, False, shapes=sample.get("shapes"))
    state, _ = init_state(init_model, cfg, device_batch(sample), cfg.manual_seed)
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state}
    restored, start_epoch, ckfile = log_tools.checkpoint_restore(
        template, cfg.logpath, cfg.pretrain
    )
    state = TrainState(restored["params"], restored["batch_stats"], restored["opt_state"])
    logger.info(
        f"Restore from {ckfile}" if ckfile else f"Start from epoch {start_epoch}"
    )
    return evaluate(cfg, model, state, dataset, epoch=start_epoch, logger=logger,
                    max_scenes=max_scenes, test_mode=True, timing=timing)


def write_submission(result_dir: str, scene_name: str, pred_info: dict):
    """ScanNet benchmark submission writer — the reference ships this
    commented out (/root/reference/eval_map.py:142-155); here it works."""
    os.makedirs(os.path.join(result_dir, "predicted_masks"), exist_ok=True)
    lines = []
    for pi in range(pred_info["mask"].shape[0]):
        mask_name = f"predicted_masks/{scene_name}_{pi:03d}.txt"
        lines.append(
            f"{mask_name} {int(pred_info['label_id'][pi])} "
            f"{float(pred_info['conf'][pi]):.4f}"
        )
        np.savetxt(
            os.path.join(result_dir, mask_name), pred_info["mask"][pi], fmt="%d"
        )
    with open(os.path.join(result_dir, scene_name + ".txt"), "w") as f:
        f.write("\n".join(lines))


def predict_testset(cfg: Config, max_scenes=None):
    """Test-split inference -> benchmark submission files under
    result/epoch{..}/test (the reference's result-dir naming,
    /root/reference/eval_map.py:28)."""
    logger = log_tools.get_logger(cfg)
    dataset = Dataset(cfg)
    model = build_model(cfg, multi_device=False)
    sample = dataset.test_batch(0)
    init_model = build_model(cfg, False, shapes=sample.get("shapes"))
    state, _ = init_state(init_model, cfg, device_batch(sample), cfg.manual_seed)
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state}
    restored, epoch, ckfile = log_tools.checkpoint_restore(
        template, cfg.logpath, cfg.pretrain
    )
    state = TrainState(restored["params"], restored["batch_stats"],
                       restored["opt_state"])
    result_dir = os.path.join(
        "result",
        f"epoch{cfg.test_epoch}_nmst{cfg.TEST_NMS_THRESH}_scoret"
        f"{cfg.TEST_SCORE_THRESH}_npointt{cfg.TEST_NPOINT_THRESH}",
        "test",
    )

    fwd_cache = {}

    def fwd(params, batch_stats, dev, shapes):
        if shapes not in fwd_cache:
            m2 = model if shapes == model.shapes else build_model(
                cfg, multi_device=False, shapes=shapes
            )
            fwd_cache[shapes] = jax.jit(
                lambda p, s, b: m2.apply(
                    {"params": p, "batch_stats": s}, b,
                    with_instances=True, with_labels=False, train=False,
                )
            )
        return fwd_cache[shapes](params, batch_stats, dev)

    n_scenes = len(dataset.test_file_list)
    if max_scenes:
        n_scenes = min(n_scenes, max_scenes)
    for i in range(n_scenes):
        batch = dataset.test_batch(i)
        dev = {k: jnp.asarray(v) for k, v in device_batch(batch).items()}
        ret = fwd(state.params, state.batch_stats, dev,
                  batch.get("shapes", cfg.shapes))
        pred_info = eval_scene_instances(ret, batch["num_points"], batch["sup"], cfg)
        if pred_info is None:
            logger.info(f"{batch['fn']}: no proposals")
            continue
        pred_info = scatter_cropped_masks(pred_info, batch)
        write_submission(result_dir, batch["fn"], pred_info)
        logger.info(f"{batch['fn']}: {pred_info['mask'].shape[0]} instances")
    return result_dir
