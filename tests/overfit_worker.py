"""Subprocess worker for the overfit-to-AP end-to-end test.

Trains the FULL three-stage pipeline (backbone -> offsets -> clustering ->
D_Unet masks -> ScoreNet) on two fabricated scenes until the instance AP@25
of engine.evaluate is high — the only available substitute for the
reference's validation-as-testing (/root/reference/train.py:123-304) given no
real ScanNet data in CI.  Proves the loop LEARNS: semantics + offsets drive
clustering, masks fit instances, scores follow IoU, and the AP protocol sees
the result.

The fabricated scenes must be LEARNABLE by a convolution net: a floor plane
plus box-shaped "chair" instances whose class is encoded in color and local
geometry (a flat grid with position-only class patches — the decode-path
fixture of tests/test_data.py — has no conv-visible signal, so CE floors at
the class-mix entropy and no clusters ever form).

Runs in its own process so jax_disable_most_optimizations (compile speed on
the 1-core CI host) never leaks into other tests.

Usage: python overfit_worker.py <outdir>
Writes <outdir>/result.json.
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_disable_most_optimizations", True)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

FLOOR_SEM = 1  # nyu40 "floor" -> semantic index 1
CHAIR_SEM = 4  # nyu40 "chair" -> semantic index 4 (instance class)


def box_surface(rng, center, size, n):
    """n points on the surface of an axis-aligned box + outward normals."""
    pts = np.empty((n, 3))
    nrm = np.zeros((n, 3))
    face = rng.randint(0, 6, n)
    uv = rng.rand(n, 2) - 0.5
    for f in range(6):
        m = face == f
        ax, sign = f // 2, 1.0 if f % 2 == 0 else -1.0
        o1, o2 = [a for a in range(3) if a != ax]
        pts[m, ax] = sign * 0.5
        pts[m, o1] = uv[m, 0]
        pts[m, o2] = uv[m, 1]
        nrm[m, ax] = sign
    return center + pts * size, nrm


def fabricate_npy_scene(npy_dir, name, rng, n_floor=500, n_chair=260):
    """Floor plane + 3 box chairs, class-coded colors; write the npy set."""
    os.makedirs(npy_dir, exist_ok=True)
    # floor: 2m x 2m plane at z ~ 0
    fx = rng.rand(n_floor, 2) * 2.0
    floor = np.concatenate([fx, rng.randn(n_floor, 1) * 0.003], 1)
    parts_xyz = [floor]
    parts_nl = [np.tile([0.0, 0.0, 1.0], (n_floor, 1))]
    parts_rgb = [np.tile([-0.5, -0.5, -0.4], (n_floor, 1)) + rng.randn(n_floor, 3) * 0.05]
    parts_sem = [np.full(n_floor, FLOOR_SEM, np.float64)]
    parts_ins = [np.full(n_floor, -100.0)]
    sup = [np.arange(n_floor) // 50]  # floor superpoint blocks
    next_sup = int(sup[0].max()) + 1
    centers = [(0.5, 0.5), (1.5, 0.55), (1.0, 1.55)]
    for i, (cx, cy) in enumerate(centers):
        p, nl = box_surface(rng, np.array([cx, cy, 0.2]), 0.3, n_chair)
        parts_xyz.append(p)
        parts_nl.append(nl)
        parts_rgb.append(
            np.tile([0.8, -0.3, -0.3], (n_chair, 1)) + rng.randn(n_chair, 3) * 0.05
        )
        parts_sem.append(np.full(n_chair, CHAIR_SEM, np.float64))
        parts_ins.append(np.full(n_chair, float(i)))
        sup.append(np.full(n_chair, next_sup + i))
    pre = os.path.join(npy_dir, name)
    np.save(pre + "_xyz.npy", np.concatenate(parts_xyz))
    np.save(pre + "_rgb.npy", np.concatenate(parts_rgb))
    np.save(pre + "_nl.npy", np.concatenate(parts_nl))
    np.save(pre + "_sem_label.npy", np.concatenate(parts_sem))
    np.save(pre + "_ins_label.npy", np.concatenate(parts_ins))
    np.save(pre + "_sup.npy", np.concatenate(sup).astype(np.int64))


def view_batch(ds, idx, views, full_bucket=False, rot_rng=None):
    """A collated batch of the scene rendered at the given TTA view indices
    (mirrors Dataset.val_batch, which uses views (0, 1, 2)).  full_bucket
    pads to cfg.shapes (the train step's compiled shapes).  With ``rot_rng``
    each copy gets a RANDOM z-rotation (the production train augmentation)
    instead of the deterministic TTA angle."""
    from pbnet_tpu.data import augment

    fn = ds.val_file_list[idx]
    s = ds._load_scene(fn, with_sup=True)
    s, keep, orig_n = ds._fit_eval_scene(s)
    rng = rot_rng if rot_rng is not None else np.random.RandomState(0)
    scenes = []
    for i in views:
        xyz, rgb, nl = augment.data_augment(
            s["xyz"].copy(), s["rgb"].copy(), s["nl"], i, rng,
            rot=rot_rng is not None,
        )
        ins = augment.compact_instance_labels(s["ins"].copy())
        scenes.append((fn, xyz, rgb, nl, s["sem"].copy(), ins))
    batch = ds._collate(
        scenes, buckets=None if full_bucket else ds.cfg.eval_buckets()
    )
    batch["sup"] = s["sup"]
    batch["fn"] = fn
    batch["keep_idx"] = keep
    batch["orig_num_points"] = orig_n
    batch["dropped_sem"] = None
    return batch


def main():
    outdir = sys.argv[1]
    heldout = "--heldout" in sys.argv[2:]
    from pbnet_tpu import engine
    from pbnet_tpu.config import Config, StaticShapes
    from pbnet_tpu.data.dataset import Dataset
    from pbnet_tpu.data.decode_scannet import write_val_gt
    from pbnet_tpu.parallel import mesh as mesh_lib
    from pbnet_tpu.parallel.train_step import make_train_step

    rng = np.random.RandomState(0)
    npy = os.path.join(outdir, "npy")
    names = []
    for i in range(2):
        nm = f"scene{i:04d}_00"
        fabricate_npy_scene(npy, nm, rng)
        names.append(nm)
    np.savetxt(os.path.join(outdir, "scannetv2_train.txt"), names, fmt="%s")
    np.savetxt(os.path.join(outdir, "scannetv2_val.txt"), names, fmt="%s")
    np.savetxt(os.path.join(outdir, "scannetv2_test.txt"), names[:1], fmt="%s")
    write_val_gt(npy, names, os.path.join(outdir, "val_gt"))

    # level caps do NOT shrink 2x per stride for these dense box surfaces
    # (real-scan ratios don't apply to tiny synthetic scenes) — keep them
    # generous; overflow at any level silently degrades clustering
    shapes = StaticShapes(
        point_cap=4096, voxel_caps=(4096, 4096, 2048, 1024, 512),
        cluster_cap=16, local_point_cap=8192,
        local_voxel_caps=(8192, 8192, 4096, 2048, 1024),
        score_voxel_caps=(8192, 8192, 4096, 2048, 1024),
        instance_cap=16, cluster_band=1024,
    )
    cfg = Config(
        data_root=outdir, batch_size=1, max_crop_p=4000, min_crop_p=10,
        num_works=0, cache=False, shapes=shapes, mixup=False,
        cluster_epoch=-1, validation=False, logpath=os.path.join(outdir, "log"),
    )
    ds = Dataset(cfg)
    mesh = mesh_lib.make_mesh(1)
    model = engine.build_model(cfg, multi_device=False)
    # Train on the EXACT batches evaluate() will see: each val batch holds
    # the scene's 3 deterministic TTA rotations.  Semantics transfer across
    # views via the color cue, but offset VECTORS are view-specific (convs
    # are not rotation-equivariant) — training on other views leaves eval
    # offsets wrong and no clusters form.  Memorizing the eval views is the
    # honest machinery proof available without real data.
    #
    # --heldout (round-3 VERDICT item 8) upgrades memorization to
    # generalization: train with the production RANDOM-rotation augmentation
    # (fresh batches every step), then evaluate on the standard TTA views —
    # rotations the net never exactly saw.  (Training on two FIXED views and
    # evaluating a third fails outright — AP25 = 0 measured: convs cannot
    # extrapolate offset fields across an unseen 2pi/3 rotation from two
    # examples — so rotation robustness must come from augmentation, exactly
    # as the reference trains, dataset_preprocess.py:81-88.)
    aug_rng = np.random.RandomState(7)
    if heldout:
        raw = [view_batch(ds, i, (0, 1), full_bucket=True) for i in range(2)]
    else:
        raw = [ds.val_batch(i) for i in range(2)]
    # the training batches must sit in the FULL bucket (== cfg.shapes), so
    # the arrays match the training model's static shapes (heldout batches
    # collate without buckets and carry no "shapes" key)
    assert all(b.get("shapes", cfg.shapes) == cfg.shapes for b in raw), [
        b.get("shapes", cfg.shapes).point_cap for b in raw
    ]
    batches = [engine.device_batch(b) for b in raw]
    state, tx = engine.init_state(model, cfg, batches[0])

    def train_stack(it):
        if heldout:  # fresh random rotation every step
            b = engine.device_batch(view_batch(
                ds, it % 2, (0, 1), full_bucket=True, rot_rng=aug_rng))
        else:
            b = batches[it % 2]
        return mesh_lib.shard_batch(mesh, [b])

    step_bb = make_train_step(model, cfg, mesh, tx, with_instances=False)
    step_full = make_train_step(model, cfg, mesh, tx, with_instances=True)

    # phase 1: backbone-only (cheap steps) until semantics + offsets lock in
    t0 = time.time()
    for it in range(150):
        stack = train_stack(it)
        state, aux = step_bb(state, stack, 1e-3)
        if it % 25 == 24:
            print(f"bb step {it+1}: sem={float(aux['semantic_loss']):.4f} "
                  f"off={float(aux['offset_norm_loss']):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    sem_loss_after_bb = float(aux["semantic_loss"])

    # phase 2: full pipeline; mask/score losses must trend down
    hist = {"mask_loss": [], "score_loss": [], "loss": [],
            "semantic_loss": []}
    ap25 = 0.0
    ap_target = 0.5 if heldout else 0.9
    result = {}
    for round_i in range(3):
        for it in range(40):
            stack = train_stack(it)
            state, aux = step_full(state, stack, 1e-3)
            for k in hist:
                hist[k].append(float(aux[k]))
            if it % 10 == 9:
                print(f"full step {it+1}: sem={hist['semantic_loss'][-1]:.4f} "
                      f"mask={hist['mask_loss'][-1]:.4f} "
                      f"score={hist['score_loss'][-1]:.4f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        res = engine.evaluate(cfg, model, state, ds, epoch=1)
        ap25 = float(res.get("AP25", 0.0))
        result = dict(res)
        print(f"round {round_i}: AP25={ap25:.3f} ({time.time()-t0:.0f}s)",
              flush=True)
        if ap25 >= ap_target:
            break
    result["sem_loss_final"] = float(np.mean(hist["semantic_loss"][-5:]))

    result.update(
        sem_loss_after_bb=sem_loss_after_bb,
        mask_loss_first=float(np.mean(hist["mask_loss"][:5])),
        mask_loss_last=float(np.mean(hist["mask_loss"][-5:])),
        score_loss_first=float(np.mean(hist["score_loss"][:5])),
        score_loss_last=float(np.mean(hist["score_loss"][-5:])),
        steps_full=len(hist["loss"]),
    )
    with open(os.path.join(outdir, "result.json"), "w") as f:
        json.dump(result, f)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
