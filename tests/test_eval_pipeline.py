"""End-to-end instance-eval glue: model proposals -> TTA merge -> thresholds
-> NMS -> superpoint refinement -> ScanNet AP, on a deterministic scene."""

import numpy as np
import jax
import jax.numpy as jnp

from pbnet_tpu.eval_pipeline import eval_scene_instances, proposals_to_masks
from pbnet_tpu.tools import eval_protocol as ev


class DummyCfg:
    TEST_SCORE_THRESH = 0.07
    TEST_NPOINT_THRESH = 101
    TEST_NMS_THRESH = 0.10


def fake_ret(n3, instances, scores, n_copies=3):
    """Fabricate model outputs: each instance -> one proposal whose points are
    spread over all TTA copies (the merge must fold them mod n3)."""
    n = n3 * n_copies
    srcs, pids, kept = [], [], []
    for pid, (lo, hi) in enumerate(instances):
        idx = np.arange(lo, hi)
        for c in range(n_copies):
            srcs.append(idx + c * n3)
            pids.append(np.full(len(idx), pid))
    src = np.concatenate(srcs)
    pid = np.concatenate(pids).astype(np.int32)
    t = len(src)
    return {
        "prop_point_src": jnp.asarray(src.astype(np.int32)),
        "prop_point_pid": jnp.asarray(pid),
        "prop_point_kept": jnp.ones(t, bool),
        "num_final_proposals": jnp.asarray(len(instances), jnp.int32),
        "clt_scores": jnp.asarray(np.asarray(scores, np.float32)),
        "prop_sem": jnp.asarray(np.full(len(instances), 4, np.int32)),  # chair
        "prop_valid": jnp.ones(len(instances), bool),
    }


class TestEvalPipeline:
    def test_tta_fold_and_masks(self):
        n3 = 600
        ret = fake_ret(n3, [(0, 200), (300, 500)], [0.9, 0.8])
        p = proposals_to_masks(ret, n3 * 3)
        assert p["masks"].shape == (2, n3)
        np.testing.assert_array_equal(p["masks"][0, :200], 1)
        np.testing.assert_array_equal(p["masks"][0, 200:], 0)
        assert p["masks"][1].sum() == 200

    def test_full_pipeline_perfect_ap(self):
        n3 = 600
        ret = fake_ret(n3, [(0, 200), (300, 500)], [0.9, 0.8])
        superpoint = np.arange(n3) // 10  # 60 superpoints of 10 verts
        pred_info = eval_scene_instances(ret, n3 * 3, superpoint, DummyCfg())
        assert pred_info is not None
        assert pred_info["mask"].shape[0] == 2
        assert set(pred_info["label_id"].tolist()) == {5}  # chair nyu40 id

        # GT: the same two instances, encoded ids
        gt = np.zeros(n3, np.int64)
        gt[0:200] = 5 * 1000 + 1
        gt[300:500] = 5 * 1000 + 2
        gt2pred, pred2gt = ev.assign_instances_for_scan("scene_t", pred_info, gt)
        aps = ev.evaluate_matches({"scene_t": {"gt": gt2pred, "pred": pred2gt}})
        avgs = ev.compute_averages(aps)
        assert np.isclose(avgs["classes"]["chair"]["ap"], 1.0)
        assert np.isclose(avgs["all_ap"], 1.0)

    def test_nms_suppresses_duplicates(self):
        n3 = 600
        # two identical proposals -> NMS keeps the higher-score one
        ret = fake_ret(n3, [(0, 200), (0, 200), (300, 500)], [0.5, 0.9, 0.8])
        pred_info = eval_scene_instances(ret, n3 * 3, np.arange(n3) // 10, DummyCfg())
        assert pred_info["mask"].shape[0] == 2

    def test_score_and_size_thresholds(self):
        n3 = 600
        # score 0.05 < 0.07 dropped; 50-point proposal < 101 dropped
        ret = fake_ret(n3, [(0, 200), (300, 350), (400, 550)], [0.9, 0.9, 0.05])
        pred_info = eval_scene_instances(ret, n3 * 3, np.arange(n3) // 10, DummyCfg())
        assert pred_info["mask"].shape[0] == 1
        np.testing.assert_array_equal(np.nonzero(pred_info["mask"][0])[0],
                                      np.arange(0, 200))

    def test_superpoint_refinement_snaps_masks(self):
        n3 = 600
        # proposal covers 195 of the 200 verts; superpoints are 10-vert blocks
        # -> refinement snaps the partial block back to full coverage
        ret = fake_ret(n3, [(0, 195), (300, 500)], [0.9, 0.8])
        sp = np.arange(n3) // 10
        pred_info = eval_scene_instances(ret, n3 * 3, sp, DummyCfg())
        m0 = pred_info["mask"][0]
        assert m0[:200].all()  # block 19 (verts 190..199) majority-voted in

    def test_no_survivors_returns_none(self):
        n3 = 600
        ret = fake_ret(n3, [(0, 200)], [0.01])
        assert eval_scene_instances(ret, n3 * 3, np.arange(n3) // 10, DummyCfg()) is None
