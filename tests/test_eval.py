"""ScanNet AP protocol + NMS + superpoint alignment tests."""

import numpy as np
import jax.numpy as jnp

from pbnet_tpu.ops import nms
from pbnet_tpu.tools import eval_protocol as ev
from pbnet_tpu.tools import metrics


def scene_with(preds, n=1200, chair_range=(0, 300), table_range=(400, 800)):
    """GT: one chair (nyu40 5) instance + one table (nyu40 7) instance."""
    gt = np.zeros(n, np.int64)
    gt[chair_range[0]:chair_range[1]] = 5 * 1000 + 1
    gt[table_range[0]:table_range[1]] = 7 * 1000 + 1
    masks, labels, confs = [], [], []
    for label_id, rng_, conf in preds:
        m = np.zeros(n, np.int64)
        m[rng_[0]:rng_[1]] = 1
        masks.append(m)
        labels.append(label_id)
        confs.append(conf)
    pred_info = {
        "conf": np.array(confs, np.float64),
        "label_id": np.array(labels, np.int64),
        "mask": np.array(masks),
    }
    return gt, pred_info


class TestAPProtocol:
    def _run(self, gt, pred_info):
        gt2pred, pred2gt = ev.assign_instances_for_scan("scene0000_00", pred_info, gt)
        matches = {"scene0000_00": {"gt": gt2pred, "pred": pred2gt}}
        aps = ev.evaluate_matches(matches)
        return ev.compute_averages(aps)

    def test_perfect_predictions(self):
        gt, pred = scene_with([(5, (0, 300), 0.99), (7, (400, 800), 0.95)])
        avgs = self._run(gt, pred)
        assert np.isclose(avgs["classes"]["chair"]["ap"], 1.0)
        assert np.isclose(avgs["classes"]["table"]["ap"], 1.0)
        assert np.isclose(avgs["all_ap"], 1.0)  # nanmean over classes with GT

    def test_half_overlap_counts_at_25_not_50(self):
        # prediction covers half the chair -> IoU 0.5/(1.0+0.5-0.5)=0.5;
        # overlap must be STRICTLY greater than threshold
        gt, pred = scene_with([(5, (0, 150), 0.9), (7, (400, 800), 0.9)])
        avgs = self._run(gt, pred)
        c = avgs["classes"]["chair"]
        assert np.isclose(c["ap25%"], 1.0)
        assert np.isclose(c["ap50%"], 0.0)

    def test_missing_class_is_nan_and_excluded(self):
        gt, pred = scene_with([(5, (0, 300), 0.9), (7, (400, 800), 0.9)])
        avgs = self._run(gt, pred)
        assert np.isnan(avgs["classes"]["bed"]["ap"])
        assert np.isclose(avgs["all_ap"], 1.0)

    def test_false_positive_halves_ap(self):
        # chair-labeled FP over the table's (annotated, non-void) vertices
        gt, pred = scene_with(
            [(5, (0, 300), 0.9), (5, (400, 700), 0.95), (7, (400, 800), 0.9)]
        )
        avgs = self._run(gt, pred)
        # higher-confidence FP before the TP: precision at recall 1 is 0.5
        assert avgs["classes"]["chair"]["ap50%"] < 1.0

    def test_small_prediction_skipped(self):
        gt, pred = scene_with([(5, (0, 50), 0.9)])  # < 100 verts -> skipped
        avgs = self._run(gt, pred)
        assert np.isclose(avgs["classes"]["chair"]["ap"], 0.0)  # pure FN

    def test_void_overlap_not_fp(self):
        # prediction mostly on unannotated (void) vertices is ignored, not FP
        gt, pred = scene_with([(5, (0, 300), 0.9), (5, (850, 1150), 0.99)])
        avgs = self._run(gt, pred)
        assert np.isclose(avgs["classes"]["chair"]["ap50%"], 1.0)


class TestNMS:
    def test_device_matches_host(self, rng):
        p, n = 12, 400
        masks = (rng.rand(p, n) > 0.7).astype(np.float32)
        masks[3] = masks[1]  # exact duplicate
        scores = rng.rand(p).astype(np.float32)
        ious = np.asarray(nms.cross_iou(jnp.asarray(masks)))
        keep = np.asarray(
            nms.greedy_nms(jnp.asarray(ious), jnp.asarray(scores),
                           jnp.ones(p, bool), 0.3)
        )
        pick = nms.greedy_nms_np(ious, scores, 0.3)
        expect = np.zeros(p, bool)
        expect[pick] = True
        np.testing.assert_array_equal(keep, expect)

    def test_duplicate_suppressed(self, rng):
        masks = np.zeros((2, 200), np.float32)
        masks[:, :100] = 1
        ious = np.asarray(nms.cross_iou(jnp.asarray(masks)))
        keep = np.asarray(
            nms.greedy_nms(jnp.asarray(ious), jnp.asarray([0.5, 0.9], np.float32),
                           jnp.ones(2, bool), 0.5)
        )
        assert keep.tolist() == [False, True]


class TestSuperpointAlign:
    def test_majority_vote(self):
        sp = np.array([0, 0, 0, 1, 1, 1, 1, 2, 2])
        lab = np.array([3, 3, 5, -100, 7, 7, 7, -100, -100])
        sp_label, sp_scores = metrics.align_superpoint_label(lab, sp, num_label=20)
        assert sp_label[0] == 3
        assert sp_label[1] == 7
        assert sp_label[2] == -100
        assert np.isclose(sp_scores[0], 2 / 3)
