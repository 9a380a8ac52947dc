"""Tests for the remaining inventory: ResNet classifier, module freezing,
test-set submission writer, visualization, IoU ops, normals."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pbnet_tpu.core import topology as tp
from pbnet_tpu.nn import resnet
from pbnet_tpu.ops import iou as iou_ops
from pbnet_tpu.ops import normals
from pbnet_tpu.parallel.train_step import FIX_MODULE_MAP, freeze_grads
from pbnet_tpu.tools import metrics


def grid_level(rng, n=300, extent=40, batches=2):
    c = np.unique(
        np.stack(
            [rng.randint(0, batches, n), rng.randint(0, extent, n),
             rng.randint(0, extent, n), rng.randint(0, extent, n)], 1
        ).astype(np.int32),
        axis=0,
    )
    cap = c.shape[0] + 5
    cpad = np.zeros((cap, 4), np.int32)
    cpad[: c.shape[0]] = c
    valid = np.arange(cap) < c.shape[0]
    return tp.level_from_coords(jnp.asarray(cpad), jnp.asarray(valid), cap, 1)


class TestResNet:
    def test_classifier_forward(self, rng, fast_compile):
        lv = grid_level(rng)
        caps = [lv.cap] * 7
        topo = resnet.build_resnet_topology(lv, caps)
        strides = [l.stride for l in topo.levels]
        assert strides == [2, 4, 8, 16, 32, 64, 192]
        model = resnet.sparse_resnet(10, "ResNet14")
        feats = jnp.asarray(rng.randn(lv.cap, 3).astype(np.float32))
        feats = feats * lv.valid[:, None]
        bids = [l.coords[:, 0] for l in topo.levels]
        variables = model.init(jax.random.PRNGKey(0), topo, feats, bids, False)
        out = model.apply(variables, topo, feats, bids, False)
        assert out.shape == (8, 10)
        assert np.isfinite(np.asarray(out)).all()

    def test_unknown_arch(self):
        try:
            resnet.sparse_resnet(10, "ResNet7")
            assert False
        except ValueError:
            pass

    def test_resfieldnet_forward(self, rng, fast_compile):
        """ResFieldNet: sinusoidal point-field blocks -> voxel pooling ->
        classifier (/root/reference/network/Mink.py:145-198)."""
        lv = grid_level(rng)
        caps = [lv.cap] * 7
        topo = resnet.build_resnet_topology(lv, caps)
        model = resnet.sparse_resfieldnet(10, "ResFieldNet14")
        # a point field: ~3 points per voxel, mapped to their voxel rows
        P = lv.cap * 3
        p2v = np.repeat(np.arange(lv.cap, dtype=np.int32), 3)
        pvalid = np.asarray(lv.valid)[p2v]
        pfeats = jnp.asarray(rng.randn(P, 3).astype(np.float32))
        pfeats = pfeats * pvalid[:, None]
        bids = [l.coords[:, 0] for l in topo.levels]
        variables = model.init(
            jax.random.PRNGKey(0), topo, pfeats, jnp.asarray(p2v),
            jnp.asarray(pvalid), lv.valid, bids, False,
        )
        out = model.apply(variables, topo, pfeats, jnp.asarray(p2v),
                          jnp.asarray(pvalid), lv.valid, bids, False)
        assert out.shape == (8, 10)
        assert np.isfinite(np.asarray(out)).all()
        # the two field blocks + classifier all own parameters
        tops = set(variables["params"].keys())
        assert any(k.startswith("field1") for k in tops), tops
        assert any(k.startswith("field2") for k in tops), tops
        assert "resnet" in tops

    def test_unknown_field_arch(self):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            resnet.sparse_resfieldnet(10, "ResFieldNet7")


class TestFreeze:
    def test_freeze_grads_zeroes_mapped_modules(self):
        grads = {
            "MEUnet": {"w": jnp.ones((2, 2))},
            "linear_sem": {"w": jnp.ones((2,))},
            "linear_offset": {"w": jnp.ones((2,))},
            "score_Unet": {"w": jnp.ones((2,))},
        }
        out = freeze_grads(grads, ("Unet_backbone", "linear_off"))
        assert float(jnp.abs(out["MEUnet"]["w"]).sum()) == 0
        assert float(jnp.abs(out["linear_offset"]["w"]).sum()) == 0
        assert float(jnp.abs(out["linear_sem"]["w"]).sum()) == 2
        assert float(jnp.abs(out["score_Unet"]["w"]).sum()) == 2

    def test_noop_without_fix_modules(self):
        grads = {"a": jnp.ones(3)}
        assert freeze_grads(grads, ()) is grads


class TestIoUOps:
    def test_iou_matrix_matches_numpy(self, rng):
        T, P, I = 200, 4, 3
        pid = rng.randint(-1, P, T).astype(np.int32)
        ins = rng.randint(-1, I, T).astype(np.int32)
        ins[ins == -1] = -100
        valid = rng.rand(T) > 0.1
        pointnum = np.array([(ins == i).sum() for i in range(I)], np.int32)
        got = np.asarray(iou_ops.proposal_instance_iou(
            jnp.asarray(pid), jnp.asarray(ins), jnp.asarray(valid),
            jnp.asarray(pointnum), P, I,
        ))
        for p in range(P):
            sel = (pid == p) & valid
            for i in range(I):
                inter = ((ins == i) & sel).sum()
                union = pointnum[i] + sel.sum() - inter
                expect = inter / union if union > 0 else 0.0
                np.testing.assert_allclose(got[p, i], expect, atol=1e-6)

    def test_mask_label_mode(self, rng):
        # proposal exactly covering instance 0 -> labels 1 on its points
        T = 60
        pid = np.zeros(T, np.int32)
        ins = np.array([0] * 40 + [-100] * 20, np.int32)
        valid = np.ones(T, bool)
        pointnum = np.array([40, 10], np.int32)
        scores = np.full(T, 0.9, np.float32)
        ious, lbl = iou_ops.iou_and_mask_label(
            jnp.asarray(pid), jnp.asarray(ins), jnp.asarray(valid),
            jnp.asarray(scores), jnp.asarray(pointnum), 2, 2, mode=0,
        )
        lbl = np.asarray(lbl)
        assert float(np.asarray(ious)[0, 0]) > 0.5
        np.testing.assert_array_equal(lbl[:40], 1.0)
        np.testing.assert_array_equal(lbl[40:], 0.0)


class TestNormals:
    def test_device_matches_numpy(self, rng):
        from tests.test_data import make_grid_mesh

        xyz, faces = make_grid_mesh(8, z_fn=lambda x, y: np.sin(x * 0.3) * 0.4)
        a = normals.vertex_normals_np(xyz, faces)
        b = np.asarray(normals.vertex_normals(jnp.asarray(xyz), jnp.asarray(faces)))
        np.testing.assert_allclose(a, b, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)


class TestSubmission:
    def test_write_submission_format(self, tmp_path):
        from pbnet_tpu.engine import write_submission

        pred_info = {
            "conf": np.array([0.9, 0.5]),
            "label_id": np.array([5, 7]),
            "mask": np.array([[1, 0, 1, 0], [0, 1, 0, 0]], np.int32),
        }
        d = str(tmp_path / "res")
        write_submission(d, "scene0707_00", pred_info)
        main = open(os.path.join(d, "scene0707_00.txt")).read().splitlines()
        assert main[0].startswith("predicted_masks/scene0707_00_000.txt 5 0.9")
        m0 = np.loadtxt(os.path.join(d, "predicted_masks/scene0707_00_000.txt"))
        np.testing.assert_array_equal(m0, [1, 0, 1, 0])


class TestPlot:
    def test_render_returns_image(self, rng):
        from pbnet_tpu.tools import plot

        xyz = rng.rand(100, 3)
        labels = rng.randint(0, 5, 100)
        img = plot.get_ptcloud_img(
            xyz, labels, boxes=np.array([[0, 0, 0, 0.5, 0.5, 0.5]])
        )
        assert img.ndim == 3 and img.shape[2] == 3
        assert img.max() > 0


class TestMetricsExtras:
    def test_center_scores_ramp(self):
        d = np.array([0.1, 0.45, 0.9])
        s = metrics.get_center_scores(d)
        assert s[0] == 1.0 and s[2] == 0.0 and 0.0 < s[1] < 1.0


class TestParityHarness:
    def test_one_command_parity_smoke(self, rng, tmp_path, fast_compile):
        """tools/parity_eval.py end to end on synthetic fixtures: fabricated
        scenes -> decoded npy -> synthetic reference-FORMAT .pth -> convert ->
        full instance eval -> AP table.  The same command runs the real
        acceptance test the day ScanNet data + the reference .pth exist."""
        from tests.test_convert import write_reference_pth
        from tests.test_train import mini_cfg, prepare_dataset

        import tools.parity_eval as pe
        from pbnet_tpu import engine
        from pbnet_tpu.data.dataset import Dataset

        prepare_dataset(tmp_path, rng, n_scenes=1)
        cfg = mini_cfg(tmp_path, cluster_epoch=-1, epochs=1)

        # a reference-format checkpoint carrying a freshly initialized state
        ds = Dataset(cfg)
        sample = ds.val_batch(0)
        init_model = engine.build_model(cfg, False, shapes=sample.get("shapes"))
        state, _ = engine.init_state(
            init_model, cfg, engine.device_batch(sample), cfg.manual_seed
        )
        pth = str(tmp_path / "000000001.pth")
        write_reference_pth(
            {"params": state.params, "batch_stats": state.batch_stats}, pth
        )

        res = pe.main(
            ["--pth", pth, "--data_root", str(tmp_path), "--max_scenes", "1"],
            cfg=cfg,
        )
        # random weights produce junk predictions; the contract here is the
        # end-to-end glue: decode -> convert (no unmatched leaves) -> eval ->
        # metric dict with the AP fields present and in range
        assert 0.0 <= res["mIoU"] <= 1.0
        if "mAP" in res:  # absent only if no scene yields proposals
            assert 0.0 <= res["mAP"] <= 1.0
