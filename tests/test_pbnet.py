"""End-to-end PBNet model tests on tiny synthetic scenes (CPU).

Stage-2/3 semantics are tested by feeding a handcrafted stage-1 output
(ground-truth semantics + perfect offsets) so clustering is deterministic.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pbnet_tpu.config import StaticShapes
from pbnet_tpu.models import losses as L
from pbnet_tpu.models.pbnet import PBNet

TINY = StaticShapes(
    point_cap=2048,
    # 2 pyramid levels matching the Mini_Unet fixture archs below: the
    # deep-pyramid paths are covered by test_nn (UNet14A/34C) and test_core
    # (5-level topologies); cutting 3 levels x 3 UNets here halves the
    # dominant XLA:CPU compile of this module's fixtures
    voxel_caps=(1024, 512),
    cluster_cap=16,
    local_point_cap=4096,
    local_voxel_caps=(1024, 512),
    score_voxel_caps=(1024, 512),
    instance_cap=8,
    cluster_band=1024,
    # exercise the fg-compaction + capped exact-1NN clustering path
    # (test_train's TINY leaves these None, covering the default path)
    fg_point_cap=1024,
    nn_exact_cap=128,
)


def synthetic_batch(rng, n_pts=900, pad=2048):
    """Two chair instances (class 4 -> count_mean 2303 is too big for the
    gate, so use class 10 'picture', count_mean 1003 -> 0.05*1003=50 pts) plus
    floor points (class 0, never clustered)."""
    per = n_pts // 3
    inst0 = np.array([1.0, 1.0, 0.5]) + rng.randn(per, 3) * 0.15
    inst1 = np.array([3.0, 2.0, 0.5]) + rng.randn(per, 3) * 0.15
    floor = np.concatenate(
        [rng.rand(n_pts - 2 * per, 2) * 4.0, np.zeros((n_pts - 2 * per, 1))], 1
    )
    xyz = np.concatenate([inst0, inst1, floor]).astype(np.float32)
    xyz -= xyz.min(0)
    sem = np.array([10] * per + [10] * per + [0] * (n_pts - 2 * per), np.int32)
    ins = np.array([0] * per + [1] * per + [-100] * (n_pts - 2 * per), np.int32)

    n = xyz.shape[0]
    from pbnet_tpu.core.quantize import sparse_quantize_np

    vox, index, inverse = sparse_quantize_np(xyz, 0.02)
    vcap = TINY.voxel_caps[0]
    vox_coords = np.zeros((vcap, 4), np.int32)
    m = vox.shape[0]
    assert m <= vcap, m
    vox_coords[:m, 1:] = vox
    feats = np.zeros((vcap, 6), np.float32)
    feats[:m] = rng.randn(m, 6) * 0.1
    vox_valid = np.arange(vcap) < m

    pcap = pad
    xyz_p = np.zeros((pcap, 3), np.float32)
    xyz_p[:n] = xyz
    pvalid = np.arange(pcap) < n
    sem_p = np.full(pcap, -100, np.int32)
    sem_p[:n] = sem
    ins_p = np.full(pcap, -100, np.int32)
    ins_p[:n] = ins

    # instance info: per-point instance mean/min/max
    info = np.full((pcap, 9), -100.0, np.float32)
    pointnum = np.zeros(TINY.instance_cap, np.int32)
    for i in range(2):
        idx = np.nonzero(ins == i)[0]
        info[idx, 0:3] = xyz[idx].mean(0)
        info[idx, 3:6] = xyz[idx].min(0)
        info[idx, 6:9] = xyz[idx].max(0)
        pointnum[i] = len(idx)

    return {
        "vox_coords": jnp.asarray(vox_coords),
        "vox_feats": jnp.asarray(feats),
        "vox_valid": jnp.asarray(vox_valid),
        "xyz": jnp.asarray(xyz_p),
        "point_batch": jnp.zeros(pcap, jnp.int32),
        "point_valid": jnp.asarray(pvalid),
        "sem_label": jnp.asarray(sem_p),
        "ins_label": jnp.asarray(ins_p),
        "inst_info": jnp.asarray(info),
        "instance_pointnum": jnp.asarray(pointnum),
    }, n


@pytest.fixture(scope="module")
def model_and_vars(fast_compile_module):
    # fast_compile_module: this module's tests assert structure/finiteness,
    # not golden values — XLA:CPU backend-opt time is pure overhead here
    rng = np.random.RandomState(7)
    batch, n = synthetic_batch(rng)
    # smallest family member: same stage-1/2/3 code paths with far less
    # XLA:CPU compile; the real 34C layout stays pinned by test_convert's
    # golden checkpoint-parity tests
    model = PBNet(shapes=TINY, backbone_arch="Mini_Unet",
                  dunet_arch="Mini_Unet", score_arch="Mini_Unet")
    variables = jax.jit(
        lambda key, b: model.init(
            key, b, with_instances=True, with_labels=True, train=False
        )
    )(jax.random.PRNGKey(0), batch)
    return model, variables, batch, n


class TestBackbone:
    def test_stage1_shapes(self, model_and_vars):
        model, variables, batch, n = model_and_vars
        ret = jax.jit(
            lambda v, b: model.apply(
                v, b, with_instances=False, with_labels=False, train=False
            )
        )(variables, batch)
        assert ret["sem_pred_score_p"].shape == (2048, 20)
        assert ret["offset_pred_p"].shape == (2048, 3)
        ok = np.asarray(ret["point_ok"])
        assert ok[:n].all() and not ok[n:].any()
        assert np.isfinite(np.asarray(ret["sem_pred_score_p"])).all()


class TestInstanceStage:
    def _perfect_bb(self, model, variables, batch, n):
        """Stage-1 output with GT semantics and offsets pointing at centers."""
        ret = jax.jit(
            lambda v, b: model.apply(v, b, False, method=PBNet.backbone)
        )(variables, batch)
        sem = batch["sem_label"]
        ok = ret["point_ok"]
        centers = batch["inst_info"][:, 0:3]
        offsets = jnp.where(
            (batch["ins_label"] != -100)[:, None], centers - batch["xyz"], 0.0
        )
        feat32 = jnp.tile(jnp.ones((1, 32)) * 0.1, (sem.shape[0], 1))
        soft = jax.nn.one_hot(jnp.clip(sem, 0, 19), 20) * 0.9 + 0.005
        return {
            "topo": ret["topo"],
            "point_feat_p": feat32,
            "sem_pred_score_p": soft * 10,
            "sem_soft_p": soft,
            "offset_pred_p": offsets,
            "sem_pred_p": jnp.where(ok, jnp.clip(sem, 0, 19), -1).astype(jnp.int32),
            "point_ok": ok,
        }

    def test_two_instances_two_proposals(self, model_and_vars):
        model, variables, batch, n = model_and_vars
        bb = self._perfect_bb(model, variables, batch, n)
        out = jax.jit(
            lambda v, b, s1: model.apply(
                v, b, s1, True, False, method=PBNet.instance_stage
            )
        )(variables, batch, bb)
        # two clusters -> two proposals
        assert int(out["cluster"].num_clusters) == 2
        assert int(out["num_proposals"]) == 2
        assert int(out["scene_overflow"]) == 0
        # every fg point clustered (perfect offsets collapse blobs)
        cid = np.asarray(out["cluster"].cluster_id)
        sem = np.asarray(batch["sem_label"])
        fg = sem == 10
        assert (cid[fg[: cid.shape[0]] & (np.arange(cid.shape[0]) < n)] >= 0).mean() > 0.99
        # gt_mask: own-cluster points are 1 (clusters == instances here)
        gm = np.asarray(out["gt_mask"])
        sv = np.asarray(out["scene_valid"])
        assert set(np.unique(gm[sv]).tolist()) <= {0.0, 1.0}
        # scores exist per final proposal
        assert np.isfinite(np.asarray(out["clt_scores"])).all()
        assert np.asarray(out["mask_scores"])[sv].min() >= 0
        assert np.asarray(out["mask_scores"])[sv].max() <= 1

    def test_losses_finite_and_grad(self, model_and_vars):
        model, variables, batch, n = model_and_vars

        class CfgLike:
            fg_thresh = 0.95
            bg_thresh = 0.20

        def loss_fn(params):
            ret, _ = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                batch, with_instances=True, with_labels=True, train=True,
                mutable=["batch_stats"],
            )
            loss, aux = L.model_fn(ret, batch, CfgLike(), with_instances=True)
            return loss, aux

        (loss, aux), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(variables["params"])
        assert np.isfinite(float(loss))
        for k, v in aux.items():
            assert np.isfinite(float(v)), k
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)

    def test_eval_mode_no_labels(self, model_and_vars):
        model, variables, batch, n = model_and_vars
        ret = jax.jit(
            lambda v, b: model.apply(
                v, b, with_instances=True, with_labels=False, train=False
            )
        )(variables, batch)
        # without labels nothing is skipped; proposals == clusters found
        assert int(ret["num_proposals"]) == int(ret["cluster"].num_clusters)
