"""Data layer tests: PLY IO, decode pipeline, segmentator, dataset batches."""

import json
import os

import numpy as np
import pytest

from pbnet_tpu.config import Config, StaticShapes
from pbnet_tpu.data import augment
from pbnet_tpu.data.dataset import Dataset
from pbnet_tpu.data.decode_scannet import decode_scene, write_val_gt
from pbnet_tpu.data.ply import read_ply, write_ply_mesh
from pbnet_tpu.native import segmentator


def make_grid_mesh(side=12, z_fn=None, origin=(0.0, 0.0, 0.0)):
    """Regular grid mesh with 2*(side-1)^2 triangles."""
    xs, ys = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    z = np.zeros_like(xs, np.float64) if z_fn is None else z_fn(xs, ys)
    xyz = np.stack([xs.ravel() * 0.05, ys.ravel() * 0.05, z.ravel()], 1) + origin
    faces = []
    for i in range(side - 1):
        for j in range(side - 1):
            a = i * side + j
            b = a + 1
            c = a + side
            d = c + 1
            faces.append([a, b, c])
            faces.append([b, d, c])
    return xyz.astype(np.float32), np.array(faces, np.int64)


class TestPly:
    def test_roundtrip(self, rng, tmp_path):
        xyz, faces = make_grid_mesh(6)
        rgb = rng.randint(0, 255, (xyz.shape[0], 3)).astype(np.uint8)
        labels = rng.randint(0, 40, xyz.shape[0]).astype(np.uint16)
        p = str(tmp_path / "mesh.ply")
        write_ply_mesh(p, xyz, rgb, faces, labels)
        ply = read_ply(p)
        np.testing.assert_allclose(
            np.stack([ply["vertex"]["x"], ply["vertex"]["y"], ply["vertex"]["z"]], 1),
            xyz, rtol=1e-6,
        )
        np.testing.assert_array_equal(ply["vertex"]["red"], rgb[:, 0])
        np.testing.assert_array_equal(ply["vertex"]["label"], labels)
        np.testing.assert_array_equal(ply["face"]["vertex_indices"], faces)


class TestSegmentator:
    def test_cpp_matches_numpy_oracle(self):
        # two flat plates meeting at a right angle -> 2+ segments
        xyz1, f1 = make_grid_mesh(10)
        xyz2, f2 = make_grid_mesh(10, z_fn=lambda x, y: x * 0.05)
        xyz2 = xyz2 + np.array([0.5, 0, 0.001])
        xyz = np.concatenate([xyz1, xyz2]).astype(np.float32)
        faces = np.concatenate([f1, f2 + xyz1.shape[0]])
        got = segmentator.segment_mesh(xyz, faces, 0.01, 5)
        oracle = segmentator.segment_mesh_np(xyz, faces, 0.01, 5)
        assert got.shape == oracle.shape
        # same partition (ids may be permuted)
        assert len(np.unique(got)) == len(np.unique(oracle))
        joint = got * 100000 + oracle
        assert len(np.unique(joint)) == len(np.unique(got))

    def test_flat_plane_single_segment(self):
        xyz, faces = make_grid_mesh(8)
        seg = segmentator.segment_mesh(xyz, faces, 0.01, 4)
        assert len(np.unique(seg)) == 1

    def test_segment_point(self, rng):
        pts = rng.rand(50, 3).astype(np.float32)
        normals = np.tile(np.array([[0, 0, 1.0]], np.float32), (50, 1))
        edges = np.array([[i, i + 1] for i in range(49)], np.int64)
        seg = segmentator.segment_point(pts, normals, edges, 0.5, 1)
        assert len(np.unique(seg)) == 1  # identical normals -> fully merged

    def test_rotation_equivariance(self, rng):
        # property from /root/reference/lib/segmentator/test_equivariance.py:
        # rotating points+normals (same knn graph) must preserve the segment
        # count and the sorted segment-size distribution for flat-faced
        # geometry (a 2-plane dihedral here)
        n_half = 400
        p1 = np.concatenate(
            [rng.rand(n_half, 2), np.zeros((n_half, 1))], 1
        )
        p2 = np.concatenate(
            [rng.rand(n_half, 1), np.zeros((n_half, 1)), rng.rand(n_half, 1)], 1
        )
        pts = np.concatenate([p1, p2]).astype(np.float32)
        normals = np.concatenate([
            np.tile(np.array([[0, 0, 1.0]], np.float32), (n_half, 1)),
            np.tile(np.array([[0, 1.0, 0]], np.float32), (n_half, 1)),
        ])
        # brute-force knn graph (n is small)
        d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        nbr = np.argsort(d2, axis=1)[:, :8]
        edges = np.stack(
            [np.repeat(np.arange(pts.shape[0]), 8), nbr.ravel()], 1
        ).astype(np.int64)
        before = segmentator.segment_point(pts, normals, edges, 0.01, 20)

        # random rotation (QR of a gaussian, det +1)
        q, r = np.linalg.qr(rng.randn(3, 3))
        q *= np.sign(np.diag(r))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        after = segmentator.segment_point(
            (pts @ q.astype(np.float32)), (normals @ q.astype(np.float32)),
            edges, 0.01, 20,
        )
        assert before.max() == after.max()
        np.testing.assert_array_equal(
            np.sort(np.bincount(before)), np.sort(np.bincount(after))
        )


def fabricate_scene(root, scan_name, rng, side=14, n_instances=2):
    """Write a tiny ScanNet-format scene (ply + labels + segs + aggregation)."""
    os.makedirs(root, exist_ok=True)
    xyz, faces = make_grid_mesh(side)
    n = xyz.shape[0]
    rgb = rng.randint(0, 255, (n, 3)).astype(np.uint8)
    # nyu40 labels: two chair instances (id 5), rest floor (id 2)
    labels = np.full(n, 2, np.uint16)
    seg_ids = np.arange(n) // 7  # fake over-segmentation ids
    instance_groups = []
    for i in range(n_instances):
        sl = slice(i * (n // 4), i * (n // 4) + n // 6)
        labels[sl] = 5
        segs = np.unique(seg_ids[sl])
        # make segments pure: expand instance to full segments
        mask = np.isin(seg_ids, segs)
        labels[mask] = 5
        instance_groups.append([int(s) for s in segs])
    # ensure disjoint groups
    g0 = set(instance_groups[0])
    instance_groups = [instance_groups[0]] + [
        [s for s in g if s not in g0] for g in instance_groups[1:]
    ]

    base = os.path.join(root, scan_name)
    write_ply_mesh(base + "_vh_clean_2.ply", xyz, rgb, faces)
    write_ply_mesh(base + "_vh_clean_2.labels.ply", xyz, rgb, faces, labels)
    with open(base + "_vh_clean_2.0.010000.segs.json", "w") as f:
        json.dump({"segIndices": seg_ids.tolist()}, f)
    agg = {
        "segGroups": [
            {"label": "chair", "segments": g, "id": i}
            for i, g in enumerate(instance_groups)
        ]
    }
    with open(base + ".aggregation.json", "w") as f:
        json.dump(agg, f)
    return n


class TestDecode:
    def test_decode_scene_contract(self, rng, tmp_path):
        scans = str(tmp_path / "scans")
        out = str(tmp_path / "npy")
        os.makedirs(out)
        n = fabricate_scene(scans, "scene0001_00", rng)
        decode_scene(
            os.path.join(scans, "scene0001_00_vh_clean_2.ply"), out, None
        )
        for sfx in ("xyz", "rgb", "sem_label", "ins_label", "nl", "face", "sup"):
            assert os.path.exists(os.path.join(out, f"scene0001_00_{sfx}.npy")), sfx
        sem = np.load(os.path.join(out, "scene0001_00_sem_label.npy"))
        ins = np.load(os.path.join(out, "scene0001_00_ins_label.npy"))
        assert set(np.unique(sem)) <= {1.0, 4.0}  # floor->1? chair(5)->4
        # chair nyu40 id 5 -> semantic index 4; floor id 2 -> index 1
        assert (ins[sem == 1.0] == -100).all()
        assert set(np.unique(ins[sem == 4.0])) == {0.0, 1.0}
        nl = np.load(os.path.join(out, "scene0001_00_nl.npy"))
        np.testing.assert_allclose(np.linalg.norm(nl, axis=1), 1.0, atol=1e-5)

    def test_val_gt_encoding(self, rng, tmp_path):
        scans = str(tmp_path / "scans")
        out = str(tmp_path / "npy")
        gt = str(tmp_path / "gt")
        os.makedirs(out)
        fabricate_scene(scans, "scene0002_00", rng)
        decode_scene(os.path.join(scans, "scene0002_00_vh_clean_2.ply"), out, None)
        write_val_gt(out, ["scene0002_00"], gt)
        ids = np.loadtxt(os.path.join(gt, "scene0002_00.txt"), dtype=np.int64)
        sem = np.load(os.path.join(out, "scene0002_00_sem_label.npy"))
        ins = np.load(os.path.join(out, "scene0002_00_ins_label.npy"))
        chair = (sem == 4.0) & (ins == 0.0)
        assert (ids[chair] == 5 * 1000 + 1).all()
        # floor has no instance -> encoded id 0... (reference encodes sem*1000+ins+1
        # only for instance points; background = 0 here because ins == -100)
        assert (ids[(sem == 1.0)] == 0).all()


class TestDataset:
    def _mini_cfg(self, tmp_path):
        shapes = StaticShapes(
            point_cap=4096, voxel_caps=(2048, 1024, 512, 256, 128),
            cluster_cap=16, local_point_cap=4096,
            local_voxel_caps=(1024, 512, 256, 128, 64),
            score_voxel_caps=(1024, 512, 256, 128, 64),
            instance_cap=16, cluster_band=512,
        )
        return Config(
            data_root=str(tmp_path), batch_size=2, max_crop_p=2000,
            min_crop_p=10, num_works=0, cache=False, shapes=shapes,
        )

    def _prepare(self, tmp_path, rng, n_scenes=3):
        scans = str(tmp_path / "scans")
        out = str(tmp_path / "npy")
        os.makedirs(out, exist_ok=True)
        names = []
        for i in range(n_scenes):
            nm = f"scene{i:04d}_00"
            fabricate_scene(scans, nm, rng)
            decode_scene(os.path.join(scans, nm + "_vh_clean_2.ply"), out, None)
            names.append(nm)
        np.savetxt(str(tmp_path / "scannetv2_train.txt"), names, fmt="%s")
        np.savetxt(str(tmp_path / "scannetv2_val.txt"), names[:1], fmt="%s")
        np.savetxt(str(tmp_path / "scannetv2_test.txt"), names[:1], fmt="%s")

    def test_train_batch_contract(self, rng, tmp_path):
        self._prepare(tmp_path, rng)
        cfg = self._mini_cfg(tmp_path)
        ds = Dataset(cfg)
        batches = ds.train_epoch_ids(epoch=1)
        assert len(batches) == 1  # 3 scenes, bs 2, drop_last
        b = ds.train_batch(batches[0], np.random.RandomState(0))
        P, V = cfg.shapes.point_cap, cfg.shapes.voxel_caps[0]
        assert b["xyz"].shape == (P, 3)
        assert b["vox_coords"].shape == (V, 4)
        n = b["num_points"]
        assert b["point_valid"].sum() == n
        # two scenes in the batch
        assert set(np.unique(b["point_batch"][:n])) == {0, 1}
        # every valid point's voxel exists with matching coords
        assert b["num_voxels"] <= V
        assert (b["vox_coords"][: b["num_voxels"], 0] <= 1).all()
        # labels propagate
        assert set(np.unique(b["sem_label"][:n])) <= {-100, 1, 4}
        assert b["instance_pointnum"][: b["num_instances"]].sum() == (
            b["ins_label"][:n] != -100
        ).sum()

    def test_val_batch_tta(self, rng, tmp_path):
        self._prepare(tmp_path, rng)
        cfg = self._mini_cfg(tmp_path)
        ds = Dataset(cfg)
        b = ds.val_batch(0)
        n = b["num_points"]
        assert n % 3 == 0  # 3 TTA copies
        pb = b["point_batch"][:n]
        assert set(np.unique(pb)) == {0, 1, 2}
        # three copies have identical per-copy sizes
        assert (pb == 0).sum() == (pb == 1).sum() == (pb == 2).sum()
        assert "sup" in b and b["sup"].shape[0] == n // 3

    def test_scaled_shapes_buckets(self):
        sh = StaticShapes()
        half = sh.scaled(0.5)
        assert half.point_cap < sh.point_cap
        assert half.point_cap % 4096 == 0
        assert all(a <= b for a, b in zip(half.voxel_caps, sh.voxel_caps))
        assert all(v % 512 == 0 for v in half.voxel_caps)
        # cluster/instance capacities (semantics) untouched
        assert half.cluster_cap == sh.cluster_cap
        assert half.instance_cap == sh.instance_cap
        # grid extent spatial dims shrink ~f^(1/3), batch dim untouched
        assert half.grid_extent[0] == sh.grid_extent[0]
        assert all(
            a <= b for a, b in zip(half.grid_extent[1:], sh.grid_extent[1:])
        )
        assert all(d % 32 == 0 for d in half.grid_extent[1:])
        assert sh.scaled(1.0) is sh
        cfg = Config()
        bks = cfg.eval_buckets()
        assert bks[-1] == cfg.shapes
        assert all(
            a.point_cap <= b.point_cap for a, b in zip(bks, bks[1:])
        )

    def test_val_batch_picks_smallest_bucket(self, rng, tmp_path):
        self._prepare(tmp_path, rng)
        cfg = self._mini_cfg(tmp_path)
        ds = Dataset(cfg)
        b = ds.val_batch(0)
        assert "shapes" in b
        buckets = cfg.eval_buckets()
        # the tiny fabricated scene fits the smallest bucket
        assert b["shapes"] == buckets[0]
        assert b["xyz"].shape[0] == buckets[0].point_cap
        assert b["keep_idx"] is None

    def test_bucket_respects_spatial_extent(self, rng, tmp_path):
        """A scene with FEW points but a LARGE spatial footprint must skip
        buckets whose (scaled) grid extent its voxel bbox does not fit —
        a too-small extent would overflow the lookup grid."""
        self._prepare(tmp_path, rng)
        cfg = self._mini_cfg(tmp_path)
        ds = Dataset(cfg)
        buckets = cfg.eval_buckets()
        # sparse line of points spanning beyond the smallest bucket's extent
        small_ext = buckets[0].grid_extent
        span = (small_ext[1] + 64) * cfg.voxel_size  # beyond bucket-0 x
        n = 600
        xyz = np.zeros((n, 3), np.float32)
        xyz[:, 0] = np.linspace(0, span, n)
        xyz[:, 1] = np.linspace(0, 0.5, n)
        xyz[:, 2] = 0.1
        rgb = np.zeros((n, 3), np.float32)
        nl = np.tile([0, 0, 1.0], (n, 1)).astype(np.float32)
        sem = np.zeros(n, np.int32)
        ins = np.full(n, -100, np.int32)
        b = ds._collate([("s", xyz, rgb, nl, sem, ins)],
                        buckets=list(buckets))
        assert b["shapes"].grid_extent[1] >= small_ext[1] + 64
        # and a compact scene of the same point count stays in bucket 0
        xyz2 = xyz.copy()
        xyz2[:, 0] = np.linspace(0, 1.0, n)
        b2 = ds._collate([("s", xyz2, rgb, nl, sem, ins)],
                         buckets=list(buckets))
        assert b2["shapes"] == buckets[0]

    def test_oversize_val_scene_crops_not_raises(self, rng, tmp_path):
        self._prepare(tmp_path, rng)
        cfg = self._mini_cfg(tmp_path)
        # largest bucket too small for the 3 TTA copies -> crop fallback
        cfg = cfg.replace(
            shapes=cfg.shapes,
            eval_bucket_scales=(1.0,),
        )
        small = StaticShapes(
            point_cap=256, voxel_caps=(512, 256, 128, 64, 32),
            cluster_cap=16, local_point_cap=512,
            local_voxel_caps=(256, 128, 64, 32, 16),
            score_voxel_caps=(256, 128, 64, 32, 16),
            instance_cap=16, cluster_band=128,
        )
        cfg = cfg.replace(shapes=small)
        ds = Dataset(cfg)
        b = ds.val_batch(0)  # must not raise
        assert b["keep_idx"] is not None
        assert b["num_points"] <= small.point_cap
        assert b["num_points"] % 3 == 0
        k = b["num_points"] // 3
        # identical subset across the 3 TTA copies keeps the fold aligned
        assert b["keep_idx"].shape[0] == k
        assert b["sup"].shape[0] == k
        assert b["orig_num_points"] > k
        assert b["dropped_sem"].shape[0] == b["orig_num_points"] - k
        # mask scatter-back helper
        from pbnet_tpu.engine import scatter_cropped_masks

        pred = {"mask": np.ones((2, k), np.int32), "conf": np.ones(2),
                "label_id": np.ones(2, np.int64)}
        out = scatter_cropped_masks(pred, b)
        assert out["mask"].shape == (2, b["orig_num_points"])
        assert out["mask"].sum() == 2 * k

    def test_epoch_shuffle_deterministic(self, rng, tmp_path):
        self._prepare(tmp_path, rng)
        cfg = self._mini_cfg(tmp_path)
        ds = Dataset(cfg)
        a = ds.train_epoch_ids(3)
        b = ds.train_epoch_ids(3)
        c = ds.train_epoch_ids(4)
        np.testing.assert_array_equal(a, b)
        assert not all(
            np.array_equal(x, y) for x, y in zip(a, c)
        ) or len(a) <= 1

    def test_batch_rng_streams_distinct_across_epochs(self):
        # Regression: the old seed formula seed*1000 + epoch*7 + i replayed
        # epoch e's augmentation streams in epoch e+1 shifted by 7 iters.
        # The per-(epoch, iter) seeds must all be distinct.
        from pbnet_tpu.data.dataset import batch_seed

        seeds = {
            batch_seed(123, epoch, i): (epoch, i)
            for epoch in range(520)
            for i in range(40)
        }
        assert len(seeds) == 520 * 40
