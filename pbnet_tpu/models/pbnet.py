"""PBNet: divide-and-conquer 3D instance segmentation, TPU-native.

Mirrors /root/reference/network/PBNet.py:18-347 stage by stage, but with every
data-dependent Python loop replaced by static-shape vectorized ops:

stage 1  backbone MinkUNet34C(6->32) + semantic/offset heads, voxel->point
         gather (reference :113-141)
stage 2  per-class gating + density binarization + clustering (ops/cluster),
         cluster K-NN local scenes assembled with a ragged gather, re-voxelized
         on device, D_Unet MinkUNet14A(34->32) mask branch (reference
         :143-252; the reference's per-class/per-batch/per-cluster Python
         loops become one batched pass)
stage 3  proposal re-voxelization + ScoreNet MinkUNet34C(32->32), global
         avg+max pooled IoU score head (reference :254-280)

All capacities come from config.StaticShapes; every stage reports overflow
counts instead of silently dropping work.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import StaticShapes
from ..core import coords as ck
from ..core import quantize as qz
from ..core import topology as tp
from ..nn import minkunet, onehot_conv, sparse_ops
from ..nn.modules import MLPHead, SparseLinear
from ..ops import cluster as cluster_ops

# per-class mean point counts from SoftGroup/HAIS
# (/root/reference/network/PBNet.py:33-34)
COUNT_MEAN = np.array(
    [-1.0, -1.0, 3917.0, 12056.0, 2303.0, 8331.0, 3948.0, 3166.0, 5629.0,
     11719.0, 1003.0, 3317.0, 4912.0, 10221.0, 3889.0, 4136.0, 2120.0, 945.0,
     3967.0, 2589.0],
    np.float32,
)

K_MAX = 6  # neighbor clusters per local scene (/root/reference/network/PBNet.py:35)
N_SLOTS = K_MAX + 1
MASK_THRESH = 0.45  # get_proposal threshold (/root/reference/network/PBNet.py:317)
LOCAL_VOXEL = 0.02  # local-scene voxel size (/root/reference/network/PBNet.py:236)


def make_level0(coords4, feats, valid, stride=1):
    """Sort voxel coords into canonical key order, carrying features along."""
    hi, lo = ck.pack(coords4, valid)
    hi_s, lo_s, coords_s, feats_s = ck.sort_by_key(hi, lo, coords4, feats)
    level = tp.SparseLevel(
        coords=coords_s, hi=hi_s, lo=lo_s, valid=hi_s != ck.SENTINEL,
        count=jnp.sum(valid.astype(jnp.int32)), stride=stride,
    )
    feats_s = jnp.where(level.valid[:, None], feats_s, 0.0)
    return level, feats_s


class PBNet(nn.Module):
    shapes: StaticShapes
    sem_num: int = 20
    voxel_size: float = 0.02
    scale_size: float = 1.0
    radius: float = 0.04
    min_pts: int = 31
    axis_name: Optional[str] = None
    # UNet variants (reference defaults /root/reference/network/PBNet.py:89-92)
    backbone_arch: str = "MinkUNet34C"
    dunet_arch: str = "MinkUNet14A"
    score_arch: str = "MinkUNet34C"

    def setup(self):
        ax = self.axis_name
        self.MEUnet = minkunet.mink_unet(32, self.backbone_arch, axis_name=ax)
        self.D_Unet = minkunet.mink_unet(32, self.dunet_arch, axis_name=ax)
        self.score_Unet = minkunet.mink_unet(32, self.score_arch, axis_name=ax)
        self.linear_sem = MLPHead(16, self.sem_num, axis_name=ax)
        self.linear_offset = MLPHead(16, 3, axis_name=ax)
        self.linear_binary = MLPHead(16, 1, axis_name=ax, final_sigmoid=True)
        self.linear_IOU_feat = MLPHead(32, 32, axis_name=ax)
        self.linear_IOU = MLPHead(16, 1, axis_name=ax, final_sigmoid=True)

    # ------------------------------------------------------------------
    def backbone(self, batch, train: bool):
        """Stage 1 (/root/reference/network/PBNet.py:113-141)."""
        sh = self.shapes
        level0, feats = make_level0(
            batch["vox_coords"], batch["vox_feats"], batch["vox_valid"]
        )
        topo = tp.build_unet_topology(
            level0, list(sh.voxel_caps), extent=sh.grid_extent
        )
        if sh.onehot_spans and not train:
            # banded one-hot MXU convs (eval-only: the kernel has no VJP)
            topo = onehot_conv.attach_plans(topo, sh.onehot_tm, sh.onehot_spans)
        point_feat_v = self.MEUnet(topo, feats, train)  # (V, 32)
        v0 = topo.levels[0].valid
        sem_score_v = self.linear_sem(point_feat_v, v0, train)  # (V, 20)
        offset_v = self.linear_offset(point_feat_v, v0, train)  # (V, 3)

        pvalid = batch["point_valid"]
        grid0 = topo.grids[0] if topo.grids else None  # reuse, never rebuild
        v2p = tp.point_to_voxel_map(
            topo.levels[0], batch["xyz"], batch["point_batch"], pvalid,
            self.voxel_size, grid=grid0,
        )
        ok = (v2p >= 0) & pvalid

        # ONE row gather for all per-point tables: gathers are op-count-bound
        # (~4 ns/row regardless of width up to a 128-lane tile), so packing
        # [feat32 | sem20 | offset3] = 55 f32 lanes fetches everything at a
        # third of the op count of three separate gathers.
        packed_v = jnp.concatenate([point_feat_v, sem_score_v, offset_v], 1)
        g = jnp.take(packed_v, jnp.where(ok, v2p, 0), axis=0)
        g = jnp.where(ok[:, None], g, 0.0)
        f = point_feat_v.shape[1]
        s = f + self.sem_num
        point_feat_p = g[:, :f]
        sem_score_p = g[:, f:s]
        sem_soft_p = jax.nn.softmax(sem_score_p, axis=-1)
        offset_p = g[:, s:s + 3]
        sem_pred_p = jnp.where(ok, jnp.argmax(sem_score_p, axis=-1), -1).astype(
            jnp.int32
        )
        return {
            "topo": topo,
            "overflow_vox": jnp.maximum(
                batch["vox_valid"].sum().astype(jnp.int32) - level0.cap, 0
            ) + topo.level_overflow,
            "overflow_grid": topo.grid_overflow
            + (grid0.overflow if grid0 is not None else jnp.int32(0)),
            "overflow_band": jnp.int32(0) + topo.plan_overflow,
            "point_feat_p": point_feat_p,
            "sem_pred_score_p": sem_score_p,
            "sem_soft_p": sem_soft_p,
            "offset_pred_p": offset_p,
            "sem_pred_p": sem_pred_p,
            "point_ok": ok,
            "v2p": v2p,
        }

    # ------------------------------------------------------------------
    def instance_stage(self, batch, bb, with_labels: bool, train: bool,
                       stop_after: Optional[str] = None):
        """Stages 2+3 (/root/reference/network/PBNet.py:143-280).

        ``stop_after`` (static; None in production) truncates the stage for
        per-phase latency profiling: one of "cluster", "assemble", "mask",
        "proposal".
        """
        sh = self.shapes
        n = batch["xyz"].shape[0]
        xyz = batch["xyz"]
        pbatch = batch["point_batch"]
        sem_p = bb["sem_pred_p"]
        ok = bb["point_ok"]
        count_mean = jnp.asarray(COUNT_MEAN)

        # ---- per-class gate: total class count >= 0.05*count_mean
        # (/root/reference/network/PBNet.py:156) ----
        sem_clip = jnp.clip(sem_p, 0, self.sem_num - 1)
        class_count = jax.ops.segment_sum(
            ok.astype(jnp.int32), jnp.where(ok, sem_clip, self.sem_num),
            num_segments=self.sem_num + 1,
        )[: self.sem_num]
        class_ok = class_count.astype(jnp.float32) >= 0.05 * count_mean
        fg = ok & (sem_p >= 2) & class_ok[sem_clip]

        # ---- clustering (replaces pbnet_ops.cluster, :176-179) ----
        # Foreground compaction: the banded clustering passes cost
        # O(rows * band) regardless of validity, but only fg points (the
        # reference clusters per class over exactly those,
        # /root/reference/network/PBNet.py:164-176) participate.  A stable
        # sort packs them into the first fg_point_cap rows; relative order
        # is preserved, so cluster ordering (keyed on first original index)
        # is unchanged.  Overflowing fg points are counted, never silent.
        shifted = xyz + bb["offset_pred_p"]
        NF = sh.fg_point_cap or n
        ckw = dict(
            radius=self.radius, min_pts=self.min_pts, count_mean=count_mean,
            cluster_cap=sh.cluster_cap, band=sh.cluster_band,
            nn_exact_cap=sh.nn_exact_cap,
        )
        if NF < n:
            okey = jnp.where(fg, 0, 1).astype(jnp.int32)
            _, sel = jax.lax.sort(
                (okey, jnp.arange(n, dtype=jnp.int32)), num_keys=2
            )
            sel = sel[:NF]
            live = fg[sel]
            fg_total = jnp.sum(fg.astype(jnp.int32))
            fg_overflow = jnp.maximum(fg_total - NF, 0)
            res_c = cluster_ops.binary_cluster(
                shifted[sel], xyz[sel], sem_p[sel], pbatch[sel], live, **ckw
            )
            res = res_c._replace(
                cluster_id=jnp.full((n,), -1, jnp.int32).at[sel].set(
                    res_c.cluster_id
                ),
                density=jnp.zeros((n,), jnp.int32).at[sel].set(res_c.density),
            )
        else:
            fg_overflow = jnp.int32(0)
            res = cluster_ops.binary_cluster(
                shifted, xyz, sem_p, pbatch, fg, **ckw
            )
        if stop_after == "cluster":
            return {"cluster": res}
        C = sh.cluster_cap
        cid = res.cluster_id  # (N,)
        csem = res.cluster_sem
        cbatch = res.cluster_batch
        csize = res.cluster_size
        cvalid = res.cluster_valid

        # ---- cluster K-NN within (sem, batch) groups (:196-201) ----
        group = jnp.where(cvalid, csem * 64 + cbatch, -1)
        same = (group[:, None] == group[None, :]) & cvalid[:, None] & cvalid[None, :]
        d = res.centers[:, None, :] - res.centers[None, :, :]
        dist = jnp.sum(d * d, axis=-1)
        dist = jnp.where(same, dist, jnp.inf)
        # neighbors sorted by distance; column 0 is self (distance 0)
        knn = jnp.argsort(dist, axis=1)[:, :N_SLOTS].astype(jnp.int32)
        group_size = jnp.sum(same, axis=1)  # clusters in my group (incl. self)
        para_k = jnp.minimum(group_size - 1, K_MAX)  # (:196)

        # ---- GT label per cluster: mode of instance labels over members
        # (torch.mode -> smallest most-frequent value, :205) ----
        if with_labels:
            ins = batch["ins_label"]  # (N,) int32, -100 = ignore
            I = sh.instance_cap
            member = cid >= 0
            ins_slot = jnp.where(ins == -100, 0, jnp.clip(ins, 0, I - 1) + 1)
            flat = jnp.where(member, cid * (I + 1) + ins_slot, C * (I + 1))
            counts = jax.ops.segment_sum(
                member.astype(jnp.int32), flat, num_segments=C * (I + 1) + 1
            )[:-1].reshape(C, I + 1)
            mode_slot = jnp.argmax(counts, axis=1)  # slot 0 (=-100) wins ties
            gt_label_c = jnp.where(mode_slot == 0, -100, mode_slot - 1).astype(
                jnp.int32
            )
            skip = cvalid & (gt_label_c == -100)  # (:206)
        else:
            gt_label_c = jnp.full((C,), -100, jnp.int32)
            skip = jnp.zeros((C,), bool)

        scene_c = cvalid & ~skip  # clusters that emit a local scene
        pid_of_cluster = jnp.where(
            scene_c, jnp.cumsum(scene_c.astype(jnp.int32)) - 1, -1
        )
        num_proposals = jnp.sum(scene_c.astype(jnp.int32))

        # ---- local-scene slot table (:203-221) ----
        expand = scene_c & (
            csize.astype(jnp.float32)
            > 0.2 * count_mean[jnp.clip(csem, 0, self.sem_num - 1)]
        ) & (para_k > 0)  # (:209)
        slot_idx = jnp.arange(N_SLOTS)
        slot_valid = jnp.where(
            slot_idx[None, :] == 0,
            scene_c[:, None],
            expand[:, None] & (slot_idx[None, :] - 1 < para_k[:, None]),
        )
        pk = para_k.astype(jnp.float32)
        peak = 0.5 * ((pk[:, None] + 1.0) - (slot_idx[None, :].astype(jnp.float32) - 1.0)) / (
            pk[:, None] + 1.0
        )  # peak_v[k_i] for slots >=1 (:198)
        weight = jnp.where(slot_idx[None, :] == 0, 1.0, peak)
        src_cluster = jnp.where(slot_valid, knn, 0)

        # ---- ragged gather: flatten (cluster, slot) segments ----
        # member list: points sorted by (cid, original index)
        cid_key = jnp.where(cid >= 0, cid, C).astype(jnp.int32)
        pt_idx = jnp.arange(n, dtype=jnp.int32)
        _, member_pts = jax.lax.sort((cid_key, pt_idx), num_keys=1, is_stable=True)
        cluster_start = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(csize)[:-1].astype(jnp.int32)]
        )

        seg_len = jnp.where(slot_valid, csize[src_cluster], 0).reshape(-1)  # (C*7,)
        cum = jnp.cumsum(seg_len)
        total = cum[-1]  # scene points actually needed
        T = sh.local_point_cap
        t_idx = jnp.arange(T, dtype=jnp.int32)
        # segj[t] = #{j: cum[j] <= t} (searchsorted-right), built as a
        # scatter + cumsum instead of a binary search (T scalar-gather
        # rounds are the expensive primitive on TPU)
        marks = jnp.zeros((T + 1,), jnp.int32).at[jnp.minimum(cum, T)].add(1)
        segj = jnp.cumsum(marks[:T])
        segj_c = jnp.clip(segj, 0, seg_len.shape[0] - 1)
        seg_start = cum[segj_c] - seg_len[segj_c]
        within = t_idx - seg_start
        t_ok = t_idx < jnp.minimum(total, T)
        own_c = segj_c // N_SLOTS  # proposal owner cluster
        sslot = segj_c % N_SLOTS
        sc = src_cluster[own_c, sslot]
        src_local = jnp.clip(cluster_start[sc] + within, 0, n - 1)
        src_pt = member_pts[src_local]  # global point index per scene point
        scene_w = weight[own_c, sslot]
        scene_pid = jnp.where(t_ok, pid_of_cluster[own_c], -1)

        # ---- scene features: [feat32 | class softmax | weight] (:194,230) ----
        own_sem = jnp.clip(csem[own_c], 0, self.sem_num - 1)
        sem_sf = bb["sem_soft_p"][src_pt, own_sem]
        feat32 = bb["point_feat_p"][src_pt]
        scene_feat = jnp.concatenate(
            [feat32, sem_sf[:, None], scene_w[:, None].astype(jnp.float32)], axis=1
        )
        scene_feat = jnp.where(t_ok[:, None], scene_feat, 0.0)
        scene_xyz = jnp.where(t_ok[:, None], xyz[src_pt], 0.0)

        # GT mask over scene points (:223-227)
        if with_labels:
            src_ins = batch["ins_label"][src_pt]
            gt_mask = jnp.where(
                src_ins == -100, -1.0,
                (src_ins == gt_label_c[own_c]).astype(jnp.float32),
            )
            gt_mask = jnp.where(t_ok, gt_mask, -1.0)
        else:
            gt_mask = jnp.full((T,), -1.0)

        if stop_after == "assemble":
            return {"cluster": res, "scene_feat": scene_feat,
                    "scene_xyz": scene_xyz, "gt_mask": gt_mask}
        # ---- D_Unet over re-voxelized local scenes (:236-250) ----
        q2 = qz.quantize_device(
            scene_xyz / LOCAL_VOXEL, scene_pid, t_ok, sh.local_voxel_caps[0]
        )
        lv2 = tp.level_from_quantize(q2, sh.local_voxel_caps[0], 1)
        feats2 = jnp.take(scene_feat, q2["voxel2point"], axis=0, mode="fill", fill_value=0)
        feats2 = jnp.where(lv2.valid[:, None], feats2, 0.0)
        # local scenes sit on the SAME voxel lattice as the main scene, so a
        # composite (pid, global-rank) grid gives exact two-gather lookups
        use_composite = (
            sh.grid_extent is not None and self.voxel_size == LOCAL_VOXEL
        )
        pid_batch = jnp.zeros((C + 1,), jnp.int32).at[
            jnp.where(scene_c, pid_of_cluster, C)
        ].set(jnp.clip(cbatch, 0, 63))[:C]

        def build_topo2(parts="all"):
            if use_composite:
                # kernel maps DERIVED from the backbone's maps (local voxels
                # live on the main lattice): one main-map row gather per
                # voxel replaces the spatial z-window lookups
                return tp.build_pid_unet_topology(
                    lv2, list(sh.local_voxel_caps), bb["topo"], pid_batch, C,
                    parts=parts,
                )
            return tp.build_unet_topology(
                lv2, list(sh.local_voxel_caps), grids=lambda lv: None,
                parts=parts,
            )

        if stop_after is not None and stop_after.startswith("topo2"):
            # "topo2" (full ex-up) or "topo2:pyramid|stem|k3|down|all" —
            # truncated builds for latency attribution (profiling only)
            parts = stop_after.partition(":")[2] or "down"
            topo2 = build_topo2(parts)
            keep = [topo2.stem_map, topo2.k3_maps, topo2.down_maps,
                    topo2.up_maps, tuple(lv.hi for lv in topo2.levels),
                    tuple(g.packed for g in topo2.grids if g is not None)]
            return {"cluster": res, "topo2_maps": tuple(keep),
                    "feats2": feats2}
        topo2 = build_topo2()
        if sh.onehot_spans_local and not train:
            topo2 = onehot_conv.attach_plans(
                topo2, sh.onehot_tm, sh.onehot_spans_local
            )
        d_feat = self.D_Unet(topo2, feats2, train)
        mask_v = self.linear_binary(d_feat, topo2.levels[0].valid, train)[:, 0]
        p2v2 = q2["point2voxel"]
        mask_score = jnp.where(
            t_ok & (p2v2 >= 0), mask_v[jnp.clip(p2v2, 0, None)], 0.0
        )

        if stop_after == "mask":
            return {"cluster": res, "mask_scores": mask_score}
        # ---- get_proposal: threshold + drop null proposals (:317-347) ----
        kept = t_ok & (mask_score > MASK_THRESH) & (scene_pid >= 0)
        P = C  # proposal capacity = cluster capacity
        kept_per_pid = jax.ops.segment_sum(
            kept.astype(jnp.int32), jnp.where(kept, scene_pid, P),
            num_segments=P + 1,
        )[:P]
        pid_alive = kept_per_pid > 0
        pid2 = jnp.where(pid_alive, jnp.cumsum(pid_alive.astype(jnp.int32)) - 1, -1)
        final_pid = jnp.where(kept, pid2[jnp.clip(scene_pid, 0, P - 1)], -1)
        num_final = jnp.sum(pid_alive.astype(jnp.int32))

        # proposal semantics: predicted class of the owner cluster (all member
        # points share it), matching pred_sem[first point] in the eval driver
        # (/root/reference/eval_map.py:64-65)
        cluster_of_pid = jnp.zeros((P + 1,), jnp.int32).at[
            jnp.where(scene_c, pid_of_cluster, P)
        ].set(jnp.arange(C, dtype=jnp.int32))
        sem_of_pid = csem[cluster_of_pid[:P]]
        sem_of_pid2 = jnp.zeros((P + 1,), jnp.int32).at[
            jnp.where(pid_alive, pid2, P)
        ].set(sem_of_pid)[:P]

        if stop_after == "proposal":
            return {"cluster": res, "mask_scores": mask_score,
                    "prop_point_pid": final_pid}
        # ---- ScoreNet (:254-279) ----
        # ScoreNet re-voxelizes the KEPT proposal points at scale/voxel
        # (/root/reference/network/PBNet.py:259-271).  When that lattice is
        # the local-scene lattice (scale==1), quantizing a subset of points
        # yields exactly the D_Unet voxels that contain >=1 kept point — so
        # instead of a second quantize + topology build, DERIVE the ScoreNet
        # topology from topo2: mask dropped voxels invalid (level by level
        # through the down maps) and reuse every kernel map unchanged.
        # Every layer re-zeroes invalid rows (nn/modules.py convention), so
        # a map entry pointing at a dropped voxel reads zeros — identical to
        # a -1 entry.  Proposal ids relabel monotonically (pid2), preserving
        # key order.
        derive3 = (
            sh.grid_extent is not None and self.voxel_size == LOCAL_VOXEL
            and self.scale_size == 1.0
        )
        V2 = sh.local_voxel_caps[0]
        if derive3:
            t_i = jnp.arange(T, dtype=jnp.int32)
            seg_v = jnp.where(kept & (p2v2 >= 0), p2v2, V2)
            kept_in_vox = jax.ops.segment_sum(
                kept.astype(jnp.int32), seg_v, num_segments=V2 + 1
            )[:V2]
            # representative = first kept scene point of the voxel (matches
            # quantize_device's first-in-order representative on the subset)
            rep3 = jax.ops.segment_min(
                jnp.where(kept & (p2v2 >= 0), t_i, jnp.int32(T)),
                seg_v, num_segments=V2 + 1,
            )[:V2]
            keeps = [topo2.levels[0].valid & (kept_in_vox > 0)]
            for l in range(len(topo2.down_maps)):
                km = topo2.down_maps[l]  # (M_{l+1}, 8)
                child_keep = (km >= 0) & jnp.take(
                    keeps[l], jnp.clip(km, 0, None), axis=0
                )
                keeps.append(topo2.levels[l + 1].valid & jnp.any(child_keep, 1))
            topo3 = topo2.replace(levels=tuple(
                lv.replace(valid=kp, count=jnp.sum(kp.astype(jnp.int32)))
                for lv, kp in zip(topo2.levels, keeps)
            ))
            v3_valid = keeps[0]
            feats3 = jnp.take(
                feat32, jnp.minimum(rep3, T - 1), axis=0, mode="clip"
            )
            feats3 = jnp.where(v3_valid[:, None], feats3, 0.0)
            # voxel -> final proposal id through the voxel's scene pid
            vb3 = jnp.take(
                pid2, jnp.clip(topo2.levels[0].coords[:, 0], 0, P - 1)
            )
            score_count = jnp.sum(keeps[0].astype(jnp.int32))
            score_overflow = jnp.int32(0)  # subset of topo2: cannot overflow
        else:
            sxyz = scene_xyz * self.scale_size / self.voxel_size
            q3 = qz.quantize_device(
                jnp.where(kept[:, None], sxyz, 0.0),
                jnp.where(kept, final_pid, -1), kept, sh.score_voxel_caps[0],
            )
            lv3 = tp.level_from_quantize(q3, sh.score_voxel_caps[0], 1)
            feats3 = jnp.take(
                feat32, q3["voxel2point"], axis=0, mode="fill", fill_value=0
            )
            feats3 = jnp.where(lv3.valid[:, None], feats3, 0.0)
            topo3 = tp.build_unet_topology(
                lv3, list(sh.score_voxel_caps), grids=lambda lv: None
            )
            v3_valid = topo3.levels[0].valid
            vb3 = topo3.levels[0].coords[:, 0]
            score_count = q3["count"]
            score_overflow = jnp.maximum(
                q3["count"] - sh.score_voxel_caps[0], 0
            ) + topo3.level_overflow
        iou_feat = self.score_Unet(topo3, feats3, train)
        iou_feat = self.linear_IOU_feat(iou_feat, v3_valid, train)
        gmax = sparse_ops.global_pool(iou_feat, vb3, v3_valid, P, "max")
        gavg = sparse_ops.global_pool(iou_feat, vb3, v3_valid, P, "avg")
        gfeat = gmax + gavg
        pvalid2 = jnp.arange(P) < num_final
        clt_scores = self.linear_IOU(gfeat, pvalid2, train)[:, 0]

        # every stage's capacity-overrun diagnostics, for aux/scalars logging
        overflow = {
            "cluster_band": res.band_overflow,
            "cluster_nn": res.nn_overflow,
            "fg_points": fg_overflow,
            "scene_points": jnp.maximum(total - T, 0),
            "local_vox": jnp.maximum(q2["count"] - sh.local_voxel_caps[0], 0)
            + topo2.level_overflow,
            "local_grid": topo2.grid_overflow,
            # topo3 derives from topo2 (same maps/plans): count once
            "conv_band": jnp.int32(0) + topo2.plan_overflow,
            "score_vox": score_overflow,
            "score_grid": topo3.grid_overflow,
        }
        # actual utilization (vs caps) — drives right-sizing StaticShapes
        usage = {
            "scene_points": total,
            "local_vox": q2["count"],
            "score_vox": score_count,
            "fg_points": jnp.sum(fg.astype(jnp.int32)),
            "kept_points": jnp.sum(kept.astype(jnp.int32)),
        }

        return {
            "cluster": res,
            "num_proposals": num_proposals,
            "overflow": overflow,
            "usage": usage,
            "scene_total": total,
            "scene_overflow": jnp.maximum(total - T, 0),
            # mask branch (pre-threshold scene points)
            "mask_scores": mask_score,
            "gt_mask": gt_mask,
            "scene_valid": t_ok,
            "scene_pid": scene_pid,
            "scene_src": src_pt,
            # proposals (post-threshold)
            "prop_point_src": src_pt,  # global point id per scene point
            "prop_point_pid": final_pid,  # -1 where dropped
            "prop_point_kept": kept,
            "prop_point_mask_score": jnp.where(kept, mask_score, 0.0),
            "num_final_proposals": num_final,
            "prop_sem": sem_of_pid2,
            "prop_valid": pvalid2,
            "clt_scores": clt_scores,
        }

    # ------------------------------------------------------------------
    def __call__(self, batch, with_instances: bool, with_labels: bool, train: bool):
        bb = self.backbone(batch, train)
        ret = {
            "sem_pred_p": bb["sem_pred_p"],
            "sem_pred_score_p": bb["sem_pred_score_p"],
            "offset_pred_p": bb["offset_pred_p"],
            "point_ok": bb["point_ok"],
            "overflow_vox": bb["overflow_vox"],
            "overflow_grid": bb["overflow_grid"],
            "overflow_band": bb["overflow_band"],
        }
        if with_instances:
            ret.update(self.instance_stage(batch, bb, with_labels, train))
        return ret
