"""Unit tests for the sparse-voxel core: keys, quantize, topology.

Oracles are brute-force numpy implementations.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pbnet_tpu.core import coords as ck
from pbnet_tpu.core import quantize as qz
from pbnet_tpu.core import topology as tp


def random_coords(rng, n, extent=20, batches=2):
    c = np.stack(
        [
            rng.randint(0, batches, n),
            rng.randint(0, extent, n),
            rng.randint(0, extent, n),
            rng.randint(0, extent, n),
        ],
        axis=1,
    ).astype(np.int32)
    return c


class TestKeys:
    def test_pack_sort_lookup_roundtrip(self, rng):
        c = random_coords(rng, 200)
        c = np.unique(c, axis=0)
        n = c.shape[0]
        cap = n + 13
        cpad = np.zeros((cap, 4), np.int32)
        cpad[:n] = c
        valid = np.arange(cap) < n
        hi, lo = ck.pack(jnp.asarray(cpad), jnp.asarray(valid))
        hi_s, lo_s, c_s = ck.sort_by_key(hi, lo, jnp.asarray(cpad))
        # sorted order matches numpy int64 key sort
        key64 = ck.pack_np(c)
        order = np.argsort(key64)
        np.testing.assert_array_equal(np.asarray(c_s)[:n], c[order])
        # pads at the end
        assert np.all(np.asarray(hi_s)[n:] == ck.SENTINEL)
        # every key can be found
        qhi, qlo = ck.pack(jnp.asarray(cpad), jnp.asarray(valid))
        idx, found = ck.lookup(hi_s, lo_s, qhi, qlo)
        assert np.all(np.asarray(found)[:n])
        np.testing.assert_array_equal(
            np.asarray(c_s)[np.asarray(idx)[:n]], c
        )
        # missing keys are not found
        miss = c.copy()
        miss[:, 1] += 1000
        mhi, mlo = ck.pack(jnp.asarray(miss), jnp.ones(n, bool))
        _, found2 = ck.lookup(hi_s, lo_s, mhi, mlo)
        assert not np.any(np.asarray(found2))

    def test_lookup_empty_and_single(self):
        hi = jnp.full((4,), ck.SENTINEL, jnp.int32)
        lo = jnp.full((4,), ck.SENTINEL, jnp.int32)
        idx, found = ck.lookup(hi, lo, jnp.array([5], jnp.int32), jnp.array([7], jnp.int32))
        assert not bool(found[0])


class TestQuantize:
    def test_matches_numpy_oracle(self, rng):
        n = 500
        xyz = rng.rand(n, 3).astype(np.float32) * 3.0
        vs = 0.3
        vox, index, inverse = qz.sparse_quantize_np(xyz, vs)
        # round trip: every point maps to the voxel containing it
        np.testing.assert_array_equal(
            vox[inverse], np.floor(xyz / vs).astype(np.int32)
        )
        # index rows are the first occurrences
        q = np.floor(xyz / vs).astype(np.int64)
        for ui, urow in zip(index, vox):
            np.testing.assert_array_equal(q[ui], urow)

    def test_device_matches_host(self, rng):
        n, cap = 400, 512
        xyz = rng.rand(n, 3).astype(np.float32) * 3.0
        vs = 0.25
        vox, index, inverse = qz.sparse_quantize_np(xyz, vs)

        pad = 57
        xyz_p = np.zeros((n + pad, 3), np.float32)
        xyz_p[:n] = xyz
        valid = np.arange(n + pad) < n
        batch = np.zeros(n + pad, np.int32)
        out = qz.quantize_device(
            jnp.asarray(xyz_p), jnp.asarray(batch), jnp.asarray(valid), cap, vs
        )
        m = int(out["count"])
        assert m == vox.shape[0]
        # voxel sets agree (device is key-sorted; oracle is np.unique-sorted,
        # which is the same ordering)
        np.testing.assert_array_equal(np.asarray(out["coords"])[:m, 1:], vox)
        # inverse maps agree
        np.testing.assert_array_equal(np.asarray(out["point2voxel"])[:n], inverse)
        # pads map nowhere
        assert np.all(np.asarray(out["point2voxel"])[n:] == -1)
        # voxel2point rows land in the right voxel
        v2p = np.asarray(out["voxel2point"])[:m]
        np.testing.assert_array_equal(
            np.floor(xyz[v2p] / vs).astype(np.int32), vox
        )

    def test_multi_batch_separation(self, rng):
        # same xyz in two batch items must become distinct voxels
        xyz = np.array([[0.1, 0.1, 0.1], [0.1, 0.1, 0.1]], np.float32)
        batch = np.array([0, 1], np.int32)
        out = qz.quantize_device(
            jnp.asarray(xyz), jnp.asarray(batch), jnp.ones(2, bool), 8, 0.2
        )
        assert int(out["count"]) == 2

    def test_overflow_detection(self, rng):
        xyz = (rng.rand(100, 3) * 100).astype(np.float32)
        out = qz.quantize_device(
            jnp.asarray(xyz), jnp.zeros(100, jnp.int32), jnp.ones(100, bool), 16, 1.0
        )
        assert int(out["count"]) > 16  # overflow reported, not silent


def brute_force_conv_map(out_c, out_valid, in_c, in_valid, k, ts_in, transpose=False):
    """Oracle kernel map via dict lookup."""
    table = {tuple(c): i for i, c in enumerate(in_c[in_valid].tolist())}
    # map from row in valid-compacted list back to padded row
    valid_rows = np.nonzero(in_valid)[0]
    offs = tp.kernel_offsets(k) * ts_in
    if transpose:
        offs = -offs
    M, K = out_c.shape[0], offs.shape[0]
    res = np.full((M, K), -1, np.int64)
    for i in range(M):
        if not out_valid[i]:
            continue
        b, x, y, z = out_c[i]
        for j, (dx, dy, dz) in enumerate(offs):
            key = (b, x + dx, y + dy, z + dz)
            if key in table:
                res[i, j] = valid_rows[table[key]]
    return res


class TestTopology:
    def _level(self, c, cap, stride=1):
        n = c.shape[0]
        cpad = np.zeros((cap, 4), np.int32)
        cpad[:n] = c
        valid = np.arange(cap) < n
        return tp.level_from_coords(
            jnp.asarray(cpad), jnp.asarray(valid), cap, stride
        )

    def test_conv_map_s1_matches_oracle(self, rng):
        c = np.unique(random_coords(rng, 300, extent=10), axis=0)
        lv = self._level(c, c.shape[0] + 9)
        for k in (1, 2, 3, 5):
            km = np.asarray(tp.conv_map(lv, lv, k))
            oracle = brute_force_conv_map(
                np.asarray(lv.coords), np.asarray(lv.valid),
                np.asarray(lv.coords), np.asarray(lv.valid), k, 1,
            )
            np.testing.assert_array_equal(km, oracle)

    def test_downsample_matches_oracle(self, rng):
        c = np.unique(random_coords(rng, 400, extent=16), axis=0)
        lv = self._level(c, c.shape[0] + 5)
        lv2 = tp.downsample(lv, 2, c.shape[0] + 5)
        down = c.copy()
        down[:, 1:] = down[:, 1:] // 2 * 2
        expect = np.unique(down, axis=0)
        m = int(lv2.count)
        assert m == expect.shape[0]
        got = np.asarray(lv2.coords)[np.asarray(lv2.valid)]
        np.testing.assert_array_equal(
            got[np.lexsort(got.T[::-1])], expect[np.lexsort(expect.T[::-1])]
        )
        assert lv2.stride == 2

    def test_strided_and_transpose_maps(self, rng):
        c = np.unique(random_coords(rng, 300, extent=16), axis=0)
        lv = self._level(c, c.shape[0] + 3)
        lv2 = tp.downsample(lv, 2, c.shape[0] + 3)
        km_down = np.asarray(tp.conv_map(lv2, lv, 2))
        oracle_down = brute_force_conv_map(
            np.asarray(lv2.coords), np.asarray(lv2.valid),
            np.asarray(lv.coords), np.asarray(lv.valid), 2, 1,
        )
        np.testing.assert_array_equal(km_down, oracle_down)
        # every valid output has at least one child; children partition inputs
        nvalid = (km_down >= 0).sum()
        assert nvalid == c.shape[0]

        km_up = np.asarray(tp.conv_transpose_map(lv, lv2, 2))
        oracle_up = brute_force_conv_map(
            np.asarray(lv.coords), np.asarray(lv.valid),
            np.asarray(lv2.coords), np.asarray(lv2.valid), 2, 1, transpose=True,
        )
        np.testing.assert_array_equal(km_up, oracle_up)
        # each fine voxel has exactly one parent
        assert np.all(((km_up >= 0).sum(1))[np.asarray(lv.valid)] == 1)

    def test_unet_topology_builds(self, rng):
        c = np.unique(random_coords(rng, 500, extent=32, batches=2), axis=0)
        n = c.shape[0]
        caps = [n + 7] * 5
        lv = self._level(c, caps[0])
        topo = tp.build_unet_topology(lv, caps)
        assert len(topo.levels) == 5
        strides = [l.stride for l in topo.levels]
        assert strides == [1, 2, 4, 8, 16]
        # counts decrease monotonically
        counts = [int(l.count) for l in topo.levels]
        assert all(a >= b for a, b in zip(counts, counts[1:]))
        assert topo.stem_map.shape == (caps[0], 125)


class TestGrids:
    def test_dense_grid_matches_bsearch(self, rng):
        c = np.unique(random_coords(rng, 400, extent=30, batches=3), axis=0)
        cap = c.shape[0] + 9
        cpad = np.zeros((cap, 4), np.int32)
        cpad[: c.shape[0]] = c
        valid = np.arange(cap) < c.shape[0]
        lv = tp.level_from_coords(jnp.asarray(cpad), jnp.asarray(valid), cap, 1)
        grid = tp.build_grid(lv, (4, 64, 64, 64))
        assert int(grid.overflow) == 0
        # xy-stacked variant must produce identical maps (incl. borders)
        grid_xy = tp.build_grid(lv, (4, 64, 64, 64), xy_radius=2)
        assert grid_xy.packed_xy is not None
        for k in (2, 3, 5):
            np.testing.assert_array_equal(
                np.asarray(tp.conv_map(lv, lv, k, grid)),
                np.asarray(tp.conv_map(lv, lv, k)),
            )
            np.testing.assert_array_equal(
                np.asarray(tp.conv_map(lv, lv, k, grid_xy)),
                np.asarray(tp.conv_map(lv, lv, k)),
                err_msg=f"xy-stack k={k}",
            )
        lv2 = tp.downsample(lv, 2, cap)
        grid2 = tp.build_grid(lv2, (4, 64, 64, 64))
        np.testing.assert_array_equal(
            np.asarray(tp.conv_map(lv2, lv, 2, grid)),
            np.asarray(tp.conv_map(lv2, lv, 2)),
        )
        np.testing.assert_array_equal(
            np.asarray(tp.conv_map(lv2, lv, 2, grid_xy)),
            np.asarray(tp.conv_map(lv2, lv, 2)),
        )
        np.testing.assert_array_equal(
            np.asarray(tp.conv_transpose_map(lv, lv2, 2, grid2)),
            np.asarray(tp.conv_transpose_map(lv, lv2, 2)),
        )

    def test_dense_grid_overflow_counted(self, rng):
        c = np.array([[0, 70, 2, 2], [0, 1, 1, 1]], np.int32)  # x=70 > extent
        lv = tp.level_from_coords(
            jnp.asarray(c), jnp.asarray(np.ones(2, bool)), 2, 1
        )
        grid = tp.build_grid(lv, (1, 64, 64, 64))
        assert int(grid.overflow) == 1

    def test_pid_grid_matches_bsearch(self, rng):
        # main scene voxels + per-proposal subsets sharing the lattice
        c = np.unique(random_coords(rng, 500, extent=24, batches=2), axis=0)
        vcap = c.shape[0] + 5
        cpad = np.zeros((vcap, 4), np.int32)
        cpad[: c.shape[0]] = c
        valid = np.arange(vcap) < c.shape[0]
        main = tp.level_from_coords(jnp.asarray(cpad), jnp.asarray(valid), vcap, 1)

        # proposals: pid 0 from batch 0, pid 1 from batch 1, random subsets
        pid_batch = np.array([0, 1, 0, 0], np.int32)
        rows0 = c[c[:, 0] == 0][: 80]
        rows1 = c[c[:, 0] == 1][: 60]
        local = np.concatenate([
            np.concatenate([np.zeros((len(rows0), 1), np.int32), rows0[:, 1:]], 1),
            np.concatenate([np.ones((len(rows1), 1), np.int32), rows1[:, 1:]], 1),
        ])
        lcap = local.shape[0] + 7
        lpad = np.zeros((lcap, 4), np.int32)
        lpad[: local.shape[0]] = local
        lvalid = np.arange(lcap) < local.shape[0]
        llv = tp.level_from_coords(jnp.asarray(lpad), jnp.asarray(lvalid), lcap, 1)

        pgrid = tp.build_pid_grid(
            llv, main, (2, 64, 64, 64), jnp.asarray(pid_batch), 4
        )
        assert int(pgrid.overflow) == 0
        for k in (2, 3):
            np.testing.assert_array_equal(
                np.asarray(tp.conv_map(llv, llv, k, pgrid)),
                np.asarray(tp.conv_map(llv, llv, k)),
            )

    def test_derived_pid_topology_matches_lookup(self, rng, fast_compile):
        """build_pid_unet_topology (kernel maps derived from the main
        topology's maps) must equal the spatially-looked-up maps exactly,
        for every map of every level — the local-scene/ScoreNet fast path."""
        extent = (1, 64, 64, 32)
        c = np.unique(np.stack([
            np.zeros(2000, np.int64),
            rng.randint(0, 64, 2000),
            rng.randint(0, 64, 2000),
            rng.randint(0, 32, 2000),
        ], 1), axis=0)[:900].astype(np.int32)
        vcap = 1024
        cpad = np.zeros((vcap, 4), np.int32)
        cpad[: c.shape[0]] = c
        valid = np.arange(vcap) < c.shape[0]
        lv0 = tp.level_from_coords(jnp.asarray(cpad), jnp.asarray(valid), vcap, 1)
        caps = [1024, 1024, 1024, 512, 256]  # generous: no level overflow
        main = tp.build_unet_topology(lv0, caps, extent=extent)
        assert all(int(l.count) <= l.cap for l in main.levels)

        P = 4
        pid_batch = jnp.zeros((P,), jnp.int32)
        occ = np.asarray(lv0.coords)[np.asarray(lv0.valid)]
        rows = []
        for p in range(P):
            sub = occ[rng.choice(occ.shape[0], 150, replace=False)].copy()
            sub[:, 0] = p
            rows.append(sub)
        rows = np.concatenate(rows)
        lcap = 1024
        lc = np.zeros((lcap, 4), np.int32)
        lc[: rows.shape[0]] = rows
        lvalid = np.arange(lcap) < rows.shape[0]
        llv = tp.level_from_coords(jnp.asarray(lc), jnp.asarray(lvalid), lcap, 1)

        def old_grids(lv):
            l = int(np.log2(lv.stride))
            return tp.build_pid_grid(
                lv, main.levels[l], main.grids[l], pid_batch, P
            )

        t_old = tp.build_unet_topology(llv, caps, grids=old_grids)
        t_new = tp.build_pid_unet_topology(llv, caps, main, pid_batch, P)
        np.testing.assert_array_equal(
            np.asarray(t_old.stem_map), np.asarray(t_new.stem_map), "stem"
        )
        for name, olds, news in (
            ("k3", t_old.k3_maps, t_new.k3_maps),
            ("down", t_old.down_maps, t_new.down_maps),
            ("up", t_old.up_maps, t_new.up_maps),
        ):
            for i, (a, b) in enumerate(zip(olds, news)):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b), err_msg=f"{name}[{i}]"
                )
        # the scatter-free direct up map must equal the scatter-built inverse
        for l in range(len(t_new.down_maps)):
            np.testing.assert_array_equal(
                np.asarray(t_new.up_maps[l]),
                np.asarray(tp.invert_map(
                    t_new.down_maps[l], t_new.levels[l].cap
                )),
                err_msg=f"up_map_direct vs invert_map at level {l}",
            )
