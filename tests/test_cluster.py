"""Clustering op vs a numpy oracle that replicates the reference CUDA
semantics exactly (BFS order, border overwrite, filter, 1-NN assignment).

Oracle mirrors /root/reference/lib/PB_lib/src/pbnet/binary.cu:
- per class (ascending), per batch item: DBSCAN-style BFS from each
  unclustered HP in original index order; all visited points get the cluster
  id (later BFS overwrites border points: binary.cu:206-213)
- clusters smaller than para_f*count_mean[sem] demoted (binary.cu:219-268)
- remaining unassigned points adopt the cluster of the nearest assigned
  same-group point by ORIGINAL coords (binary_cuda_functions.cu:258-302)
- centers = mean of shifted coords per cluster
"""

import numpy as np
import jax.numpy as jnp

from pbnet_tpu.ops import cluster as cl


def oracle(shifted, orig, sem, batch, valid, radius, min_pts, count_mean,
           para_f=0.05, nv=True):
    n = len(sem)
    cid = np.full(n, -1, np.int64)
    density = np.zeros(n, np.int64)
    clusters = []  # (sem, batch) in creation order
    for s in sorted(set(sem[valid].tolist())):
        for b in sorted(set(batch[valid].tolist())):
            idx = np.nonzero((sem == s) & (batch == b) & valid)[0]
            if len(idx) == 0:
                continue
            p = shifted[idx]
            d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
            adj = (d2 <= radius * radius) & ~np.eye(len(idx), dtype=bool)
            dens = adj.sum(1)
            density[idx] = dens
            hp = dens >= min_pts
            for ui in range(len(idx)):
                u = idx[ui]
                if cid[u] != -1 or not hp[ui]:
                    continue
                # BFS through HPs
                visited = np.zeros(len(idx), bool)
                frontier = np.zeros(len(idx), bool)
                frontier[ui] = True
                while frontier.any():
                    f = frontier.copy()
                    frontier[:] = False
                    visited |= f
                    expand = f & hp
                    if expand.any():
                        reach = adj[expand].any(0)
                        frontier = reach & ~visited
                cur = len(clusters)
                cid[idx[visited]] = cur  # overwrite (last BFS wins)
                clusters.append((s, b))
    # filter
    sizes = np.array([(cid == i).sum() for i in range(len(clusters))])
    keep = np.array(
        [sizes[i] >= para_f * count_mean[clusters[i][0]] for i in range(len(clusters))]
    ) if clusters else np.zeros(0, bool)
    remap = np.full(len(clusters), -1, np.int64)
    remap[keep] = np.arange(keep.sum())
    cid = np.where(cid >= 0, np.where(keep[np.clip(cid, 0, None)], remap[np.clip(cid, 0, None)], -1), -1)
    clusters = [c for i, c in enumerate(clusters) if keep[i]]
    # 1-NN assignment on original coords
    if nv:
        out = cid.copy()
        for u in np.nonzero((cid == -1) & valid)[0]:
            cand = np.nonzero((cid >= 0) & (sem == sem[u]) & (batch == batch[u]))[0]
            if len(cand) == 0:
                continue
            d = ((orig[cand] - orig[u]) ** 2).sum(-1)
            # reference uses `dist <= min_dist`, so the LAST tied candidate wins
            out[u] = cid[cand[len(d) - 1 - np.argmin(d[::-1])]]
        cid = out
    centers = np.zeros((len(clusters), 3))
    for i in range(len(clusters)):
        centers[i] = shifted[cid == i].mean(0)
    return cid, len(clusters), density, centers, clusters


def make_scene(rng, n_noise=40):
    """Blobs for 2 classes x 2 batch items + uniform noise."""
    pts, sem, batch = [], [], []
    blobs = [
        (2, 0, [0.0, 0.0, 0.0], 120),
        (2, 0, [1.0, 1.0, 0.5], 100),
        (2, 1, [0.5, 0.2, 0.1], 90),
        (3, 0, [2.0, 0.5, 0.3], 150),
        (3, 1, [0.3, 1.5, 0.2], 15),  # small -> filtered
    ]
    for s, b, c, m in blobs:
        pts.append(np.array(c) + rng.randn(m, 3) * 0.01)
        sem += [s] * m
        batch += [b] * m
    pts.append(rng.rand(n_noise, 3) * 2.5)
    sem += [2] * (n_noise // 2) + [3] * (n_noise - n_noise // 2)
    batch += [0] * n_noise
    shifted = np.concatenate(pts).astype(np.float32)
    orig = (shifted + rng.randn(*shifted.shape) * 0.3).astype(np.float32)
    sem = np.array(sem, np.int32)
    batch = np.array(batch, np.int32)
    # shuffle to break index structure
    perm = rng.permutation(len(sem))
    return shifted[perm], orig[perm], sem[perm], batch[perm]


COUNT_MEAN = np.array([-1, -1, 500, 500] + [500] * 16, np.float32)


class TestCluster:
    def test_matches_oracle(self, rng):
        shifted, orig, sem, batch = make_scene(rng)
        n = len(sem)
        pad = 37
        npad = n + pad

        def padv(x, fill):
            shape = (npad,) + x.shape[1:]
            out = np.full(shape, fill, x.dtype)
            out[:n] = x
            return out

        valid = np.arange(npad) < n
        res = cl.binary_cluster(
            jnp.asarray(padv(shifted, 0)), jnp.asarray(padv(orig, 0)),
            jnp.asarray(padv(sem, 0)), jnp.asarray(padv(batch, 0)),
            jnp.asarray(valid),
            radius=0.1, min_pts=10, count_mean=jnp.asarray(COUNT_MEAN),
            para_f=0.05, cluster_cap=32, band=2048, chunk=128,
        )
        ocid, onum, odens, octr, oclusters = oracle(
            shifted, orig, sem, batch, np.ones(n, bool), 0.1, 10, COUNT_MEAN
        )
        got_cid = np.asarray(res.cluster_id)[:n]
        np.testing.assert_array_equal(np.asarray(res.density)[:n], odens)
        assert int(res.num_clusters) == onum
        # cluster ids must match exactly (same deterministic ordering)
        np.testing.assert_array_equal(got_cid, ocid)
        np.testing.assert_allclose(
            np.asarray(res.centers)[:onum], octr, rtol=1e-4, atol=1e-5
        )
        for i, (s, b) in enumerate(oclusters):
            assert int(res.cluster_sem[i]) == s
            assert int(res.cluster_batch[i]) == b
        assert int(res.band_overflow) == 0
        # pads untouched
        assert np.all(np.asarray(res.cluster_id)[n:] == -1)

    def test_no_clusters_when_sparse(self, rng):
        n = 64
        shifted = (rng.rand(n, 3) * 10).astype(np.float32)
        res = cl.binary_cluster(
            jnp.asarray(shifted), jnp.asarray(shifted),
            jnp.full(n, 2, jnp.int32), jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool),
            radius=0.05, min_pts=10, count_mean=jnp.asarray(COUNT_MEAN),
            cluster_cap=8, band=256, chunk=32,
        )
        assert int(res.num_clusters) == 0
        assert np.all(np.asarray(res.cluster_id) == -1)

    def test_class_separation(self, rng):
        # identical coordinates, different classes -> separate clusters
        blob = (rng.randn(60, 3) * 0.01).astype(np.float32)
        shifted = np.concatenate([blob, blob])
        sem = np.array([2] * 60 + [3] * 60, np.int32)
        res = cl.binary_cluster(
            jnp.asarray(shifted), jnp.asarray(shifted), jnp.asarray(sem),
            jnp.zeros(120, jnp.int32), jnp.ones(120, bool),
            radius=0.1, min_pts=5,
            count_mean=jnp.asarray(np.full(20, 100.0, np.float32)),
            para_f=0.05, cluster_cap=8, band=512, chunk=64,
        )
        assert int(res.num_clusters) == 2
        cid = np.asarray(res.cluster_id)
        assert len(set(cid[:60])) == 1 and len(set(cid[60:])) == 1
        assert cid[0] != cid[60]
