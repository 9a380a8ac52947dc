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
import jax
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

    def test_pallas_path_matches_xla(self, rng):
        """Full binary_cluster through the Pallas kernels (interpreter on
        CPU) must equal the XLA-fallback result bit for bit — covers the
        fused border kernel and the needy-gated 1-NN."""
        from pbnet_tpu.ops import pallas_kernels as pk

        shifted, orig, sem, batch = make_scene(rng)
        n = len(sem)
        npad = n + 37

        def padv(x, fill):
            out = np.full((npad,) + x.shape[1:], fill, x.dtype)
            out[:n] = x
            return out

        valid = np.arange(npad) < n
        args = (
            jnp.asarray(padv(shifted, 0)), jnp.asarray(padv(orig, 0)),
            jnp.asarray(padv(sem, 0)), jnp.asarray(padv(batch, 0)),
            jnp.asarray(valid),
        )
        kw = dict(radius=0.1, min_pts=10, count_mean=jnp.asarray(COUNT_MEAN),
                  para_f=0.05, cluster_cap=32, band=2048, chunk=128)
        ref = cl.binary_cluster(*args, **kw)
        old_i, old_u = pk.INTERPRET, pk.use_pallas
        pk.INTERPRET = True
        pk.use_pallas = lambda: True
        # the jit cache would replay the XLA-branch jaxpr: drop it so the
        # Pallas branch actually traces
        cl.binary_cluster._clear_cache()
        try:
            got = cl.binary_cluster(*args, **kw)
        finally:
            pk.INTERPRET, pk.use_pallas = old_i, old_u
            cl.binary_cluster._clear_cache()
        np.testing.assert_array_equal(np.asarray(got.cluster_id),
                                      np.asarray(ref.cluster_id))
        np.testing.assert_array_equal(np.asarray(got.density),
                                      np.asarray(ref.density))
        assert int(got.num_clusters) == int(ref.num_clusters)

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


class TestPallasKernels:
    """The Pallas masked-window kernels must match the XLA bit-unrolled
    fallback exactly (integer algebra, no tolerance).  Runs through the
    Pallas interpreter on CPU."""

    def _mk(self, rng, nchunks=3, chunk=64, nw=2):
        w = nw * 32
        bits1 = rng.randint(0, 2**32, (nchunks, chunk, nw)).astype(np.uint32)
        bits2 = rng.randint(0, 2**32, (nchunks, chunk, nw)).astype(np.uint32)
        # sparse masks exercise empty rows too
        bits1[rng.rand(nchunks, chunk, nw) < 0.5] = 0
        bits2[rng.rand(nchunks, chunk, nw) < 0.8] = 0
        vw1 = rng.randint(-1, 10_000, (nchunks, w)).astype(np.int32)
        vw2 = rng.randint(-1, 10_000, (nchunks, w)).astype(np.int32)
        return bits1, bits2, vw1, vw2

    @staticmethod
    def _xla_reduce(bits1, bits2, vw1, vw2, minimize):
        init = cl.INF_I32 if minimize else np.int32(-1)
        red = np.minimum if minimize else np.maximum
        nchunks, chunk, nw = bits1.shape
        best = np.full((nchunks, chunk), init, np.int64)
        for bits, vw in ((bits1, vw1), (bits2, vw2)):
            v = vw.reshape(nchunks, nw, 32)
            for b in range(32):
                m = (bits >> np.uint32(b)) & 1
                cand = np.where(m > 0, v[:, None, :, b], init)
                best = red(best, cand.min(2) if minimize else cand.max(2))
        return best.astype(np.int32)

    def test_reduce_matches_fallback(self, rng):
        from pbnet_tpu.ops import pallas_kernels as pk

        bits1, bits2, vw1, vw2 = self._mk(rng)
        old = pk.INTERPRET
        pk.INTERPRET = True
        try:
            for minimize in (True, False):
                got = np.asarray(pk.masked_window_reduce(
                    jnp.asarray(bits1), jnp.asarray(bits2),
                    jnp.asarray(vw1), jnp.asarray(vw2), minimize=minimize,
                ))
                want = self._xla_reduce(bits1, bits2, vw1, vw2, minimize)
                np.testing.assert_array_equal(got, want)
        finally:
            pk.INTERPRET = old

    def test_match_pick_matches_fallback(self, rng):
        from pbnet_tpu.ops import pallas_kernels as pk

        bits1, bits2, fw1, fw2 = self._mk(rng)
        nchunks, chunk, nw = bits1.shape
        w = nw * 32
        # few distinct first-orig values -> real multi-hit matches
        fw1, fw2 = fw1 % 7, fw2 % 7
        lw1 = np.random.RandomState(1).randint(0, 500, (nchunks, w)).astype(np.int32)
        lw2 = np.random.RandomState(2).randint(0, 500, (nchunks, w)).astype(np.int32)
        target = self._xla_reduce(bits1, bits2, fw1, fw2, minimize=False)

        want = np.full((nchunks, chunk), -1, np.int32)
        for bits, fw, lw in ((bits1, fw1, lw1), (bits2, fw2, lw2)):
            f = fw.reshape(nchunks, nw, 32)
            l = lw.reshape(nchunks, nw, 32)
            for b in range(32):
                m = (bits >> np.uint32(b)) & 1
                hit = (m > 0) & (f[:, None, :, b] == target[:, :, None])
                cand = np.where(hit, l[:, None, :, b], -1)
                want = np.maximum(want, cand.max(2))

        old = pk.INTERPRET
        pk.INTERPRET = True
        try:
            got = np.asarray(pk.masked_window_match_pick(
                jnp.asarray(bits1), jnp.asarray(bits2), jnp.asarray(fw1),
                jnp.asarray(fw2), jnp.asarray(lw1), jnp.asarray(lw2),
                jnp.asarray(target),
            ))
        finally:
            pk.INTERPRET = old
        np.testing.assert_array_equal(got, want)

    def test_fused_border_matches_two_pass(self, rng):
        """masked_window_border == reduce(max) + match_pick under the
        pipeline invariant that equal first-orig values carry equal labels
        (first-orig is injective across components, cluster.py)."""
        from pbnet_tpu.ops import pallas_kernels as pk

        bits1, bits2, fw1, fw2 = self._mk(rng)
        fw1, fw2 = fw1 % 7, fw2 % 7
        # labels are a function of the component (= of first-orig)
        lw1 = fw1 * 3 + 1
        lw2 = fw2 * 3 + 1
        want_best = self._xla_reduce(bits1, bits2, fw1, fw2, minimize=False)
        want_root = np.where(want_best >= 0, want_best * 3 + 1, -1)

        old = pk.INTERPRET
        pk.INTERPRET = True
        try:
            best, root = pk.masked_window_border(
                jnp.asarray(bits1), jnp.asarray(bits2), jnp.asarray(fw1),
                jnp.asarray(fw2), jnp.asarray(lw1), jnp.asarray(lw2),
            )
        finally:
            pk.INTERPRET = old
        np.testing.assert_array_equal(np.asarray(best), want_best)
        np.testing.assert_array_equal(np.asarray(root), want_root)

    def test_value_and_grad_through_pallas_cluster(self, rng):
        # Regression (round-3 bench): the train step died with
        # 'Linearization failed to produce known values for all output
        # primals' because value_and_grad linearized through pallas_call.
        # binary_cluster now cuts gradients at its boundary (the reference
        # op is backward=None), so grad must succeed with the Pallas path
        # active and the cluster contribution must be exactly zero.
        from pbnet_tpu.ops import pallas_kernels as pk

        shifted, orig, sem, batch = make_scene(rng)
        args = (jnp.asarray(orig), jnp.asarray(sem), jnp.asarray(batch),
                jnp.ones(len(sem), bool))
        kw = dict(radius=0.1, min_pts=10, count_mean=jnp.asarray(COUNT_MEAN),
                  para_f=0.05, cluster_cap=32, band=2048, chunk=128)
        sh = jnp.asarray(shifted)

        def loss(w):
            # param-dependent float feeds the cluster (as the model's
            # xyz + offset_pred does); a separate differentiable path
            # keeps the loss non-trivial
            moved = sh * w
            res = cl.binary_cluster(moved, *args, **kw)
            return jnp.sum(res.centers) + jnp.sum(moved * moved)

        old_i, old_u = pk.INTERPRET, pk.use_pallas
        pk.INTERPRET = True
        pk.use_pallas = lambda: True
        cl.binary_cluster.clear_cache()
        try:
            val, g = jax.value_and_grad(loss)(jnp.float32(1.0))
        finally:
            pk.INTERPRET, pk.use_pallas = old_i, old_u
            cl.binary_cluster.clear_cache()
        assert np.isfinite(float(val))
        # d(sum(moved^2))/dw at w=1 is 2*sum(sh^2); the cluster term adds 0
        np.testing.assert_allclose(
            float(g), 2.0 * float(jnp.sum(sh * sh)), rtol=1e-4
        )

    def test_binary_cluster_pallas_path_matches(self, rng):
        # end-to-end: the FULL binary_cluster with every Pallas kernel
        # engaged (neighbor_pack, masked_window_reduce, match_pick,
        # window_1nn) through the interpreter must reproduce the XLA
        # fallback bit-for-bit
        from pbnet_tpu.ops import pallas_kernels as pk

        shifted, orig, sem, batch = make_scene(rng)
        args = (jnp.asarray(shifted), jnp.asarray(orig), jnp.asarray(sem),
                jnp.asarray(batch), jnp.ones(len(sem), bool))
        kw = dict(radius=0.1, min_pts=10, count_mean=jnp.asarray(COUNT_MEAN),
                  para_f=0.05, cluster_cap=32, band=2048, chunk=128)
        ref = cl.binary_cluster(*args, **kw)
        old_i, old_u = pk.INTERPRET, pk.use_pallas
        pk.INTERPRET = True
        pk.use_pallas = lambda: True
        cl.binary_cluster.clear_cache()
        try:
            got = cl.binary_cluster(*args, **kw)
        finally:
            pk.INTERPRET, pk.use_pallas = old_i, old_u
            cl.binary_cluster.clear_cache()
        np.testing.assert_array_equal(np.asarray(got.cluster_id),
                                      np.asarray(ref.cluster_id))
        np.testing.assert_array_equal(np.asarray(got.density),
                                      np.asarray(ref.density))
        assert int(got.num_clusters) == int(ref.num_clusters)
        np.testing.assert_allclose(np.asarray(got.centers),
                                   np.asarray(ref.centers), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(got.cluster_sem),
                                      np.asarray(ref.cluster_sem))
        assert int(got.band_overflow) == int(ref.band_overflow)
        assert int(got.nn_overflow) == int(ref.nn_overflow)
