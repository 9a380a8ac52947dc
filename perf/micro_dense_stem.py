"""Dense k=5 stem conv feasibility: can lax.conv on the scene-tight L0 grid
beat the 28.3 ms radius-2 window-lookup (stem map build) + 4.7 ms sparse
stem conv?

The r2 'dense stem' negative predates the scene-tight extents and tested a
different composition; this measures the conv itself at (1, 256, 256, 160)
with cin padded 6->8, bf16, plus the scatter/gather-back bookends.

Run on the TPU: python perf/micro_dense_stem.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import pbnet_tpu  # noqa: F401
import jax
import jax.numpy as jnp

B, X, Y, Z = 1, 256, 256, 160
M = 98_304  # L0 voxel cap
CIN, CPAD, COUT = 6, 8, 32

rng = np.random.RandomState(0)
# occupancy: ~92k cells on surfaces — use random distinct cells (locality of
# the gather-back is what matters; random is the pessimistic case)
cells = rng.choice(X * Y * Z, 92403, replace=False).astype(np.int32)
idx = np.full((M,), X * Y * Z, np.int32)
idx[: cells.shape[0]] = np.sort(cells)
idx_j = jnp.asarray(idx)
feats = jnp.asarray(rng.randn(M, CPAD).astype(np.float32) * 0.1)
w = jnp.asarray(rng.randn(5, 5, 5, CPAD, COUT).astype(np.float32) * 0.05)
valid = jnp.asarray(np.arange(M) < cells.shape[0])


def dense_stem(feats, w, r):
    def body(_, acc):
        f = (feats + acc * 1e-30).astype(jnp.bfloat16)
        grid = jnp.zeros((X * Y * Z + 1, CPAD), jnp.bfloat16).at[idx_j].set(
            f, mode="drop"
        )[:-1].reshape(1, X, Y, Z, CPAD)
        y = jax.lax.conv_general_dilated(
            grid, w.astype(jnp.bfloat16),
            window_strides=(1, 1, 1), padding="SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )
        yf = y.reshape(X * Y * Z, COUT)
        yf = jnp.concatenate([yf, jnp.zeros((1, COUT), yf.dtype)], 0)
        out = jnp.take(yf, idx_j, axis=0)
        out = jnp.where(valid[:, None], out, 0.0)
        return jnp.sum(out)
    return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))


f = jax.jit(dense_stem)
t0 = time.time()
_ = float(f(feats, w, 2))
print(f"[compile {time.time()-t0:.0f}s]", flush=True)
t0 = time.time()
_ = float(f(feats, w, 10))
dt = (time.time() - t0) / 10 * 1e3
print(f"dense k5 stem (scatter+conv+gather): {dt:.2f} ms", flush=True)
print("DONE", flush=True)
