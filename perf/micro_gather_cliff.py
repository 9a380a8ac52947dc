"""Gather cost vs table size: find the latency cliff.

Round-5 observations: 1-lane gathers from a 42-50 MB table run ~7-12 ns/row,
but the L0 stem-map build (98k rows x 25 int32 lanes from the 1.06 GB
xy-stacked table) measures ~288 ns/row.  This micro sweeps table sizes and
row widths to locate the cliff — it decides between narrower grouped-stack
tables and pair-window query reduction.

Run on the TPU: python perf/micro_gather_cliff.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

import pbnet_tpu  # noqa: F401
import jax
import jax.numpy as jnp

rng = np.random.RandomState(0)


def timeit(fn, *args, iters=20):
    f = jax.jit(fn)
    _ = float(f(*args, 2))
    t0 = time.time()
    _ = float(f(*args, iters))
    return (time.time() - t0) / iters * 1e3


def sweep(rows_mb, lanes, n_q, monotone=True):
    n_rows = rows_mb * 1_000_000 // (4 * lanes)
    tbl = jnp.asarray(
        rng.randint(0, 100, size=(n_rows, lanes)).astype(np.int32)
    )
    if monotone:
        q = np.sort(rng.choice(n_rows, n_q, replace=True)).astype(np.int32)
    else:
        q = rng.randint(0, n_rows, n_q).astype(np.int32)
    qj = jnp.asarray(q)

    def fn(tbl, qj, r):
        def body(_, acc):
            g = jnp.take(tbl, qj + (acc * 0).astype(jnp.int32), axis=0)
            return jnp.sum(g.astype(jnp.float32) * 1e-9)
        return jax.lax.fori_loop(0, r, body, jnp.float32(0.0))

    dt = timeit(fn, tbl, qj, r=None) if False else timeit(fn, tbl, qj)
    ns = dt * 1e6 / n_q
    print(f"table {rows_mb:5d} MB x {lanes:3d} lanes, {n_q/1e6:.2f}M "
          f"{'mono' if monotone else 'rand'} rows: {dt:7.2f} ms "
          f"({ns:6.1f} ns/row)", flush=True)
    return ns


# 1-lane sweep (the packed/translate regime)
for mb in (8, 32, 64, 128, 256, 512, 1024):
    sweep(mb, 1, 1_000_000)
# 25-lane sweep (the xy-stack regime, stem-map row count)
for mb in (64, 256, 1024):
    sweep(mb, 25, 98_304)
# width at fixed size
for lanes in (1, 2, 5, 9, 25):
    sweep(256, lanes, 500_000)
print("DONE", flush=True)
