"""Subprocess worker for the 2-process multi-host smoke test.

Each worker is one "node" (reference: one rank of the NCCL process group,
/root/reference/train.py:321-324).  It wires the reference's multi-node knobs
through ``distributed.initialize_from_config``, builds a mesh over the GLOBAL
device set, feeds its local device through ``shard_batch``'s process-local
branch (jax.make_array_from_process_local_data), runs one sharded train step,
and writes its post-step parameter digest for the test to compare across
ranks.

Usage: python multihost_worker.py <rank> <world> <port> <outdir>
"""

import json
import os
import sys

rank, world = int(sys.argv[1]), int(sys.argv[2])
port, outdir = sys.argv[3], sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # exactly ONE local CPU device per process

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# cross-process CPU collectives (the XLA:CPU analogue of NCCL/ICI)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
try:  # smoke test: validate compile+execute, not speed
    jax.config.update("jax_disable_most_optimizations", True)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pbnet_tpu.config import Config  # noqa: E402
from pbnet_tpu.parallel import distributed  # noqa: E402


def main():
    cfg0 = Config(nodes=world, node_rank=rank, coordinator=f"127.0.0.1:{port}")
    r, w = distributed.initialize_from_config(cfg0)
    assert (r, w) == (rank, world), (r, w, rank, world)
    assert jax.process_count() == world
    assert len(jax.devices()) == world, len(jax.devices())
    assert len(jax.local_devices()) == 1

    # Create the Gloo clique NOW, while rank skew is a few seconds (the only
    # compile so far is this trivial psum).  The train step's collectives
    # reuse the established context, so later compile skew between ranks
    # cannot blow Gloo's 30 s context-rendezvous deadline.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("pbnet_multihost_warmup")

    import __graft_entry__ as ge
    from pbnet_tpu import engine
    from pbnet_tpu.parallel import mesh as mesh_lib
    from pbnet_tpu.parallel.train_step import TrainState, make_train_step

    # Mini_Unet on 2-level shapes: the smallest model that still exercises
    # every collective (grad pmean + SyncBN psum).  With the full 34C archs
    # the two ranks compile serially on a 1-core host and the faster rank's
    # first collective blows Gloo's 30 s GetKeyValue deadline.
    cfg = cfg0.replace(
        shapes=ge._DRYRUN_SHAPES, batch_size=1, sync_bn=True,
        backbone_arch="Mini_Unet", dunet_arch="Mini_Unet",
        score_arch="Mini_Unet",
    )
    m = mesh_lib.make_mesh()  # all GLOBAL devices (one per process)
    assert mesh_lib.local_device_count(m) == 1

    model = engine.build_model(cfg, multi_device=True)
    batch = ge._synthetic_batch(ge._DRYRUN_SHAPES, np.random.RandomState(rank))
    # identical seed -> identical init on every rank (the reference broadcasts
    # DDP buffers instead)
    state, tx = engine.init_state(model, cfg, batch, seed=0)

    # params/opt state live on this process's device; promote them to global
    # replicated arrays for the cross-process step
    rep = mesh_lib.replicated(m)

    def to_global(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                rep, np.asarray(x)
            ),
            tree,
        )

    state = TrainState(*[to_global(t) for t in state])
    step = make_train_step(model, cfg, m, tx, with_instances=False)
    stack = mesh_lib.shard_batch(m, [batch])  # process-local branch
    state2, aux = step(state, stack, 1e-3)

    loss = float(aux["loss"])
    digest = float(
        sum(
            np.float64(np.sum(np.asarray(leaf), dtype=np.float64))
            for leaf in jax.tree_util.tree_leaves(state2.params)
        )
    )
    with open(os.path.join(outdir, f"rank{rank}.json"), "w") as f:
        json.dump({"loss": loss, "param_digest": digest}, f)
    print(f"rank {rank}/{world}: loss={loss:.4f} digest={digest:.6f}")


if __name__ == "__main__":
    main()
