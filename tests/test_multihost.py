"""Two-process multi-host smoke test.

Executes the real multi-process path (the reference capability:
nodes/node_rank/tcp_port rendezvous, /root/reference/train.py:321-324):
two subprocesses each own ONE CPU device, rendezvous through
``distributed.initialize_from_config``, and run one sharded train step whose
gradients cross the process boundary (gloo collectives).  Asserts both ranks
end with identical parameters — the DDP invariant.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_train_step(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # workers must see exactly 1 local device
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(r), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for r in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = []
    for r in range(2):
        with open(tmp_path / f"rank{r}.json") as f:
            results.append(json.load(f))
    assert np.isfinite(results[0]["loss"])
    # pmean'd grads + identical init => identical params on both ranks
    assert results[0]["param_digest"] == results[1]["param_digest"], results
    assert results[0]["loss"] == results[1]["loss"], results
