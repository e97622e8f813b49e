"""Two-process jax.distributed test for parallel.multihost (DCN helpers).

Spawns two CPU processes that initialize a real jax.distributed runtime,
split the sample index space, and allgather their metrics — exercising the
non-short-circuit paths that single-process tests cannot reach.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from homan_tpu.parallel import multihost

pid = int(sys.argv[1])
coord = sys.argv[2]
out_path = sys.argv[3]
multihost.initialize(coordinator_address=coord, num_processes=2,
                     process_id=pid)
assert jax.process_count() == 2, jax.process_count()

idxs = multihost.host_sample_indices(total=10, data_step=1, data_offset=0)
# one metric value per local sample: 100*pid + idx (recognizable)
local = {"metric": [100.0 * pid + i for i in idxs], "count": [float(len(idxs))]}
gathered = multihost.allgather_metrics(local)
with open(out_path, "w") as f:
    json.dump({"pid": pid, "idxs": list(map(int, idxs)),
               "metric": [float(x) for x in gathered["metric"]],
               "count": [float(x) for x in gathered["count"]]}, f)
"""


def test_two_process_distributed_allgather(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.getcwd())
    env.pop("XLA_FLAGS", None)
    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"out{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py), str(pid), coord, str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    payloads = [json.loads(o.read_text()) for o in outs]
    # Sample space split disjointly and completely across processes
    all_idxs = sorted(payloads[0]["idxs"] + payloads[1]["idxs"])
    assert all_idxs == list(range(10))
    assert not set(payloads[0]["idxs"]) & set(payloads[1]["idxs"])
    # Every process sees the full gathered metric set (both hosts' values)
    for pl in payloads:
        assert len(pl["metric"]) == 10
        assert sorted(pl["count"]) == [5.0, 5.0]
    assert sorted(payloads[0]["metric"]) == sorted(payloads[1]["metric"])
    # values from both processes present
    vals = np.asarray(payloads[0]["metric"])
    assert (vals >= 100).any() and (vals < 100).any()
