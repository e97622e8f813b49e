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


FRAME_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

pid = int(sys.argv[1]); coord = sys.argv[2]; out_path = sys.argv[3]
from homan_tpu.parallel import multihost
from homan_tpu.parallel import frames as fpar
multihost.initialize(coordinator_address=coord, num_processes=2,
                     process_id=pid)
assert jax.process_count() == 2
assert jax.device_count() == 8, jax.device_count()  # 4 local x 2 processes

from homan_tpu.frontend.gtsynth import make_synthetic_scene
scene = make_synthetic_scene(seed=5, frame_nb=8, image_size=64, rend_size=32)
mesh = fpar.make_frame_mesh(8)  # global mesh spanning both processes
lw = {"lw_sil_obj": 1.0, "lw_v2d_hand": 50.0, "lw_smooth_obj": 1.0,
      "lw_smooth_hand": 1.0, "lw_pca": 0.004, "lw_scale_obj": 0.001,
      "lw_scale_hand": 0.001}
final, hist = fpar.fit_frames_sharded(
    scene.init_state, scene.consts, scene.cfg, mesh,
    loss_weights=lw, num_iterations=3, roi_settings=scene.roi_settings)

# Replicate the sharded outputs so each process can read the full value.
rep = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
t_obj = np.asarray(rep(final.translations_object).addressable_data(0))
loss = np.asarray(rep(hist["loss"]).addressable_data(0))
with open(out_path, "w") as f:
    json.dump({"pid": pid,
               "t_obj": t_obj.ravel().tolist(),
               "loss": loss.ravel().tolist()}, f)
"""


@pytest.mark.slow
def test_two_process_frame_sharded_fit(tmp_path):
    """Sequence parallelism over a PROCESS-SPANNING mesh: 2 jax.distributed
    processes x 4 local CPU devices fit one 8-frame clip with its frame axis
    sharded over all 8 global devices, and must reproduce the single-process
    unsharded fit."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coord = f"localhost:{port}"

    worker_py = tmp_path / "frame_worker.py"
    worker_py.write_text(FRAME_WORKER)
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=os.getcwd(),
               XLA_FLAGS="--xla_force_host_platform_device_count=4")
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"frame_out{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker_py), str(pid), coord, str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    for p in procs:
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-3000:]
    payloads = [json.loads(o.read_text()) for o in outs]
    # Both processes hold the same global result
    np.testing.assert_allclose(payloads[0]["t_obj"], payloads[1]["t_obj"],
                                rtol=1e-6)
    np.testing.assert_allclose(payloads[0]["loss"], payloads[1]["loss"],
                                rtol=1e-6)

    # Single-process unsharded reference on the same scene
    from homan_tpu.fit import joint
    from homan_tpu.frontend.gtsynth import make_synthetic_scene
    scene = make_synthetic_scene(seed=5, frame_nb=8, image_size=64,
                                 rend_size=32)
    lw = {"lw_sil_obj": 1.0, "lw_v2d_hand": 50.0, "lw_smooth_obj": 1.0,
          "lw_smooth_hand": 1.0, "lw_pca": 0.004, "lw_scale_obj": 0.001,
          "lw_scale_hand": 0.001}
    single, hist1 = joint.optimize_hand_object(
        scene.init_state, scene.consts, scene.cfg, loss_weights=lw,
        num_iterations=3, roi_settings=scene.roi_settings)
    np.testing.assert_allclose(
        np.asarray(payloads[0]["loss"]),
        np.asarray(hist1["loss"]).ravel(), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(payloads[0]["t_obj"]),
        np.asarray(single.translations_object).ravel(), atol=1e-5)
