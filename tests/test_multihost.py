"""Real multi-process execution: a 2-process CPU cluster on localhost.

The reference actually launches N processes (`torchpack dist-run -np N`,
reference tools/train.py:26); until round 3 the repo's multi-host path
(parallel/distributed.py) had only single-process degenerate coverage. This
test spawns two JAX processes (4 virtual CPU devices each, DCN rendezvous via
jax.distributed.initialize on a localhost port) and asserts:

  * init_distributed reports the 2-process / 8-global-device topology,
  * allgather_results concatenates per-process arrays in rank order (the
    multi-process branch the tmpdir-pickle gather replacement,
    eval_hook.py:113-128),
  * barrier() executes,
  * a DP train step over the cross-process global mesh produces the SAME
    loss as the single-process 8-device run (the dist-run correctness
    criterion), with each process feeding only its local batch rows.
"""
import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys
import numpy as np

port, pid, out_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
sys.path.insert(0, sys.argv[4])

from point_cloud_reid_tpu.parallel import (allgather_results, barrier,
                                           dp_step_check, init_distributed)

info = init_distributed(coordinator_address=f"localhost:{port}",
                        num_processes=2, process_id=pid)
assert info["process_count"] == 2, info
assert info["global_devices"] == 8, info
assert info["local_devices"] == 4, info

# allgather: each process contributes distinct rows; all receive the
# rank-ordered concatenation
local = np.arange(6, dtype=np.float32).reshape(3, 2) + 100 * pid
gathered = allgather_results({"x": local, "y": np.full((2,), pid)})
expect_x = np.concatenate([np.arange(6, dtype=np.float32).reshape(3, 2),
                           np.arange(6, dtype=np.float32).reshape(3, 2) + 100])
np.testing.assert_array_equal(gathered["x"], expect_x)
np.testing.assert_array_equal(gathered["y"], np.array([0, 0, 1, 1]))

barrier("after-gather")

loss = dp_step_check()

if pid == 0:
    with open(out_path, "w") as f:
        json.dump(dict(loss=loss, gathered_ok=True), f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cluster(tmp_path):
    # bounded by the communicate(timeout=540) below (no pytest-timeout here)
    if sys.platform != "linux":
        pytest.skip("localhost cluster test is linux-only")
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    out_path = str(tmp_path / "rank0.json")
    port = _free_port()

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # persistent worker cache (separate dir from the parent's 8-device
    # programs): the 2x4-device train-step compile is ~65 s/worker cold on
    # this single-core image — cache hits make suite re-runs cheap
    cache = "/root/.cache/jax_comp_multihost"
    os.makedirs(cache, exist_ok=True)
    env["JAX_COMPILATION_CACHE_DIR"] = cache

    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(port), str(pid), out_path, REPO],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(2)]
    # ONE shared wall-clock budget across both workers (not 540 s each —
    # a hung rendezvous used to burn up to 2x540 s before skipping)
    deadline = time.monotonic() + 480
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(
                timeout=max(1.0, deadline - time.monotonic()))
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("2-process cluster timed out on this machine")
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    report = json.load(open(out_path))
    assert report["gathered_ok"]

    # single-process ground truth on the same 8-device topology: the pytest
    # process already runs the virtual 8-device CPU mesh (conftest.py)
    import jax
    if jax.device_count() != 8:
        pytest.skip("driver process lacks the 8-device mesh")
    from point_cloud_reid_tpu.parallel import dp_step_check
    single = dp_step_check()
    assert np.isfinite(single)
    np.testing.assert_allclose(report["loss"], single, rtol=1e-5, atol=1e-6)
